"""Graph clustering for dedup: connected components over near-dup pairs.

Pair generators (MinHash/SimHash/ngram/ANN) emit EDGES; an actual dedup
pipeline needs CLUSTERS — "these 17 docs are all one duplicate group, keep
the canonical one". That closure step is a connected-components computation
over the pair graph.

Scale design: iterative min-label propagation in pure DataFrame ops —
per round, every node takes the min label among itself and its neighbors
(one join + one partial-aggregated groupBy per round, both shuffling on the
node id). Rounds needed = graph diameter, and near-dup components are
shallow (dups of a doc are dups of each other), so 3-5 rounds close real
corpora. Labels/edges are persisted per round and the superseded cache
dropped (the kmeans_fit lifecycle). The driver-side convergence probe is an
aggregate over the (nodes)-sized label table — no row data ever leaves the
executors.

The fixpoint (min reachable id per node) is engine-agnostic, so a DuckDB
recursive-CTE closure reproduces it exactly — the oracle for
``dedup_clusters_documents``.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arcane_framework_spark.operators.cache import scoped_persist

# Storage level for every lineage-truncation localCheckpoint in this
# module. The default for RDD local checkpoints (MEMORY_AND_DISK_DESER)
# stores corpus-scale edge tables as deserialized row objects on the
# heap — at the 100x stress scale (~54M directed edges) that OOMs the
# executor heap (deserialized unroll spikes, several-x object overhead,
# 32 concurrent task unrolls). Serialized storage keeps blocks as
# compact UnsafeRow bytes with eviction-to-disk under pressure;
# measured at 100x both this level and DISK_ONLY checkpoint the
# 54M-edge table without OOM (~44s pagerank either way), and the
# serialized-memory level stays RAM-resident at gate scale. (PySpark's
# MEMORY_AND_DISK is the serialized level; _DESER is the deserialized
# default that OOM'd.)
_CKPT_LEVEL = StorageLevel.MEMORY_AND_DISK


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_rounds: int = 20) -> DataFrame:
    """Min-label propagation: (node, component) with component = min node id
    reachable from the node.

    Converges in ``diameter`` rounds; raises if ``max_rounds`` is hit while
    labels are still moving (pathological chain — raise the bound).

    Cache lifecycle: each round persists one intermediate (the propagated
    label table); once the round's convergence probe has materialized the
    checkpointed result, that cache is explicitly dropped — a
    slow-converging graph holds at most ONE round's cache, not one per
    round. Fault-tolerance caveat: rounds end in ``localCheckpoint``
    (lineage truncation, required to stop exponential plan growth), and
    localCheckpoint blocks are NOT recoverable after executor loss — an
    executor failure mid-computation fails the job, and the caller
    re-runs it. For multi-hour graphs on preemptible hardware, swap in a
    reliable ``checkpoint()`` directory; for dedup-scale graphs
    (seconds-to-minutes), rerun-on-failure is the right trade.
    """
    # Persist the edge list FIRST: the symmetric union below evaluates it
    # twice, and for pair-generator inputs (MinHash etc.) re-evaluation
    # means re-running the whole sketch pipeline.
    edges = edges.select(src, dst).transform(scoped_persist)
    # Hash-partition the symmetric adjacency on the per-round join key:
    # the checkpointed layout is reused by every round's sym⋈labels join
    # instead of re-exchanging the (much larger) edge side — labels are
    # the only thing that moves per round. No distinct(): duplicate edges
    # cannot change a min-aggregation, and dropping it removes a full
    # shuffle of the edge set from the setup. Eager localCheckpoint, not
    # persist: every round's scoped_persist / lazy-checkpoint call forces
    # full Catalyst planning of its subtree, and with a bare persist that
    # subtree re-embeds the whole pair-generator lineage — at sf0.1 the
    # driver-side planning cost ~8s while the probe jobs took ~0.2s
    # (measured round 14; the pagerank fix, same pathology). The
    # checkpoint collapses the lineage to a LogicalRDD so per-round
    # planning is O(round), not O(pair pipeline).
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .union(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .repartition("nbr")
        .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    )
    # Seed with the 1-hop minimum (folds the would-be first round into the
    # init aggregation — one fewer driver-synchronized round).
    labels = (
        sym.groupBy("node")
        .agg(F.min("nbr").alias("__mn"))
        .select(
            "node",
            F.least(F.col("node"), F.col("__mn")).alias("component"),
        )
        .transform(scoped_persist)
    )
    id_type = dict(labels.dtypes)["component"]

    def _propagate(cur: DataFrame) -> tuple[DataFrame, DataFrame]:
        # Each node takes the min label among itself and its neighbors. The
        # node's OLD label rides through the same min-aggregation (neighbor
        # rows contribute null old; min ignores nulls) so the convergence
        # probe reads the cached result — ONE driver-synchronized action per
        # round, no labels-vs-labels join. Labels only ever decrease, so
        # moved == any component < old.
        nbr_labels = sym.join(
            cur.select(F.col("node").alias("nbr"), F.col("component")),
            "nbr",
        ).select("node", "component")
        propagated = (
            nbr_labels.select(
                "node", "component",
                F.lit(None).cast(id_type).alias("old"),
            )
            .union(
                cur.select(
                    "node", "component", F.col("component").alias("old")
                )
            )
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min("old").alias("old"),
            )
            # consumed twice below (probe side + jump mapping)
            .transform(scoped_persist)
        )
        # Pointer jumping: component := label(component). Plain min-label
        # needs diameter rounds — a 50-doc near-dup CHAIN (drifting text)
        # would exhaust max_rounds; the jump doubles the reach per round,
        # so rounds are O(log diameter) (max_rounds=20 covers ~2^20). Every
        # component value is a node id (it is some endpoint's id), so the
        # self-join always matches; labels only decrease, making the
        # jumped label safe to take directly. The probe still compares
        # against the PRE-round label: moved=0 ⇒ propagation is at its
        # fixpoint ⇒ the jump is the identity too.
        mapping = propagated.select(
            F.col("node").alias("component"), F.col("component").alias("__jmp")
        )
        jumped = propagated.join(mapping, "component", "left").select(
            "node",
            F.coalesce("__jmp", "component").alias("component"),
            "old",
        )
        # Lineage truncation (lazy localCheckpoint): the jump references
        # `propagated` twice, so without truncation each round's LOGICAL
        # plan embeds the previous round's tree twice — exponential plan
        # growth that OOMs the driver at plan stringification around round
        # 8 even though execution is fine. The checkpoint collapses the
        # round's result to a LogicalRDD when the probe materializes it,
        # keeping every round's plan constant-size. (RDD-level cache is
        # reclaimed by the ContextCleaner once the round's reference
        # drops.) The persisted `propagated` handle is returned so the
        # loop can drop it once the probe materializes the checkpoint.
        return jumped.localCheckpoint(eager=False, storageLevel=_CKPT_LEVEL), propagated

    # Fold one propagation lazily into the first probed round's job: no
    # action runs until the first probe, which materializes seed + sym +
    # TWO propagations in a single pipelined job. Shallow graphs (near-dup
    # clusters are cliques-ish, diameter ≤ 2) then converge with a single
    # driver sync instead of three.
    seed = labels
    labels, pending = _propagate(labels)
    to_release = [seed, pending]
    for _ in range(max_rounds):
        new_labels, pending = _propagate(labels)
        to_release.append(pending)
        moved = new_labels.filter(F.col("component") < F.col("old")).count()
        # The probe materialized every checkpoint up to and including
        # new_labels; the per-round caches backing them are dead weight
        # now — release them so long convergence holds O(1) cache, not
        # O(rounds).
        for handle in to_release:
            handle.unpersist()
        to_release = []
        labels = new_labels
        if moved == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # sym is checkpoint-backed (its RDD is reclaimed by the ContextCleaner
    # once unreferenced — the pagerank trade); only the edge cache needs an
    # explicit release.
    edges.unpersist()
    return labels.select("node", "component")


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b",
                   components: DataFrame | None = None) -> DataFrame:
    """Duplicate clusters from near-dup pairs.

    Output (doc_id, cluster_id, cluster_size, is_canonical): cluster_id is
    the smallest doc id in the component (the doc a dedup pipeline keeps),
    cluster_size counts members, is_canonical marks the keeper.

    ``components`` short-circuits the CC computation with an existing
    (node, component) table — the materialized-side-table path: a
    production pipeline computes components once per corpus build and
    every downstream consumer (canonical accounting, leakage-guarded
    splits, this rollup) reads the same table (see prep.shared_prep).
    """
    comp = (
        components
        if components is not None
        else connected_components(pairs, src=id_a, dst=id_b)
    )
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
    )


def incremental_components(assignment: DataFrame, new_edges: DataFrame,
                           node_col: str = "node",
                           comp_col: str = "component",
                           src: str = "id_a", dst: str = "id_b",
                           max_rounds: int = 20) -> DataFrame:
    """Merge a batch of NEW edges into an existing (node, component)
    assignment without re-running connected components over the corpus.

    The continuous-ingest closure step: ``incremental_minhash_pairs``
    emits the new batch's near-dup edges; this folds them into the
    materialized cluster table. Contract: ``assignment`` is a fixpoint of
    ``connected_components`` — every component id is the MINIMUM node id
    of its members (which makes the (node → component) rows themselves a
    spanning star of each old component).

    Only components actually touched by a new edge are recomputed:

    1. touched nodes = the batch's edge endpoints (batch-proportional);
    2. touched components = their assignment rows (broadcast semi-join —
       the full assignment is scanned but never shuffled);
    3. the touched components' star edges ∪ the new edges feed the
       regular pointer-jumping ``connected_components`` — a graph
       proportional to the batch plus the components it touches, NOT the
       corpus;
    4. untouched assignment rows pass through via a broadcast anti-join.

    Union of (3) and (4) equals a full recompute over (old edges ∪ new
    edges): new edges cannot create paths through untouched components,
    and each old component's star preserves both its connectivity and
    its min id. Output: (node, component), same contract as the input —
    the operator composes with itself batch after batch.
    """
    new_edges = new_edges.select(src, dst).transform(scoped_persist)
    touched_nodes = (
        new_edges.select(F.col(src).alias(node_col))
        .union(new_edges.select(F.col(dst).alias(node_col)))
        .distinct()
    )
    touched_comps = (
        assignment.join(F.broadcast(touched_nodes), node_col)
        .select(comp_col)
        .distinct()
        .transform(scoped_persist)
    )
    sub_star = assignment.join(F.broadcast(touched_comps), comp_col).select(
        F.col(node_col).alias(src), F.col(comp_col).alias(dst)
    )
    recomputed = connected_components(
        sub_star.unionByName(new_edges), src=src, dst=dst,
        max_rounds=max_rounds,
    ).select(
        F.col("node").alias(node_col), F.col("component").alias(comp_col)
    )
    untouched = assignment.join(
        F.broadcast(touched_comps), comp_col, "anti"
    ).select(node_col, comp_col)
    return untouched.unionByName(recomputed)


# ---------------------------------------------------------------------------
# PageRank (fixed-iteration, fixed-point)
# ---------------------------------------------------------------------------

#: Damping factor 0.85 as an exact rational (85/100) — PageRank stays in
#: INTEGER arithmetic end to end so both engines reproduce every rank
#: bit-for-bit (floats would drift across libms over iterations).
PR_DAMP_NUM = 85
PR_DAMP_DEN = 100
#: Rank mass is distributed in units of 1e-12 (total mass = PR_SCALE).
#: Largest intermediate: r·85 ≤ 8.5e13 ≪ 2^63.
PR_SCALE = 10**12
PR_ITERATIONS = 5


def pagerank(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
             iterations: int = PR_ITERATIONS) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair graph — ranks
    near-dup cluster members by connectivity (the doc sharing edges with
    the most well-connected neighbors is the natural canonical pick,
    complementing ``dedup_clusters``' min-id heuristic).

    Nodes = endpoints of ≥1 edge, so every node has out-degree ≥ 1 — no
    dangling-mass redistribution term. Per iteration each node sends
    ``(r·85) div (deg·100)`` along every edge and resets to
    ``base + Σ incoming`` with ``base = (SCALE·15) div (100·n)``; all
    divisions are integer (truncation loses a deterministic dust of
    mass — identically in both engines). ``n`` stays in-plan as a
    broadcast 1-row count.

    Cost per iteration: one edges⋈ranks join + one groupBy on the
    destination — both shuffle on node id, so a 100 TB edge list runs
    ``iterations`` co-partitioned passes; edges and the node table are
    materialized once via eager ``localCheckpoint`` (not a bare persist:
    both are re-referenced in every unrolled iteration, and with a
    persist each reference re-embeds the full pair-generator lineage in
    the logical plan — at sf0.1 the *driver-side planning* of that tree
    cost more than the jobs themselves; the checkpointed form runs the
    identical iterations in 3.5s vs 7.7–10.4s, byte-identical output —
    round-14 optimization, guide §7.3). Unrolled plans stay linear in
    ``iterations`` (each round references the previous ranks once).
    localCheckpoint blocks are not executor-loss-recoverable — the
    ``connected_components`` trade, documented there.

    Returns (doc_id, rank_fp, pagerank) with ``pagerank = rank_fp /
    1e12`` (exact: rank_fp < 2^53).
    """
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.agg(F.count(F.lit(1)).alias("__n"))
    nodes = (
        with_broadcast_scalar(deg, n).select(
            F.col("src").alias("id"),
            "deg",
            F.expr(f"CAST({PR_SCALE} AS BIGINT) div __n").alias("__r0"),
            F.expr(
                f"CAST({PR_SCALE} AS BIGINT) * {PR_DAMP_DEN - PR_DAMP_NUM}"
                f" div ({PR_DAMP_DEN} * __n)"
            ).alias("__base"),
        )
        .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    )
    ranks = nodes.select("id", "deg", F.col("__r0").alias("r"))
    for _ in range(iterations):
        contrib = edges.join(
            ranks, edges["src"] == ranks["id"]
        ).select(
            "dst",
            F.expr(
                f"(r * {PR_DAMP_NUM}) div (deg * {PR_DAMP_DEN})"
            ).alias("c"),
        )
        summed = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, nodes["id"] == summed["dst"], "left")
            .select(
                "id",
                "deg",
                (F.col("__base") + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
        )
    return ranks.select(
        F.col("id").alias("doc_id"),
        F.col("r").alias("rank_fp"),
        (F.col("r").cast("double") / F.lit(float(PR_SCALE))).alias("pagerank"),
    )


def triangle_stats(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b") -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected pair graph (``id_a < id_b`` canonical edges).

    The cohesion diagnostic for dedup clusters: a true duplicate group
    is a near-clique (coefficient → 1), while chained false merges
    (A~B~C with A≁C) show low coefficients — exactly the cases a
    transitive-closure dedup silently glues together.

    Scale shape: the classic ordered-wedge join — every triangle
    a<b<c is found EXACTLY once by joining edges (a,b)⋈(b,c) into
    wedges and verifying the closing edge (a,c); two equi-joins on node
    keys, no enumeration of both directions. Wedge fan-out is bounded
    by per-node FORWARD degree (hub nodes with mostly-incoming order
    rank generate nothing — the compact-forward property that makes
    this tractable on power-law graphs). Coefficient =
    2·T_v / (deg_v·(deg_v−1)) in mirrored double arithmetic, 6dp
    fixed-point; deg < 2 nodes emit 0.

    Returns (doc_id, degree, triangles, clustering).
    """
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    e = scoped_persist(e)
    wedges = e.alias("e1").join(
        e.alias("e2"), F.col("e1.b") == F.col("e2.a")
    ).select(
        F.col("e1.a").alias("a"),
        F.col("e1.b").alias("b"),
        F.col("e2.b").alias("c"),
    )
    tris = wedges.alias("w").join(
        e.alias("e3"),
        (F.col("w.a") == F.col("e3.a")) & (F.col("w.c") == F.col("e3.b")),
    ).select("w.a", "w.b", "w.c")
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    coeff = F.when(
        F.col("degree") >= 2,
        F.floor(
            F.lit(2.0)
            * F.col("triangles").cast("double")
            / (
                F.col("degree").cast("double")
                * (F.col("degree") - F.lit(1)).cast("double")
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        / 1e6,
    ).otherwise(F.lit(0.0))
    return (
        deg.join(per_node, "id", "left")
        .withColumn(
            "triangles", F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
        )
        .select(
            F.col("id").alias("doc_id"),
            F.col("degree").cast("long").alias("degree"),
            "triangles",
            coeff.alias("clustering"),
        )
    )


#: Synchronous label-propagation rounds (fixed so the unrolled oracle
#: and the Spark plan agree on exactly when to stop).
LPA_ITERATIONS = 3

#: Vote/label packing shift for the argmax key ``cnt·2⁴⁰ − lbl``:
#: injective (no ties) whenever labels are non-negative and < 2⁴⁰ and
#: vote counts < 2²³ — both far above any doc-id space or node degree
#: this engine produces (ids top out near 2²⁰ + _DUP_OFFSET planting).
_LPA_SHIFT = 1 << 40


def label_propagation(pairs: DataFrame, id_a: str = "id_a",
                      id_b: str = "id_b",
                      iterations: int = LPA_ITERATIONS) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over an undirected pair graph — the modularity-ish
    complement to ``connected_components``: CC glues everything
    reachable into one blob, LPA splits chained false merges back into
    densely-connected cores (exactly the A~B~C with A≁C case
    ``triangle_stats`` diagnoses).

    Determinism: async LPA is famously order-dependent, so this is the
    SYNCHRONOUS variant with a total tie order — every node starts as
    its own label and each round simultaneously adopts the most frequent
    label among its neighbors plus itself, ties broken toward the
    SMALLEST label. The argmax is exact integer arithmetic: the vote
    table is reduced with ``max_by(lbl, cnt·2⁴⁰ − lbl)`` (injective key,
    see ``_LPA_SHIFT``), so the result is independent of row order,
    partitioning, and engine. A fixed ``iterations`` (not convergence
    polling) keeps the plan static and the oracle unrollable.

    Cost per round: one edges⋈labels join shuffling on node id plus one
    (node, label) count — the PageRank shape. Edges are materialized once
    via eager ``localCheckpoint`` and each round's label table via a lazy
    one (the label frame is referenced twice per round: as the neighbor
    vote source and as the self vote). The checkpoints are what keep the
    driver out of the picture: a plain per-round ``persist`` leaves every
    reference re-embedding the full upstream lineage (pair generator
    included) in the logical plan, and with the label chain doubling per
    round the *planning* cost dominated the job — measured at sf0.1 the
    checkpointed form runs the identical rounds in 2.4s vs 9.4s, byte-
    identical output (round-14 optimization, guide §7.3 driver-side
    planning). Same fault-tolerance trade as ``connected_components``:
    localCheckpoint blocks are not recoverable after executor loss; the
    caller re-runs (seconds-scale graphs) or swaps in ``checkpoint()``.

    Returns ``(doc_id, community, community_size)``.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    )
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("lbl")
    )
    for _ in range(iterations):
        votes = (
            edges.join(labels, edges["src"] == labels["id"])
            .select(F.col("dst").alias("nid"), "lbl")
            .unionByName(
                labels.select(F.col("id").alias("nid"), "lbl")
            )
        )
        counts = votes.groupBy("nid", "lbl").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        labels = (
            counts.groupBy("nid")
            .agg(
                F.expr(f"max_by(lbl, cnt * {_LPA_SHIFT} - lbl)").alias("lbl")
            )
            .select(F.col("nid").alias("id"), "lbl")
            # lazy: all rounds + the final join materialize in ONE action;
            # the checkpoint only truncates the plan (RDD cache released
            # by the ContextCleaner once the round's reference drops).
            .localCheckpoint(eager=False, storageLevel=_CKPT_LEVEL)
        )
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    return labels.join(sizes, "lbl").select(
        F.col("id").alias("doc_id"),
        F.col("lbl").alias("community"),
        "community_size",
    )
