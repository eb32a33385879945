"""Plan audit: dump red flags for every catalog query.

Greps each query's optimized physical plan for the things that kill 100 TB
runs: cartesian products, unexpected nested-loop joins, and scans that read
every column. Prints one line per query; RED lines deserve a look.

Some BroadcastNestedLoopJoins are by construction (query-set × candidate-set
similarity scans, scalar-subquery broadcasts) — the audit marks them `ok`
for the queries that declare them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcane_framework_spark.queries import QUERIES  # noqa: E402
from arcane_framework_spark.session import get_spark  # noqa: E402

#: Queries where a nested-loop broadcast join is the intended plan.
EXPECTED_BNLJ = {
    "knn_bruteforce_embeddings",   # query-set × candidate scan
    "semantic_decontam_embeddings",  # corpus × broadcast BENCHMARK set
                                   # (benchmark-bounded — the
                                   # knn_bruteforce plan class)
    "ivf_topk_embeddings",         # corpus × broadcast centroids
    "kmeans_embeddings",           # corpus × broadcast centroids per Lloyd pass
    "q22_inactive_customers",      # scalar threshold broadcast
    "lsh_recall_documents",        # exact ground truth on a FIXED-SIZE sample
    "knn_label_purity_embeddings",  # composes knn_bruteforce (query × scan)
    "semantic_dedup_embeddings",   # corpus × broadcast centroids (kmeans/IVF)
    "hard_negatives_embeddings",   # query-set × candidate scan with the
                                   # label-inequality predicate as the join
                                   # condition — same shape as knn_bruteforce
    "pq_recall_embeddings",        # composes knn_bruteforce (exact ground
                                   # truth for recall) + per-subspace Lloyd
                                   # passes (corpus × broadcast centroids)
    "ivfpq_recall_embeddings",     # same composition + coarse-cell
                                   # assignment (corpus × broadcast cells)
    "classifier_eval_embeddings",  # test set × broadcast labeled
                                   # prototypes (the ivf_assign scored
                                   # cross — prototype count ≪ N)
    "kmv_intersections_events",    # pair grid over the PER-SET theta
                                   # table (one row per set): pairwise
                                   # set algebra is quadratic in #sets
                                   # by definition, and the table is
                                   # sets-sized, never corpus-sized
    "semantic_dedup_split_embeddings",  # routed twin with the cap forced
                                   # to bind — identical plan class to
                                   # semantic_dedup_routed_embeddings
                                   # below (the split is windows, not a
                                   # join)
    "semantic_dedup_routed_embeddings",  # two-level assignment: corpus ×
                                   # broadcast COARSE centroids (~sqrt(k)
                                   # rows) then × the routed fine subset —
                                   # the same corpus×broadcast-centroid
                                   # scan class as ivf/kmeans, with the
                                   # broadcast side sqrt(k)-sized
    "incremental_semantic_dedup_embeddings",  # two ivf_assign calls
                                   # (corpus × broadcast centroids, the
                                   # ivf/kmeans class); the batch-vs-
                                   # corpus probe itself is a cid-keyed
                                   # equi-join, not a nested loop
    "ivf_multiprobe_recall_embeddings",  # query-set × candidate/centroid
                                   # scans (the knn_bruteforce class: the
                                   # broadcast side is the FIXED-size
                                   # query set / centroid table) plus a
                                   # 3-row probe-grid non-equi join —
                                   # every build side here is bounded by
                                   # construction, never corpus-sized
    "ngram_cap_recall_documents",  # exact all-pairs char-ngram ground
                                   # truth on a count-derived FIXED-SIZE
                                   # sample (same class as lsh_recall):
                                   # the broadcast side is the sample,
                                   # never the corpus
    "semantic_dedup_agreement_embeddings",  # runs BOTH SemDeDup twins
                                   # (exact + routed) to measure decision
                                   # agreement, so it inherits the
                                   # corpus × broadcast-centroid BNLJ
                                   # class from each allowlisted
                                   # constituent; at 100 TB this entry
                                   # runs on a sample by design (X159)
}

#: No query is allowed a CartesianProduct: lsh_recall's exact all-pairs
#: ground truth (the one former occupant) now runs as a broadcast
#: non-equi join over a count-derived fixed-size sample.
EXPECTED_CARTESIAN: set[str] = set()

#: Streaming-executed queries — no batch plan to audit.
SKIP = {
    "streaming_hourly_rollup",
    "streaming_dedup_users",
    "streaming_incremental_dedup",
}

#: Queries whose plans contain UNPARTITIONED Window operators — each one
#: single-partitions its input, so every site must operate on a table
#: whose cardinality is BOUNDED by design (bands/types/levels/buckets,
#: never corpus rows). This encodes the round-13 verdict #3 review as an
#: assert: ``name -> (max_sites, cardinality class)``. A site count
#: above the recorded max, or an unpartitioned window in a query not
#: listed here, is a RED flag — a new corpus-scale single-partition
#: window becomes a review-time catch instead of a 100× OOM. Classes
#: that say "rank-limit-capped" additionally assert the plan
#: contains a rank-limit pushdown node (WindowGroupLimit, or a
#: TakeOrderedAndProject that feeds the window only k rows) capping the
#: single-partition sort's input at k rows per map partition.
BOUNDED_UNPARTITIONED_WINDOWS: dict[str, tuple[int, str]] = {
    "pack_documents_512": (
        1, "bucket-offset table: one row per prefix-sum group, "
           "partition-count-bounded"),
    "pps_sample_documents": (
        1, "bucket-offset table (PPS cumulative weights), "
           "partition-count-bounded"),
    "budget_selection_documents": (
        1, "score-ordered bucket-offset table, partition-count-bounded"),
    "skew_report_events": (
        1, "top-k hot keys, rank-limit-capped"),
    "salted_join_events": (
        2, "top-k hot-key pickers (report + salt list), "
           "rank-limit-capped"),
    "training_order_documents": (
        2, "one row per SOURCE (interleave stride + global source count)"),
    "epoch_mix_documents": (
        1, "epoch × source mixture-weight table"),
    "bigram_lift_documents": (
        1, "top-k lift over bigram types, rank-limit-capped"),
    "bpe_merges_documents": (
        1, "top-1 pair per merge round, rank-limit-capped"),
    "survival_signup_purchase": (
        2, "Kaplan-Meier duration levels (distinct day-granular "
           "durations)"),
    "rake_keyphrases_documents": (
        1, "top-k phrases, rank-limit-capped"),
    "vocab_growth_documents": (
        1, "one row per log-scale corpus-size bucket"),
    "event_paths_users": (
        1, "top-k transition paths, rank-limit-capped"),
    "session_copairs_events": (
        1, "top-k event-type pairs (type²-bounded), "
           "rank-limit-capped"),
    "spearman_corr_documents": (
        2, "rank over distinct VALUE levels (length types, not docs)"),
    "benford_audit_orders": (
        1, "nine leading-digit rows"),
    "chi2_independence_events": (
        2, "event_type × day-of-week contingency cells"),
    "basket_rules_lineitem": (
        1, "top-k association rules, rank-limit-capped"),
    "rfm_segments_customers": (
        6, "quantile edges over distinct R/F/M value levels + their "
           "1-row totals"),
    "allocation_hamilton_documents": (
        3, "one row per source (+ 1-row totals, remainder rank)"),
    "vocab_shift_documents": (
        2, "top-k rising/falling terms, rank-limit-capped"),
    "date_gaps_orders": (
        1, "one row per year-month"),
    "priority_sample_documents": (
        1, "top-(k+1) DLT priorities, rank-limit-capped"),
    "quality_weighted_sample_documents": (
        1, "top-(k+1) DLT priorities, rank-limit-capped"),
    "streaming_priority_sample": (
        2, "re-rank over the ≤(k+1)-row driver-held DLT state relation "
           "(unpersisted local relation: the τ scalar and the sample "
           "filter each re-rank the same ≤65 rows)"),
}


def _top_bracket_groups(args_line: str) -> list[str]:
    """Top-level ``[...]`` groups of a formatted-plan Arguments line."""
    s = args_line.split("Arguments:", 1)[1]
    groups: list[str] = []
    depth, cur, started = 0, "", False
    for ch in s:
        if ch == "[":
            if depth == 0:
                started, cur = True, ""
            depth += 1
            if depth == 1:
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0 and started:
                groups.append(cur)
                started = False
                continue
        if started:
            cur += ch
    return groups


def unpartitioned_windows(plan: str) -> list[str]:
    """Order-spec snippets of every UNPARTITIONED Window node in a
    formatted plan. A Window's Arguments line is ``[exprs],
    [partitionSpec], [orderSpec]`` with EMPTY specs omitted, so two
    groups are ambiguous: ``[exprs], [order]`` (unpartitioned — order
    entries carry ``NULLS FIRST/LAST`` sort markers) vs ``[exprs],
    [partition]`` (partitioned, no order — bare expressions). One group
    is always unpartitioned (global frame)."""
    import re

    out = []
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if not re.match(r"\(\d+\) Window\b", line.strip()):
            continue
        for j in range(i + 1, min(i + 8, len(lines))):
            if lines[j].strip().startswith("Arguments:"):
                g = _top_bracket_groups(lines[j])
                if len(g) == 1:
                    out.append("<global frame>")
                elif len(g) == 2 and (
                    "NULLS FIRST" in g[1] or "NULLS LAST" in g[1]
                ):
                    out.append(g[1][:60])
                break
    return out


def _tree_depth(line: str) -> int:
    """Nesting depth of a physical-plan toString line (length of the
    ``:  +- `` decoration before the operator name)."""
    return len(line) - len(line.lstrip(" :+-"))


def _only_scalar_bnlj(executed_plan: str) -> bool:
    """True if every BroadcastNestedLoopJoin's subtree contains a 1-row
    global aggregate (``HashAggregate(keys=[]``/``SortAggregate(key=[]``,
    a SinglePartition exchange) or a provably-1-row limit
    (``TakeOrderedAndProject(limit=1``/``GlobalLimit 1`` — e.g. an
    argmax winner broadcast into a rewrite) — the scalar-attach
    pattern. Walks the join's actual indented subtree, so probe-side
    depth can't push the build side out of a fixed window."""
    import re

    scalar_sig = re.compile(
        r"(HashAggregate|SortAggregate)\s*\((keys|key)=\[\]"
        r"|TakeOrderedAndProject\(limit=1[,)]"
        r"|GlobalLimit 1[,\s]"
    )
    lines = executed_plan.splitlines()
    for i, line in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in line:
            continue
        depth = _tree_depth(line)
        subtree = []
        for nxt in lines[i + 1:]:
            if nxt.strip() and _tree_depth(nxt) <= depth:
                break
            subtree.append(nxt)
        block = "\n".join(subtree)
        if not scalar_sig.search(block) and \
                "Exchange SinglePartition" not in block:
            return False
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("arcane-explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for name, fn in QUERIES.items():
        if name in SKIP:
            print(f"SKIP  {name} (streaming execution)")
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        flags = []
        if "CartesianProduct" in plan and name not in EXPECTED_CARTESIAN:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan and name not in EXPECTED_BNLJ:
            # A BNLJ whose build side is a GLOBAL aggregate (no grouping
            # keys → exactly one row) is the scalar-attach pattern — a
            # computed threshold/total/stride joined to every row. That is
            # the correct 100 TB plan (the 1-row side broadcasts); only
            # flag nested loops against multi-row relations.
            executed = df._jdf.queryExecution().executedPlan().toString()
            if not _only_scalar_bnlj(executed):
                flags.append("NESTED-LOOP")
        unp = unpartitioned_windows(plan)
        allowed = BOUNDED_UNPARTITIONED_WINDOWS.get(name)
        if unp:
            if allowed is None:
                flags.append(f"UNPART-WINDOW({len(unp)})")
            elif len(unp) > allowed[0]:
                flags.append(
                    f"UNPART-WINDOW-GREW({len(unp)}>{allowed[0]})"
                )
            elif ("rank-limit-capped" in allowed[1]
                    and "WindowGroupLimit" not in plan
                    and "TakeOrderedAndProject" not in plan):
                # the allowlist rationale claims a rank-limit pushdown
                # bounds the single-partition sort (WindowGroupLimit, or
                # TakeOrderedAndProject feeding the window k rows) —
                # verify one is actually in the plan
                flags.append("UNPART-WINDOW-UNCAPPED")
        elif allowed is not None:
            # stale allowlist entry: the window disappeared — not a
            # failure, but worth a line so the list stays honest
            print(f"note  {name}: allowlisted unpartitioned window "
                  "no longer in plan")
        import re

        # formatted mode prints "(N) Exchange" headers with the partitioning
        # on a separate Arguments line
        n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
        status = "RED " if flags else "ok  "
        if flags:
            failures += 1
        print(f"{status}{name}: exchanges={n_exchanges} {' '.join(flags)}")
    print(f"\n{failures} flagged plan(s)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
