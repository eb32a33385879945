"""Operator unit tests: CDC relational ops, dedup, similarity, text."""

import hashlib

from pyspark.sql import functions as F

from arcane_framework_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_signatures,
)
from arcane_framework_spark.operators.relational import (
    changes_since,
    delta_join,
    latest_state,
    project,
)
from arcane_framework_spark.operators.similarity import (
    hyperplane_weights,
    knn_bruteforce,
    lsh_buckets,
)
from arcane_framework_spark.operators.text import (
    fingerprint_expr,
    lang_id_expr,
    token_count_expr,
)


def _changes(spark):
    # (key, version, op, payload)
    rows = [
        (1, 10, "I", "a0"),
        (1, 20, "U", "a1"),
        (2, 15, "I", "b0"),
        (2, 30, "D", None),
        (3, 5, "I", "c0"),
    ]
    return spark.createDataFrame(
        rows, "k: int, sys_change_version: long, sys_change_operation: string, v: string"
    )


def test_changes_since_filters_versions(spark):
    df = _changes(spark)
    got = changes_since(df, "sys_change_version", 14)
    assert {r.sys_change_version for r in got.collect()} == {20, 15, 30}


def test_project_reorders_and_prunes(spark):
    """R3/R10 — explicit projection & column ALIGNMENT: output column
    order follows the requested sequence (parquet writers downstream are
    order-sensitive), absent columns are pruned."""
    df = spark.createDataFrame([(1, "a", 2.0)], "x: int, y: string, z: double")
    out = project(df, ["z", "x"])
    assert out.columns == ["z", "x"]
    assert out.first() == (2.0, 1)


def test_latest_state_folds_and_drops_deletes(spark):
    folded = latest_state(_changes(spark), merge_key="k").collect()
    by_key = {r.k: r for r in folded}
    # key 2's latest change is a delete -> dropped entirely
    assert set(by_key) == {1, 3}
    assert by_key[1].sys_change_version == 20
    assert by_key[1].v == "a1"


def test_latest_state_keep_deletes(spark):
    folded = latest_state(_changes(spark), merge_key="k", drop_deletes=False)
    assert {r.k for r in folded.collect()} == {1, 2, 3}


def test_delta_join_nulls_deleted_payload(spark):
    table = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "k: int, name: string"
    )
    changes = _changes(spark).select("k", "sys_change_version", "sys_change_operation")
    for broadcast in (False, True):
        out = delta_join(
            changes, table, ["k"], broadcast_changes=broadcast
        ).collect()
        assert len(out) == 5  # every change row preserved
        deleted = [r for r in out if r.sys_change_operation == "D"]
        assert all(r.name is None for r in deleted)
        live = [r for r in out if r.k == 1]
        assert all(r.name == "alice" for r in live)
        # key 3 has no table row -> NULL payload but the change survives
        assert [r.name for r in out if r.k == 3] == [None]


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "same  text"), (2, "same text"), (3, "other")],
        "doc_id: long, text: string",
    )
    out = {r.keep_id: r.n_dupes for r in exact_dedup(df).collect()}
    # whitespace-normalized fingerprints collapse docs 1 and 2
    assert out == {1: 2, 3: 1}


def test_minhash_identical_docs_pair_with_jaccard_one(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely different words entirely here")],
        "doc_id: long, text: string",
    )
    pairs = minhash_lsh_pairs(df).collect()
    assert [(p.id_a, p.id_b, p.jaccard) for p in pairs] == [(1, 2, 1.0)]


def test_minhash_signature_shape(spark):
    from arcane_framework_spark.operators.dedup import MINHASH_P

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id: long, text: string")
    row = minhash_signatures(df).head()
    sig = [row[f"s{i}"] for i in range(16)]
    assert all(0 <= v < MINHASH_P for v in sig)  # affine-permuted base hash
    assert len(set(sig)) > 1  # permutations differ


def test_minhash_expr_matches_dataframe_form(spark):
    """The HOF expression form and the exploded DataFrame form must agree
    (same universal-hash family, same constants)."""
    from arcane_framework_spark.operators.dedup import minhash_signature_expr

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id: long, text: string",
    )
    via_expr = df.select(minhash_signature_expr("text").alias("sig")).head().sig
    row = minhash_signatures(df).head()
    assert via_expr == [row[f"s{i}"] for i in range(16)]


def test_simhash_identical_texts_equal(spark):
    df = spark.createDataFrame(
        [(1, "spark engine test"), (2, "spark  engine   test"), (3, "unrelated")],
        "doc_id: long, text: string",
    )
    sigs = {r.id: r.simhash for r in simhash_signatures(df).collect()}
    assert sigs[1] == sigs[2]  # whitespace-insensitive
    from arcane_framework_spark.operators.dedup import SIMHASH_BITS

    assert set(sigs[1]) <= {"0", "1"} and len(sigs[1]) == SIMHASH_BITS


def test_knn_excludes_self_and_ranks(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [1.0, 0.05]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = knn_bruteforce(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    assert all(r.neighbor_id != 0 for r in out)
    ranked = sorted(out, key=lambda r: r.rank)
    assert [r.neighbor_id for r in ranked] == [3, 1]  # cosine order
    assert ranked[0].cosine > ranked[1].cosine


def test_lsh_buckets_shape_and_determinism(spark):
    df = spark.createDataFrame(
        [(0, [0.1] * 8), (1, [0.1] * 8), (2, [-0.5] * 8)],
        "vec_id: long, embedding: array<float>",
    )
    out = {r.id: r.bucket for r in lsh_buckets(df, dim=8).collect()}
    assert out[0] == out[1]  # identical vectors, identical bucket
    assert len(out[0]) == 16 and set(out[0]) <= {"0", "1"}


def test_hyperplane_weights_deterministic():
    w1 = hyperplane_weights(4, 8)
    w2 = hyperplane_weights(4, 8)
    assert w1 == w2
    assert all(x in (-1, 1) for row in w1 for x in row)


def test_token_count_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one"), (4, "two  words")],
        "id: int, text: string",
    )
    out = {r.id: r.n for r in df.select("id", token_count_expr().alias("n")).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 2}


def test_fingerprint_whitespace_normalization(spark):
    df = spark.createDataFrame(
        [(1, " Hello   world "), (2, "hello world")], "id: int, text: string"
    )
    fps = [r.f for r in df.select(fingerprint_expr().alias("f")).collect()]
    assert fps[0] == fps[1] == hashlib.md5(b"hello world").hexdigest()


def test_lang_id_prefers_profile_hits(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is big"),
            (2, "der hund ist ein tier und das ist gut"),
            (3, "xyzzy plugh foobar"),
        ],
        "id: int, text: string",
    )
    out = {r.id: r.p for r in df.select("id", lang_id_expr().alias("p")).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "und"


# ---------------------------------------------------------------------------
# n-gram Jaccard / banded LSH / IVF / multimodal / BPE tokens
# ---------------------------------------------------------------------------


def test_ngram_jaccard_finds_planted_neardup(spark):
    from arcane_framework_spark.operators.dedup import ngram_jaccard_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog " * 2),
        (3, "completely unrelated zebra xylophone quartz vibes"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             ngram_jaccard_pairs(df, min_jaccard=0.5).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] > 0.8
    assert all(a < b for a, b in pairs)


def test_ann_banded_pairs_scaled_vector_is_exact_dup(spark):
    from arcane_framework_spark.operators.similarity import ann_banded_pairs

    rows = [
        (1, [1.0, 0.0, 2.0, -1.0]),
        (2, [2.0, 0.0, 4.0, -2.0]),   # same direction -> cosine 1, same signs
        (3, [-1.0, 5.0, -2.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    got = {(r.id_a, r.id_b): r.cosine
           for r in ann_banded_pairs(df, dim=4, min_cosine=0.9,
                                     num_planes=8, band_size=4).collect()}
    assert got == {(1, 2): 1.0}


def test_semantic_dedup_routed_prunes_planted_dups(spark):
    """Routed (two-level) assignment keeps SemDeDup behavior on clearly
    clustered data: planted exact duplicates are pruned (one survivor
    per dup pair), output schema matches the exact twin, and every
    vector gets exactly one cell."""
    import random

    from arcane_framework_spark.operators.similarity import semantic_dedup

    rng = random.Random(3)
    rows = []
    for i in range(60):
        center = i % 3  # three well-separated clusters
        base = [0.0] * 8
        base[center * 2] = 10.0
        rows.append((i, [x + rng.uniform(-0.1, 0.1) for x in base]))
    # plant exact duplicates of every 10th vector
    rows += [(1000 + i, list(rows[i][1])) for i in range(0, 60, 10)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")

    out = semantic_dedup(
        df, k=None, threshold=0.99, iterations=2, target_cell_size=16,
        routed=True,
    ).collect()
    assert len(out) == len(rows)
    assert {r.vec_id for r in out} == {r[0] for r in rows}
    by_id = {r.vec_id: r for r in out}
    for i in range(0, 60, 10):
        # identical vectors share a cell; the higher id is dominated by
        # its twin (equal cent_cos, lower id wins) so it is ALWAYS pruned
        assert by_id[i].cid == by_id[1000 + i].cid
        assert by_id[1000 + i].pruned
    # the local-maxima rule keeps at least one survivor per cell
    cells = {r.cid for r in out}
    survivors = {r.cid for r in out if not r.pruned}
    assert survivors == cells


def test_routed_kmeans_truncates_lineage(spark):
    """Routed k-means must return CHECKPOINTED centroids: persisting only
    caches the data — the compounded per-iteration plan still gets
    re-optimized by Catalyst on every broadcast job of the next consumer
    (measured 17.1s vs 1.7s for one 2100-row assignment). The returned
    plan must therefore be a flat scan (LogicalRDD), not a join tree."""
    from arcane_framework_spark.operators.similarity import kmeans_fit

    rows = [(i, [float(i % 7), float(i % 3), 1.0, 0.5]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    cent = kmeans_fit(
        df, k=None, iterations=1, target_cell_size=8, routed=True
    )
    plan = cent._jdf.queryExecution().logical().toString()
    assert "LogicalRDD" in plan, plan
    assert "Join" not in plan, plan


def test_semantic_dedup_routed_hard_caps_cell_size(spark):
    """The routed path's hard cell cap: 40 IDENTICAL vectors all route to
    one cell (worst-case overfill, the shape measured at 100x stress:
    max 1614 vs target 64), and with target_cell_size=2 the cap is
    SEMDEDUP_SPLIT_FACTOR*2 = 16, so the cell must split into
    rank-contiguous sub-cells of 16/16/8, each re-keyed by its MIN
    member id. Within a sub-cell every pair has cosine 1 and equal
    cent_cos, so the lowest id is the unique survivor."""
    from arcane_framework_spark.operators.similarity import (
        SEMDEDUP_SPLIT_FACTOR,
        semantic_dedup,
    )

    vec = [3.0, 1.0, 2.0, 0.5]
    rows = [(i, list(vec)) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")

    cap = SEMDEDUP_SPLIT_FACTOR * 2
    assert cap == 16
    out = semantic_dedup(
        df, k=None, threshold=0.9, iterations=1, target_cell_size=2,
        routed=True,
    ).collect()
    assert len(out) == 40
    sizes: dict[int, int] = {}
    for r in out:
        sizes[r.cid] = sizes.get(r.cid, 0) + 1
    # hard bound holds EXACTLY, and sub-cells are keyed by min member id
    assert max(sizes.values()) <= cap
    assert sizes == {0: 16, 16: 16, 32: 8}
    survivors = sorted(r.vec_id for r in out if not r.pruned)
    assert survivors == [0, 16, 32]


def test_semantic_dedup_split_entry_binds_at_gate_scale(spark):
    """The forced-split catalog twin (split_factor=1 -> cap 64) must make
    the cap BIND on the gate corpus, not just exist: routed cells at
    sf0.01 reach 129 members, so the output must contain (a) no cell
    above the cap and (b) at least one sub-cell at EXACTLY the cap —
    proof a cell overflowed and was rank-split. Cross-engine equivalence
    of the firing split (row_number ties, floor-division sub-keys,
    min-member re-keying) is what the entry's DuckDB oracle hash-checks
    in every gate run; this test pins the Spark-side precondition that
    makes that check meaningful at gate scale."""
    from arcane_framework_spark.queries_ext import (
        SEMDEDUP_CELL,
        SEMDEDUP_FORCED_SPLIT_FACTOR,
        semantic_dedup_split_embeddings,
    )

    out = semantic_dedup_split_embeddings(spark, "/root/testdata/sf0.01")
    sizes = [
        r["n"]
        for r in out.groupBy("cid").agg(F.count("*").alias("n")).collect()
    ]
    cap = SEMDEDUP_FORCED_SPLIT_FACTOR * SEMDEDUP_CELL
    assert sum(sizes) == 525  # every planted-corpus vector still assigned
    assert max(sizes) <= cap
    assert cap in sizes, f"cap never bound: sizes={sorted(sizes)}"


def test_ivf_assign_routed_never_drops_vectors(spark):
    """Routed assignment is a chain of inner joins (vector->coarse,
    coarse->fine via f2c, base->assigned); if a coarse cell ended up with
    NO fine member (an fp-ulp self-routing anomaly between near-duplicate
    centroids), its vectors would silently vanish. The f2c self-route pin
    (cid == ccid sorts above any computed cosine) makes that structurally
    impossible — every coarse centroid is its own cell's fine member.
    Exercise the worst case: EXACT-duplicate centroids (self-cos ties
    with a twin's cos at 1.0 in both engines' fp) and assert the row
    count invariant."""
    from arcane_framework_spark.operators.similarity import ivf_assign_routed

    # 12 centroids, every one an exact duplicate of its neighbor pair —
    # before the pin, a coarse centroid could tie-route to its twin.
    cvec = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [2.0, 1.0]]
    cents = [(i, list(cvec[i % 4])) for i in range(12)]
    cdf = spark.createDataFrame(cents, "cid: long, cvec: array<double>")
    rows = [(i, [float(1 + i % 5), float(i % 3)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    out = ivf_assign_routed(df, cdf)
    assert out.count() == 200


def test_ann_lsh_pairs_parity_with_banded(spark):
    """ann_lsh_pairs (full-signature AND-amplified bucket join) is the
    high-precision end of the same hyperplane-LSH family as
    ann_banded_pairs: a full P-bit signature match implies every band
    matches, so its pair set is a SUBSET of the banded pairs at the same
    planes, with bit-identical cosines on the overlap."""
    import random

    from arcane_framework_spark.operators.similarity import (
        ann_banded_pairs,
        ann_lsh_pairs,
    )

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    # plant exact-direction twins so the full-signature path fires
    rows += [(100 + i, [2.0 * x for x in rows[i][1]]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")

    lsh = {(r.id_a, r.id_b): r.cosine
           for r in ann_lsh_pairs(df, dim=8, num_planes=8).collect()}
    banded = {(r.id_a, r.id_b): r.cosine
              for r in ann_banded_pairs(df, dim=8, num_planes=8,
                                        band_size=4).collect()}
    assert lsh, "twins must collide on the full signature"
    assert set(lsh) <= set(banded)
    assert all(banded[k] == v for k, v in lsh.items())
    for i in range(5):
        assert (i, 100 + i) in lsh and lsh[(i, 100 + i)] == 1.0


def test_ivf_topk_identical_vector_ranks_first(spark):
    from arcane_framework_spark.operators.similarity import ivf_topk

    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),      # near query
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.9, 0.2]),
        (4, [1.0, 0.05, 0.0]),     # nearest to query 0
    ]
    df = spark.createDataFrame(vecs, "vec_id: long, embedding: array<double>")
    centroids = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])],
        "cid: long, cvec: array<double>",
    )
    q = df.filter(F.col("vec_id") == 0)
    got = ivf_topk(df, centroids, q, k=2).collect()
    assert [r.neighbor_id for r in got] == [4, 1]  # cell of centroid 100 only
    assert [r.rank for r in got] == [1, 2]


def test_multimodal_features_match_hashlib(spark):
    from arcane_framework_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        documents_as_assets,
        extract_features,
    )

    df = spark.createDataFrame(
        [(7, "hello world"), (8, "")], "doc_id: long, text: string"
    )
    feats = extract_features(documents_as_assets(df))
    assert feats.schema == FEATURE_SCHEMA
    by_id = {r.doc_id: r for r in feats.collect()}
    raw = "hello world".encode()
    assert by_id[7].n_bytes == len(raw)
    assert by_id[7].sha256 == hashlib.sha256(raw).hexdigest()
    assert by_id[7].width == len(raw) % 640 + 16
    assert by_id[7].height == len(raw) * 7 % 480 + 16
    assert by_id[8].n_bytes == 0


def test_multimodal_decode_is_stubbed():
    import pytest as _pytest

    from arcane_framework_spark.operators.multimodal import decode_image

    with _pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def _make_bmp(pixels, bottom_up=True):
    """Encode a list-of-rows of (r, g, b) tuples as an uncompressed
    24-bit BMP (rows padded to 4 bytes, BGR order, standard 54-byte
    header)."""
    import struct as _struct

    height, width = len(pixels), len(pixels[0])
    stride = (width * 3 + 3) & ~3
    rows = pixels[::-1] if bottom_up else pixels
    body = b"".join(
        b"".join(bytes([b, g, r]) for (r, g, b) in row)
        + b"\x00" * (stride - width * 3)
        for row in rows
    )
    header = _struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + _struct.pack(
        "<IiiHHIIiiII", 40, width, height if bottom_up else -height,
        1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


def test_decode_bmp_pure_numpy():
    """The no-deps BMP decoder returns exact RGB pixels for both row
    orders (positive height = bottom-up) and honest errors otherwise."""
    import numpy as np
    import pytest as _pytest

    from arcane_framework_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
    )

    pixels = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],   # top row
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    for bottom_up in (True, False):
        img = decode_bmp(_make_bmp(pixels, bottom_up=bottom_up))
        assert img.shape == (2, 3, 3)
        assert np.array_equal(img, np.asarray(pixels, dtype=np.uint8))
    # decode_image routes BMP to the native decoder (no PIL needed)
    assert decode_image(_make_bmp(pixels)).shape == (2, 3, 3)
    with _pytest.raises(ValueError):
        decode_bmp(b"BMtruncated")
    with _pytest.raises(NotImplementedError):
        # 8-bit payload: header parses, bit depth unsupported
        bad = bytearray(_make_bmp(pixels))
        bad[28] = 8
        decode_bmp(bytes(bad))


def test_decode_ppm_pure_numpy():
    """The no-deps P6 PPM decoder: header grammar (whitespace, comments),
    top-down RGB layout, honest errors for truncation and 16-bit."""
    import numpy as np
    import pytest as _pytest

    from arcane_framework_spark.operators.multimodal import (
        decode_image,
        decode_ppm,
    )

    pixels = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    ppm = b"P6\n3 2\n255\n" + pixels.tobytes()
    assert np.array_equal(decode_ppm(ppm), pixels)
    # decode_image routes P6 to the native decoder (no PIL needed)
    assert np.array_equal(decode_image(ppm), pixels)
    # comments between header tokens are legal PPM
    commented = b"P6\n# made by a test\n3 2\n# maxval next\n255\n" + pixels.tobytes()
    assert np.array_equal(decode_ppm(commented), pixels)
    with _pytest.raises(ValueError):
        decode_ppm(b"P6\n3 2\n255\n" + pixels.tobytes()[:-1])  # truncated
    with _pytest.raises(NotImplementedError):
        decode_ppm(b"P6\n3 2\n65535\n" + pixels.tobytes() * 2)  # 16-bit
    with _pytest.raises(ValueError):
        decode_ppm(b"P5\n3 2\n255\n")  # not P6
    # sub-255 maxval: samples stored in [0, maxval] rescale to uint8
    # (netpbm's value*255/maxval, round-half-up) — maxval=15: 0→0,
    # 7→119, 15→255.
    lowmax = np.array(
        [[[0, 7, 15], [15, 0, 7]]], dtype=np.uint8
    )  # 1x2 RGB, samples within [0, 15]
    got = decode_ppm(b"P6\n2 1\n15\n" + lowmax.tobytes())
    assert np.array_equal(
        got, np.array([[[0, 119, 255], [255, 0, 119]]], dtype=np.uint8)
    )
    with _pytest.raises(ValueError):
        decode_ppm(b"P6\n2 1\n0\n" + lowmax.tobytes())  # degenerate maxval


def test_synth_image_roundtrip_all_formats():
    """synth_image_bytes(bmp), (ppm), and (png) decode to the SAME
    logical array: BMP's bottom-up BGR, PPM's top-down RGB, and PNG's
    zlib-deflated filtered scanlines all unscramble identically."""
    import numpy as np

    from arcane_framework_spark.operators.multimodal import (
        decode_image,
        synth_image_bytes,
    )

    a = decode_image(synth_image_bytes(42, 9, 10, "bmp"))
    b = decode_image(synth_image_bytes(42, 9, 10, "ppm"))
    p = decode_image(synth_image_bytes(42, 9, 10, "png"))
    assert a.shape == b.shape == p.shape == (10, 9, 3)
    assert np.array_equal(a, b) and np.array_equal(a, p)
    assert int(a[0, 0, 0]) == 42  # decoded top-left red sample = seed
    # stored-deflate IDAT keeps the PNG size closed-form (oracle contract)
    assert len(synth_image_bytes(42, 9, 10, "png")) == 68 + 10 * (1 + 3 * 9)


def test_png_codec_filters_colortypes_and_errors():
    """decode_png handles all five scanline filters and gray/RGB/RGBA,
    verifies chunk CRCs, and raises the documented errors for the
    unsupported corners (palette, 16-bit, interlace)."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np
    import pytest as _pytest

    from arcane_framework_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for channels in (1, 3, 4):
        img = rng.integers(0, 256, (9, 6, channels), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    for f in range(5):  # each filter type alone
        assert np.array_equal(
            decode_png(encode_png(img, filters=[f] * 7)), img
        ), f
    # a real-deflate IDAT (how external PNGs arrive) decodes too
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(7))
    ext = (
        _PNG_SIG
        + _png_chunk(b"IHDR", _struct.pack(">IIBBBBB", 5, 7, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", _zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(ext), img)
    good = bytearray(encode_png(img))
    bad = bytearray(good)
    bad[50] ^= 0xFF  # corrupt a byte inside a chunk -> CRC catches it
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with _pytest.raises(ValueError):
        decode_png(bytes(good[:-8]))  # truncated
    with _pytest.raises(ValueError):
        decode_png(b"\x89PNGnope")
    depth16 = (
        _PNG_SIG
        + _png_chunk(b"IHDR", _struct.pack(">IIBBBBB", 5, 7, 16, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", _zlib.compress(b"\x00" * (7 * 31)))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError):
        decode_png(depth16)
    interlaced = (
        _PNG_SIG
        + _png_chunk(b"IHDR", _struct.pack(">IIBBBBB", 5, 7, 8, 2, 0, 0, 1))
        + _png_chunk(b"IDAT", _zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError):
        decode_png(interlaced)


def test_jpeg_codec_exact_grayscale_and_bounded_rgb():
    """decode_jpeg vs an INDEPENDENT quantize->dequantize->IDCT
    reconstruction: bit-exact for grayscale (shared math is only the
    published tables), bounded error for RGB, exact for the even
    block-constant synthetic."""
    import numpy as np
    import pytest as _pytest

    from arcane_framework_spark.operators.jpeg import (
        QUANT_LUMA,
        _basis,
        decode_jpeg,
        encode_jpeg,
    )
    from arcane_framework_spark.operators.multimodal import (
        decode_image,
        synth_jpeg_bytes,
    )

    # block-constant even values survive quantization exactly
    img = decode_image(synth_jpeg_bytes(seed=77, width=12, height=10))
    assert img.shape == (10, 12, 1)
    bi = np.arange(10)[:, None] // 8
    bj = np.arange(12)[None, :] // 8
    assert np.array_equal(img[:, :, 0], ((154 + bi * 14 + bj * 6) % 256))

    # random grayscale: decoder == independent reconstruction, exactly
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(g))[:, :, 0].astype(np.int64)
    B = _basis()
    Q = np.array(QUANT_LUMA, dtype=np.float64).reshape(8, 8)
    gp = np.zeros((24, 24))
    gp[:, :17] = g
    gp[:, 17:] = g[:, 16:17]  # encoder pads by edge replication
    exp = np.zeros((24, 24))
    for by in range(0, 24, 8):
        for bx in range(0, 24, 8):
            blk = gp[by:by + 8, bx:bx + 8] - 128.0
            fq = np.round((B @ blk @ B.T) / Q) * Q
            exp[by:by + 8, bx:bx + 8] = np.clip(
                np.round(B.T @ fq @ B + 128.0), 0, 255
            )
    assert np.array_equal(dec, exp[:, :17].astype(np.int64))

    # smooth RGB: quantization+color loss stays small
    x = np.arange(32)[None, :, None]
    y = np.arange(24)[:, None, None]
    smooth = np.clip(
        100 + 2 * x + 3 * y + np.array([0, 10, 20])[None, None, :], 0, 255
    ).astype(np.uint8)
    dec3 = decode_jpeg(encode_jpeg(smooth)).astype(np.int64)
    assert np.abs(dec3 - smooth.astype(np.int64)).max() <= 14

    # documented failure modes
    with _pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01")
    with _pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(g)[:-30])  # truncated entropy stream
    prog = bytearray(encode_jpeg(g))
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(prog))


def test_jpeg_decode_420_subsampling_and_restarts():
    """Decode paths our encoder never emits: a hand-built 4:2:0 stream
    (MCU = 4 Y blocks + Cb + Cr, chroma upsampled 2x2) with DRI/RSTn
    restart markers resetting the DC predictors."""
    import struct as _struct

    import numpy as np

    from arcane_framework_spark.operators.jpeg import (
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        ZIGZAG,
        _BitWriter,
        _build_encode_table,
        _csize,
        decode_jpeg,
    )

    # 32x16 image, 4:2:0 -> MCU 16x16 -> 2 MCUs. Flat luma per MCU
    # (120 then 200 -> even values, DC-only exact), flat chroma 128.
    dc = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)

    def q00_dc(v):  # quantized DC of a flat block of value v (Q00=16)
        return round(8 * (v - 128) / 16)

    def put_block(w, dcq, pred):
        diff = dcq - pred
        size = _csize(diff)
        code, length = dc[size]
        w.write(code, length)
        if size:
            mag = diff if diff >= 0 else diff + (1 << size) - 1
            w.write(mag & ((1 << size) - 1), size)
        code, length = ac[0x00]  # EOB
        w.write(code, length)

    payload = bytearray()
    luma_vals = [120, 200]
    for mi, v in enumerate(luma_vals):
        w = _BitWriter()
        pred_y = 0  # restart interval 1: predictors reset per MCU
        for _ in range(4):  # 4 Y blocks
            put_block(w, q00_dc(v), pred_y)
            pred_y = q00_dc(v)
        put_block(w, q00_dc(128), 0)  # Cb
        put_block(w, q00_dc(128), 0)  # Cr
        w.flush()
        payload += w.out
        if mi + 1 < len(luma_vals):
            payload += bytes([0xFF, 0xD0 + mi])  # RSTn between MCUs

    def seg(marker, body):
        return _struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    qz = [0] * 64
    from arcane_framework_spark.operators.jpeg import QUANT_LUMA

    for i in range(64):
        qz[i] = QUANT_LUMA[ZIGZAG[i]]
    jpg = bytearray(b"\xff\xd8")
    jpg += seg(0xDB, bytes([0]) + bytes(qz))
    sof = _struct.pack(">BHHB", 8, 16, 32, 3)
    sof += bytes([1, 0x22, 0])  # Y: 2x2 sampling
    sof += bytes([2, 0x11, 0])  # Cb (shares the luma quant table here)
    sof += bytes([3, 0x11, 0])  # Cr
    jpg += seg(0xC0, sof)
    jpg += seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    jpg += seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    jpg += seg(0xDD, _struct.pack(">H", 1))  # DRI: restart every MCU
    jpg += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    jpg += payload
    jpg += b"\xff\xd9"

    out = decode_jpeg(bytes(jpg))
    assert out.shape == (16, 32, 3)
    # chroma 128 -> RGB == luma in every channel; left MCU 120, right 200
    assert np.all(out[:, :16, :] == 120), out[:, :16, 0]
    assert np.all(out[:, 16:, :] == 200), out[:, 16:, 0]


def test_image_decode_features_distributed(spark):
    """The catalog path end-to-end: ids -> synthetic binary assets ->
    real decode features, all Arrow-batched, exact expected values."""
    from arcane_framework_spark.operators.multimodal import (
        image_decode_features,
        synth_image_assets,
    )

    ids = spark.createDataFrame([(0,), (1,), (2,), (257,)], "doc_id: long")
    rows = {
        r.doc_id: r
        for r in image_decode_features(synth_image_assets(ids)).collect()
    }
    assert rows[0].fmt == "bmp" and rows[1].fmt == "ppm"
    assert rows[2].fmt == "png" and rows[257].fmt == "png"  # 257 % 3 == 2
    for i in (0, 1, 2, 257):
        w, h, seed = 8 + i % 5, 8 + i % 3, i % 256
        assert (rows[i].width, rows[i].height) == (w, h)
        assert rows[i].first_pixel == seed
        exp = sum(
            (seed + r * 7 + c * 3 + ch) % 256
            for r in range(h) for c in range(w) for ch in range(3)
        ) / (w * h * 3)
        import math

        assert rows[i].pixel_mean == math.floor(exp * 1e4 + 0.5) / 1e4


def test_extract_features_decodes_real_bmp(spark):
    """An asset row carrying a real BMP reports header dimensions and the
    true pixel mean; non-BMP rows keep byte-derived dims and null mean."""
    from arcane_framework_spark.operators.multimodal import extract_features

    bmp = _make_bmp([[(10, 20, 30), (40, 50, 60)]])  # 2x1, mean = 35.0
    assets = spark.createDataFrame(
        [(1, bytearray(bmp), "image/bmp"),
         (2, bytearray(b"plain text"), "text/plain")],
        "doc_id: long, content: binary, mime: string",
    )
    by_id = {r.doc_id: r for r in extract_features(assets).collect()}
    assert (by_id[1].width, by_id[1].height) == (2, 1)
    assert by_id[1].pixel_mean == 35.0
    assert by_id[2].pixel_mean is None
    assert by_id[2].width == len(b"plain text") % 640 + 16


def test_bpe_token_count(spark):
    from arcane_framework_spark.operators.text import bpe_token_count_expr

    df = spark.createDataFrame(
        [(1, "don't stop-me now!"), (2, ""), (3, "abc_def 42")],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: r.n for r in
           df.select("doc_id", bpe_token_count_expr("text").alias("n")).collect()}
    # don ' t stop - me now !  -> 8 ; "" -> 0 ; abc_def 42 -> 2
    assert got == {1: 8, 2: 0, 3: 2}


def test_apply_changes_to_snapshot_upsert_delete(spark):
    from arcane_framework_spark.operators.relational import (
        apply_changes_to_snapshot,
    )

    snapshot = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k: long, v: string"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 10, "U"),   # update
            (3, None, 11, "D"),   # delete
            (4, "d", 12, "I"),    # insert
        ],
        "k: long, v: string, sys_change_version: long, sys_change_operation: string",
    )
    merged = apply_changes_to_snapshot(snapshot, changes, merge_key="k")
    got = {r.k: r.v for r in merged.collect()}
    assert got == {1: "a", 2: "b2", 4: "d"}


def test_upsert_parquet_snapshot_roundtrip(spark, tmp_path):
    from arcane_framework_spark.operators.relational import (
        upsert_parquet_snapshot,
    )

    path = str(tmp_path / "state")
    batch1 = spark.createDataFrame(
        [(1, "a", 1, "I"), (2, "b", 1, "I")],
        "k: long, v: string, sys_change_version: long, sys_change_operation: string",
    )
    got1 = upsert_parquet_snapshot(spark, path, batch1, merge_key="k")
    assert {r.k: r.v for r in got1.collect()} == {1: "a", 2: "b"}
    batch2 = spark.createDataFrame(
        [(1, None, 2, "D"), (3, "c", 2, "I")],
        "k: long, v: string, sys_change_version: long, sys_change_operation: string",
    )
    got2 = upsert_parquet_snapshot(spark, path, batch2, merge_key="k")
    assert {r.k: r.v for r in got2.collect()} == {2: "b", 3: "c"}
    # re-applying the same batch is idempotent (at-least-once absorption)
    got3 = upsert_parquet_snapshot(spark, path, batch2, merge_key="k")
    assert {r.k: r.v for r in got3.collect()} == {2: "b", 3: "c"}


def test_salted_join_matches_plain_join(spark):
    from arcane_framework_spark.operators.scale import salted_join

    # skewed fact: key 1 dominates
    fact = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 1000), (3, 2000)], "k: long, x: long"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "warm"), (4, "unused")],
                                "k: long, label: string")
    got = salted_join(fact, dim, on="k", num_salts=8)
    plain = fact.join(dim, on="k")
    assert got.count() == plain.count() == 501
    assert got.columns == plain.columns
    agg = {r.label: r.n for r in
           got.groupBy("label").agg(__import__("pyspark").sql.functions
                                    .count("*").alias("n")).collect()}
    assert agg == {"hot": 500, "warm": 1}


def test_auto_salted_join_spreads_only_hot_keys(spark):
    """The skew_report→salting bridge: a 90%-one-key join matches the
    plain join exactly, the hot key's output is spread across multiple
    shuffle partitions (no single straggler reducer), and cold keys are
    NOT replicated on the small side."""
    from arcane_framework_spark.operators.scale import auto_salted_join

    # 90% of the fact table is key 1; keys 2..11 share the rest.
    rows = [(1, i) for i in range(900)] + [
        (2 + i % 10, 1000 + i) for i in range(100)
    ]
    fact = spark.createDataFrame(rows, "k: long, x: long")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(1, 13)], "k: long, label: string"
    )
    got = auto_salted_join(fact, dim, on="k", num_salts=8)
    plain = fact.join(dim, on="k")
    assert got.columns == plain.columns
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # The hot key's 900 output rows land on multiple shuffle partitions —
    # the straggler reducer is gone. Observing the raw reducer layout
    # needs the toy-scale maskers off: AQE would re-coalesce these few KB
    # into one partition and the tiny dim would broadcast (no shuffle at
    # all); at 100 TB neither applies to the hot key's partition.
    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        hot_parts = (
            auto_salted_join(fact, dim, on="k", num_salts=8)
            .filter(F.col("k") == 1)
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert hot_parts > 1, hot_parts
    # left join: unmatched fact rows survive with null labels, no dupes
    left = auto_salted_join(
        fact, dim.filter(F.col("k") != 3), on="k", num_salts=8, how="left"
    )
    assert left.count() == 1000
    assert left.filter(F.col("label").isNull()).count() == 10  # key 3 rows


def test_salted_joins_reject_replication_unsafe_how(spark):
    """Right/full-outer joins would emit num_salts duplicate
    null-extended rows per unmatched replicated small-side row — both
    salted joins must refuse them up front, and keep accepting the
    replication-safe types."""
    import pytest as _pytest

    from arcane_framework_spark.operators.scale import (
        auto_salted_join,
        salted_join,
    )

    fact = spark.createDataFrame([(1, 10), (2, 20)], "k: long, x: long")
    dim = spark.createDataFrame([(1, "a"), (3, "c")], "k: long, label: string")
    for bad in ("right", "full", "full_outer", "rightouter", "outer"):
        with _pytest.raises(ValueError, match="salted joins support only"):
            salted_join(fact, dim, on="k", how=bad)
        with _pytest.raises(ValueError, match="salted joins support only"):
            auto_salted_join(fact, dim, on="k", how=bad)
    # replication-safe types still work (left_semi: only matched fact keys)
    semi = salted_join(fact, dim, on="k", how="left_semi")
    assert [r.k for r in semi.collect()] == [1]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from arcane_framework_spark.operators.scale import (
        bucketed_join,
        write_bucketed,
    )

    o = spark.createDataFrame([(i, f"o{i}") for i in range(100)],
                              "k: long, ov: string")
    li = spark.createDataFrame([(i % 100, f"l{i}") for i in range(300)],
                               "k: long, lv: string")
    write_bucketed(o, "t_orders_b", ["k"], num_buckets=4, sort_cols=["k"])
    write_bucketed(li, "t_lineitem_b", ["k"], num_buckets=4, sort_cols=["k"])
    joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", on=["k"])
    assert joined.count() == 300
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # bucket-aligned join: no shuffle exchange anywhere in the plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_resize_and_frame_sample_plumbing(spark):
    import hashlib as _hashlib

    from arcane_framework_spark.operators.multimodal import (
        documents_as_assets,
        resize_assets,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, "x" * 100), (2, "abc")], "doc_id: long, text: string"
    )
    assets = documents_as_assets(df)
    resized = resize_assets(assets, 224, 224).collect()
    by_id = {r.doc_id: r for r in resized}
    assert by_id[1].width == by_id[1].height == 224
    assert bytes(by_id[1].content) == b"x" * 100  # stub passthrough

    frames = sample_frames(assets, every_n_bytes=64, max_frames=8).collect()
    f1 = sorted((r.frame_index, r.frame_sha256) for r in frames
                if r.doc_id == 1)
    # 100 bytes / 64 -> frames 0 (bytes 0..63) and 1 (bytes 64..99)
    assert [i for i, _ in f1] == [0, 1]
    assert f1[0][1] == _hashlib.sha256(b"x" * 64).hexdigest()
    assert f1[1][1] == _hashlib.sha256(b"x" * 36).hexdigest()


def test_kmeans_separates_obvious_clusters(spark):
    from arcane_framework_spark.operators.similarity import ivf_assign, kmeans_fit

    rows = [(i, [10.0 + (i % 3) * 0.1, 0.1, 0.0]) for i in range(0, 8)] + [
        (i, [0.1, 10.0 + (i % 3) * 0.1, 0.0]) for i in range(8, 16)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    centroids = kmeans_fit(df, k=2, iterations=3, init_stride=8)
    got = centroids.collect()
    assert len(got) == 2
    assigned = ivf_assign(df, centroids)
    clusters = {
        r.cid: r.n
    for r in assigned.groupBy("cid").agg(
            __import__("pyspark").sql.functions.count("*").alias("n")
        ).collect()
    }
    assert sorted(clusters.values()) == [8, 8]


def test_simhash_neardup_pairs_doubled_text_hamming_zero(spark):
    from arcane_framework_spark.operators.dedup import simhash_neardup_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta " * 2),  # doubled -> same sig
        (3, "totally different words here entirely unlike"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {(r.id_a, r.id_b): r.hamming
           for r in simhash_neardup_pairs(df).collect()}
    assert got.get((1, 2)) == 0
    assert (1, 3) not in got and (2, 3) not in got


def test_join_degrades_to_sort_merge_without_broadcast(spark):
    """With broadcast disabled (the shape a 100 TB join takes when both
    sides are large), the same declarative plan must degrade to a shuffle
    join — no plan rewrite needed, Catalyst picks the strategy."""
    import pyspark.sql.functions as F

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 1000).select(F.col("id").alias("k"),
                                        (F.col("id") * 2).alias("x"))
        b = spark.range(0, 1000).select(F.col("id").alias("k"),
                                        (F.col("id") * 3).alias("y"))
        joined = a.join(b, "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "BroadcastHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

def test_cache_scope_releases_operator_persists(spark):
    """Operators persist intermediates; a cache_scope must release them all
    after the consuming action so long-lived sessions stay flat."""
    from arcane_framework_spark.operators.cache import cache_scope
    from arcane_framework_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i}") for i in range(30)],
        "doc_id: long, text: string",
    )

    def cached_rdd_count():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    before = cached_rdd_count()
    with cache_scope() as tracked:
        minhash_lsh_pairs(docs).count()
        assert tracked, "operator persists were not registered in the scope"
        assert cached_rdd_count() > before
    assert cached_rdd_count() == before

    # outside a scope, persist behaves as before (caller owns cleanup)
    pairs = minhash_lsh_pairs(docs)
    pairs.count()
    assert cached_rdd_count() > before
    spark.catalog.clearCache()

def test_connected_components_and_clusters(spark):
    """Min-label propagation: chain, triangle, and isolated pair resolve to
    min-id components; dedup_clusters marks canonicals and sizes."""
    from arcane_framework_spark.operators.graph import (
        connected_components,
        dedup_clusters,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain -> component 1
         (10, 11), (11, 12), (10, 12),  # triangle -> component 10
         (20, 21)],                   # pair -> component 20
        "id_a: long, id_b: long",
    )
    comp = {r.node: r.component
            for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1,
                    10: 10, 11: 10, 12: 10,
                    20: 20, 21: 20}

    rows = dedup_clusters(edges).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert by_doc[4].cluster_id == 1 and by_doc[4].cluster_size == 4
    assert by_doc[1].is_canonical and not by_doc[2].is_canonical
    assert by_doc[21].cluster_size == 2

def test_asof_join_backward_inclusive(spark):
    """Backward as-of join: latest right row at-or-before each left ts per
    key; NULL when none precedes; ties are inclusive."""
    from datetime import datetime as dt

    from arcane_framework_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, dt(2024, 1, 10), "p1"), (1, dt(2024, 1, 20), "p2"),
         (2, dt(2024, 1, 5), "p3")],
        "user_id: long, ts: timestamp, pid: string",
    )
    right = spark.createDataFrame(
        [(1, dt(2024, 1, 8), "c1"), (1, dt(2024, 1, 15), "c2"),
         (1, dt(2024, 1, 20), "c3"),   # exact tie with p2 -> inclusive
         (2, dt(2024, 1, 7), "c4")],   # after p3 -> p3 unattributed
        "user_id: long, ts: timestamp, cid: string",
    )
    got = {
        r.pid: (r.cid_right, r.ts_right)
        for r in asof_join(left, right, on="user_id",
                           right_payload=["cid"], suffix="_right").collect()
    }
    assert got["p1"][0] == "c1"
    assert got["p2"][0] == "c3" and got["p2"][1] == dt(2024, 1, 20)
    assert got["p3"] == (None, None)

def test_pack_documents_budget_semantics(spark):
    """Cumsum bucketing: packs fill to >= budget (except the last), docs
    longer than the budget own their packs, assignment is deterministic."""
    from arcane_framework_spark.operators.packing import (
        pack_documents,
        pack_stats,
    )

    docs = spark.createDataFrame(
        [(i, 100) for i in range(10)] + [(100, 1000)],  # one giant doc
        "doc_id: long, n_tokens: long",
    )
    packed = pack_documents(docs, budget=250, num_groups=4)
    rows = {r.doc_id: r for r in packed.collect()}
    # replay the contract exactly: effective order is (id % 4, id);
    # fill_before = tokens before the doc in that order; pack = fill // 250
    sizes = {i: 100 for i in range(10)}
    sizes[100] = 1000
    order = sorted(sizes, key=lambda d: (d % 4, d))
    fill = 0
    for d in order:
        assert rows[d].fill_before == fill
        assert rows[d].pack_id == fill // 250
        fill += sizes[d]
    assert fill == 2000
    stats = {r.pack_id: r for r in pack_stats(packed, 250).collect()}
    assert sum(r.n_docs for r in stats.values()) == 11
    assert sum(r.pack_tokens for r in stats.values()) == 2000
    # deterministic: re-running yields identical assignment
    again = {r.doc_id: r.pack_id for r in
             pack_documents(docs, budget=250, num_groups=4).collect()}
    assert again == {d: r.pack_id for d, r in rows.items()}

def test_quantize_dequantize_roundtrip(spark):
    """int8 quantization: codes in [-128,127], dequantized values within a
    half-step of the original, constant dims survive."""
    from pyspark.sql import functions as F

    from arcane_framework_spark.operators.scale import with_broadcast_scalar
    from arcane_framework_spark.operators.similarity import (
        dequantize_expr,
        dimension_stats,
        quantize_expr,
    )

    df = spark.createDataFrame(
        [(i, [float(i), -1.0 + i * 0.5, 7.0]) for i in range(5)],
        "vec_id: long, embedding: array<double>",
    )
    stats = dimension_stats(df)
    out = with_broadcast_scalar(df, stats).select(
        "vec_id",
        "embedding",
        quantize_expr(F.col("embedding"), F.col("mins"), F.col("maxs")).alias("q"),
        dequantize_expr(
            quantize_expr(F.col("embedding"), F.col("mins"), F.col("maxs")),
            F.col("mins"), F.col("maxs"),
        ).alias("deq"),
    ).collect()
    for r in out:
        assert all(-128 <= q <= 127 for q in r.q)
        # constant third dim: code 0, exact reconstruction
        assert r.q[2] == 0 and r.deq[2] == 7.0
        for orig, deq, step in zip(r.embedding, r.deq, [4 / 255, 2 / 255, 0.0]):
            assert abs(orig - deq) <= step / 2 + 1e-12

def test_hash_split_deterministic_and_partition_invariant(spark):
    """Hash splits: stable across runs and repartitionings, fractions
    roughly honored, salt changes the assignment."""
    from arcane_framework_spark.operators.sampling import with_split

    df = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id: long"
    )
    a = {r.doc_id: r.split for r in with_split(df, ["doc_id"]).collect()}
    b = {r.doc_id: r.split
         for r in with_split(df.repartition(7), ["doc_id"]).collect()}
    assert a == b
    from collections import Counter

    counts = Counter(a.values())
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert 0.06 < counts["val"] / 2000 < 0.14
    resalted = {r.doc_id: r.split
                for r in with_split(df, ["doc_id"], salt="v2").collect()}
    assert resalted != a

def test_range_join_bucketed_matches_naive(spark):
    """Bucketed interval join equals the naive BETWEEN join for every
    bucket width, including intervals spanning many buckets."""
    from arcane_framework_spark.operators.rangejoin import range_join

    points = spark.createDataFrame(
        [(i, i * 10) for i in range(50)], "pid: long, ts: long"
    )
    intervals = spark.createDataFrame(
        [(100, 5, 25), (200, 240, 490), (300, 480, 485), (400, 600, 700)],
        "iid: long, s: long, e: long",
    )
    expected = {
        (p, i)
        for p in range(50)
        for i, s, e in [(100, 5, 25), (200, 240, 490), (300, 480, 485), (400, 600, 700)]
        if s <= p * 10 <= e
    }
    for width in (7, 100, 1000):
        got = {
            (r.pid, r.iid)
            for r in range_join(points, intervals, "ts", "s", "e", width).collect()
        }
        assert got == expected, f"width={width}"

def test_redaction_patterns_and_counts(spark):
    """PII scrubbing: emails/phones/IPs replaced by typed tokens, counts
    recorded, clean text untouched."""
    from arcane_framework_spark.operators.text import with_redaction

    df = spark.createDataFrame(
        [
            (1, "reach a.b-c_d@sub.domain.org and x@y.io today"),
            (2, "call +44 123 456 7890 or office +1 (555) 123-4567"),
            (3, "server at 10.0.0.1 and 192.168.255.17"),
            (4, "no pii here at all"),
        ],
        "id: int, text: string",
    )
    rows = {r.id: r for r in with_redaction(df).collect()}
    assert rows[1].n_email == 2 and "<EMAIL>" in rows[1].redacted
    assert "@" not in rows[1].redacted
    assert rows[2].n_phone == 2 and rows[2].redacted.count("<PHONE>") == 2
    assert rows[3].n_ipv4 == 2 and "<IP>" in rows[3].redacted
    assert rows[4].redacted == "no pii here at all"
    assert (rows[4].n_email, rows[4].n_phone, rows[4].n_ipv4) == (0, 0, 0)

def test_resize_assets_plumbing(spark):
    """Resize stub: payload passes through, declared dims change, schema
    stable — the contract a real resampler plugs into."""
    from arcane_framework_spark.operators.multimodal import (
        documents_as_assets,
        resize_assets,
    )

    docs = spark.createDataFrame(
        [(1, "some text payload"), (2, "x")], "doc_id: long, text: string"
    )
    out = resize_assets(documents_as_assets(docs), width=224, height=224)
    rows = {r.doc_id: r for r in out.collect()}
    assert out.columns == ["doc_id", "content", "width", "height"]
    assert bytes(rows[1].content) == b"some text payload"
    assert rows[1].width == 224 and rows[2].height == 224


def test_asof_join_matches_naive_on_random_data(spark):
    """Property: the union-tag as-of join equals the brute-force
    latest-right-at-or-before computation on randomized inputs."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        left = [(rng.randrange(5), rng.randrange(100), f"L{i}")
                for i in range(40)]
        right = [(rng.randrange(5), rng.randrange(100), f"R{i}")
                 for i in range(40)]
        ldf = spark.createDataFrame(left, "k: long, ts: long, lid: string")
        rdf = spark.createDataFrame(right, "k: long, ts: long, rid: string")

        from arcane_framework_spark.operators.temporal import asof_join

        got = {
            r.lid: r.rid_right
            for r in asof_join(ldf, rdf, on="k",
                               right_payload=["rid"]).collect()
        }
        for k, lts, lid in left:
            cands = [(rts, rid) for rk, rts, rid in right
                     if rk == k and rts <= lts]
            # tie-break on equal right ts: the window orders by (ts, tag)
            # only, so among same-ts right rows the carried one is the
            # last in sort order — compare by ts only.
            want_ts = max((rts for rts, _ in cands), default=None)
            if want_ts is None:
                assert got[lid] is None, (trial, lid)
            else:
                got_rows = [rid for rts, rid in cands if rts == want_ts]
                assert got[lid] in got_rows, (trial, lid, got[lid])


def test_window_funnel_levels(spark):
    """Deepest ordered step within the window; out-of-order or late steps
    don't count."""
    from arcane_framework_spark.operators.temporal import window_funnel

    W = 100
    rows = [
        # u1 completes all three in order within the window
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: click before the first view -> level 1
        (2, "click", 5), (2, "view", 10),
        # u3: purchase after the deadline -> level 2
        (3, "view", 0), (3, "click", 50), (3, "purchase", 150),
        # u4 never views -> absent
        (4, "click", 10), (4, "purchase", 20),
        # u5: purchase before the click -> level 2 (order matters)
        (5, "view", 0), (5, "purchase", 10), (5, "click", 20),
    ]
    ev = spark.createDataFrame(rows, "user_id: long, event_type: string, ts_us: long")
    got = {
        r.user_id: r.level
        for r in window_funnel(ev, ["view", "click", "purchase"], W).collect()
    }
    assert got == {1: 3, 2: 1, 3: 2, 5: 2}


def test_retention_cohorts_counts(spark):
    from datetime import date

    from arcane_framework_spark.operators.temporal import retention_cohorts

    rows = [
        (1, date(2024, 1, 1)), (1, date(2024, 1, 3)), (1, date(2024, 1, 9)),
        (2, date(2024, 1, 1)), (2, date(2024, 1, 20)),
        (3, date(2024, 1, 2)),
    ]
    ev = spark.createDataFrame(rows, "user_id: long, event_date: date")
    got = {
        (str(r.cohort_date), r.week_offset): r.n_users
        for r in retention_cohorts(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,   # u1 (d0, d2), u2 (d0)
        ("2024-01-01", 1): 1,   # u1 on day 8
        ("2024-01-01", 2): 1,   # u2 on day 19
        ("2024-01-02", 0): 1,   # u3
    }


def test_bm25_ranks_matching_docs_first(spark):
    from arcane_framework_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "hash join hash join hash"),
            (2, "hash only once in a longer document about other things"),
            (3, "nothing relevant here at all"),
        ],
        "doc_id: long, text: string",
    )
    out = bm25_topk(spark, docs, queries={1: ["hash", "join"]}, k=3).collect()
    ranked = sorted(out, key=lambda r: r.rank)
    assert [r.doc_id for r in ranked] == [1, 2]  # doc 3 scores nothing
    assert ranked[0].score > ranked[1].score > 0
    assert all(r.query_id == 1 for r in ranked)


def test_quality_rules_flags(spark):
    from pyspark.sql import functions as F

    from arcane_framework_spark.operators.text import (
        QUALITY_MIN_TOKENS,
        _with_token_barrier,
        quality_rules_exprs,
    )

    long_ok = "the cat sat on a mat " * 5          # 30 tokens, stopwords, short words
    too_short = "just three tokens"
    long_words = " ".join(["extraordinarily"] * 20)  # mean word length >> 4.6
    df = _with_token_barrier(
        spark.createDataFrame(
            [(1, long_ok), (2, too_short), (3, long_words)],
            "doc_id: long, text: string",
        ),
        "text",
    )
    rules = quality_rules_exprs(F.col("__toks"), "text")
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *[e.alias(n) for n, e in rules.items()]
        ).collect()
    }
    assert rows[1].pass_len and rows[1].pass_wordlen and rows[1].pass_stop
    assert not rows[2].pass_len
    assert QUALITY_MIN_TOKENS <= 20 and not rows[3].pass_wordlen
    assert not rows[3].pass_stop


def test_partitioned_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    """Dynamic-partition-overwrite upsert: untouched partition files keep
    their identity, updated partitions fold, fully-deleted partitions are
    dropped from disk."""
    import glob
    import os
    import time as _time

    from arcane_framework_spark.operators.relational import (
        upsert_partitioned_snapshot,
    )

    path = str(tmp_path / "snap")
    schema = ("ARCANE_MERGE_KEY: string, part: string, "
              "SYS_CHANGE_VERSION: long, SYS_CHANGE_OPERATION: string, "
              "val: long")
    b1 = spark.createDataFrame(
        [("k1", "A", 1, "I", 10), ("k2", "A", 1, "I", 20),
         ("k3", "B", 1, "I", 30), ("k4", "C", 1, "I", 40)],
        schema,
    )
    upsert_partitioned_snapshot(spark, path, b1, "part")
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/part=B/*.parquet")
    }
    assert before, "partitioned layout expected"
    _time.sleep(1.1)

    # update k1 (partition A), delete every row of partition C
    b2 = spark.createDataFrame(
        [("k1", "A", 2, "U", 11), ("k4", "C", 2, "D", 40)], schema
    )
    out = upsert_partitioned_snapshot(spark, path, b2, "part")
    rows = {r.ARCANE_MERGE_KEY: r for r in out.collect()}
    assert rows["k1"].val == 11 and rows["k2"].val == 20
    assert rows["k3"].val == 30 and "k4" not in rows

    # B untouched: same files, same mtimes (never read, never rewritten)
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/part=B/*.parquet")
    }
    assert after == before
    # C dropped entirely
    assert not os.path.isdir(f"{path}/part=C")


def test_partitioned_upsert_crash_mid_rewrite_loses_nothing(spark, tmp_path):
    """Atomicity under a mid-write failure: a batch whose write job dies
    after some tasks succeed must leave the ORIGINAL snapshot fully
    intact (dynamic partition overwrite only swaps directories at job
    commit), and retrying the same batch converges to the correct
    state — the delta-less stand-in for a real MERGE's transactionality."""
    import glob
    import os

    import pytest as _pytest

    from arcane_framework_spark.operators.relational import (
        upsert_partitioned_snapshot,
    )

    path = str(tmp_path / "snap")
    schema = ("ARCANE_MERGE_KEY: string, part: string, "
              "SYS_CHANGE_VERSION: long, SYS_CHANGE_OPERATION: string, "
              "val: long")
    b1 = spark.createDataFrame(
        [("k1", "A", 1, "I", 10), ("k2", "B", 1, "I", 20),
         ("k3", "C", 1, "I", 30)],
        schema,
    )
    upsert_partitioned_snapshot(spark, path, b1, "part")
    baseline = {
        f: os.path.getmtime(f) for f in glob.glob(f"{path}/part=*/*.parquet")
    }
    assert len(baseline) >= 3

    # poison ONE partition's rows: tasks for A succeed and stage output,
    # the C task dies -> the job aborts before the overwrite commits
    @F.udf("long")
    def boom(v):
        if v == 31:
            raise ValueError("injected mid-write crash")
        return v

    b2 = spark.createDataFrame(
        [("k1", "A", 2, "U", 11), ("k3", "C", 2, "U", 31)], schema
    )
    with _pytest.raises(Exception, match="injected mid-write crash"):
        upsert_partitioned_snapshot(
            spark, path, b2.withColumn("val", boom("val")), "part"
        )

    # every original file still present, byte-identical mtimes; data reads
    after = {
        f: os.path.getmtime(f) for f in glob.glob(f"{path}/part=*/*.parquet")
    }
    assert after == baseline
    rows = {r.ARCANE_MERGE_KEY: r.val for r in spark.read.parquet(path).collect()}
    assert rows == {"k1": 10, "k2": 20, "k3": 30}

    # retrying the same (un-poisoned) batch converges
    out = upsert_partitioned_snapshot(spark, path, b2, "part")
    rows = {r.ARCANE_MERGE_KEY: r.val for r in out.collect()}
    assert rows == {"k1": 11, "k2": 20, "k3": 31}


def test_contamination_pairs_finds_planted_overlap(spark):
    """Decontam: a corpus doc repeating an eval doc's text verbatim is
    flagged; unrelated docs and self-matches are not."""
    from arcane_framework_spark.operators.decontam import contamination_pairs

    eval_text = "a b c d e f g h i j"        # 10 tokens -> 3 distinct 8-grams
    other = "one two three four five six seven eight nine ten"
    corpus = spark.createDataFrame(
        [(1, eval_text),                      # verbatim contamination
         (2, "x y " + eval_text),             # shifted copy still shares grams
         (3, other),                          # unrelated
         (100, eval_text)],                   # same id as eval -> self, skip
        "doc_id: long, text: string",
    )
    evalset = spark.createDataFrame(
        [(100, eval_text)], "doc_id: long, text: string"
    )
    got = {(r.doc_id, r.eval_id): r.n_shared
           for r in contamination_pairs(corpus, evalset,
                                        min_matches=2).collect()}
    assert got == {(1, 100): 3, (2, 100): 3}

    # short texts (< n tokens) yield no grams on either side
    tiny = spark.createDataFrame([(7, "a b c")], "doc_id: long, text: string")
    assert contamination_pairs(tiny, evalset).count() == 0


def test_chunk_tokens_windows_and_tail(spark):
    """Chunking: starts every `stride`, width-capped, short tail kept,
    sub-width and empty docs yield exactly one chunk."""
    from arcane_framework_spark.operators.packing import chunk_tokens

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(11))), (2, "a b"), (3, "")],
        "doc_id: long, text: string",
    )
    rows = chunk_tokens(docs, width=4, stride=3).orderBy(
        "doc_id", "chunk_id"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.n_tokens)
    assert by_doc == {1: [4, 4, 4, 2], 2: [2], 3: [1]}
    # overlap: chunk k starts at token k*stride -> consecutive chunks share
    # width - stride tokens; verify via distinct hashes (no duplicate chunks)
    hashes = [r.chunk_hash for r in rows if r.doc_id == 1]
    assert len(set(hashes)) == 4


def test_unigram_nll_hand_computed(spark):
    """Unigram NLL: micro-nat fixed point matches a by-hand model."""
    import math

    from arcane_framework_spark.operators.text import unigram_nll

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id: long, text: string"
    )
    # corpus: a:2 b:2 c:1, total 5
    lp = {t: math.floor(-1e6 * math.log(c / 5) + 0.5)
          for t, c in {"a": 2, "b": 2, "c": 1}.items()}
    rows = {r.doc_id: r for r in unigram_nll(docs).collect()}
    assert rows[1].n_tokens == 3 and rows[2].n_tokens == 2
    assert rows[1].sum_nll_micro == 2 * lp["a"] + lp["b"]
    assert rows[2].sum_nll_micro == lp["b"] + lp["c"]
    want1 = math.floor(rows[1].sum_nll_micro / 3 / 100.0 + 0.5) / 1e4
    assert rows[1].mean_nll == want1
    # rare-token doc scores strictly higher (lower quality)
    assert rows[2].mean_nll > rows[1].mean_nll


def test_mixture_sample_uniform_and_weighted(spark):
    """Mixture sampling: limiting domain kept whole, others downsampled
    near their target fraction, assignment stable under repartition."""
    from arcane_framework_spark.operators.sampling import mixture_sample

    rows = [(i, "big") for i in range(400)] + [
        (1000 + i, "small") for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, source: string")

    # uniform: small (the min) kept whole; big sampled at ~100/400
    uni = mixture_sample(docs)
    by_src = {r.source: r.n for r in
              uni.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src["small"] == 100
    assert 60 <= by_src["big"] <= 140  # ~100 expected, md5-uniform

    # weighted 3:1 toward big: T = min(400/0.75, 100/0.25) = 400
    # -> big frac = 0.75*400/400 = 0.75, small frac = 1.0
    wtd = mixture_sample(docs, weights={"big": 0.75, "small": 0.25})
    by_src_w = {r.source: r.n for r in
                wtd.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src_w["small"] == 100
    assert 250 <= by_src_w["big"] <= 350  # ~300 expected

    # deterministic: same kept set after an arbitrary repartition
    again = mixture_sample(docs.repartition(13), weights={"big": 0.75,
                                                          "small": 0.25})
    assert sorted(r.doc_id for r in wtd.collect()) == \
        sorted(r.doc_id for r in again.collect())

    # unknown domain (no weight) is dropped entirely
    extra = docs.union(spark.createDataFrame([(5000, "other")],
                                             "doc_id: long, source: string"))
    assert mixture_sample(extra, weights={"big": 0.75, "small": 0.25}).filter(
        F.col("source") == "other").count() == 0


def test_centroid_outliers_hand_computed(spark):
    """Centroid distance: exact micro-unit algebra reproduces the by-hand
    Euclidean distance; singleton groups score 0."""
    import math

    from arcane_framework_spark.operators.similarity import centroid_outliers

    vecs = spark.createDataFrame(
        [(1, [0.0, 0.0], 0), (2, [2.0, 2.0], 0), (3, [5.0, 5.0], 1)],
        "vec_id: long, embedding: array<float>, label: int",
    )
    got = {r.vec_id: r.dist for r in centroid_outliers(vecs).collect()}
    want = math.floor(math.sqrt(2) * 1e6 + 0.5) / 1e6
    assert got == {1: want, 2: want, 3: 0.0}


def test_snapshot_diff_classifies_changes(spark):
    """snapshot_diff: insert/update/delete classified; unchanged dropped;
    null-safe value comparison."""
    from arcane_framework_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "k: long, s: string, v: double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),        # unchanged
         (2, "b", 20.0),        # null -> value: update
         (4, "D", 40.0),        # string change: update
         (5, "e", 50.0)],       # insert
        "k: long, s: string, v: double",
    )
    rows = {r.k: r for r in snapshot_diff(old, new, keys=["k"]).collect()}
    assert set(rows) == {2, 3, 4, 5}
    assert rows[2].change_type == "update" and rows[2].v == 20.0
    assert rows[3].change_type == "delete" and rows[3].s == "c"
    assert rows[4].change_type == "update" and rows[4].s == "D"
    assert rows[5].change_type == "insert" and rows[5].v == 50.0


def test_repeated_spans_cross_doc_only(spark):
    """repeated_spans: counts distinct docs (an in-doc repeat is not a
    cross-doc span); below-width docs contribute nothing."""
    from arcane_framework_spark.operators.decontam import repeated_spans

    shared = "one two three four"
    docs = spark.createDataFrame(
        [(1, shared), (2, shared),
         (3, "five six " + "seven eight " * 2 + "seven eight"),  # in-doc rep
         (4, "too short")],
        "doc_id: long, text: string",
    )
    rows = repeated_spans(docs, n=4).collect()
    assert len(rows) == 1
    assert rows[0].n_docs == 2 and rows[0].example_doc == 1


def test_leakage_guarded_split_keeps_clusters_together(spark):
    """Near-dup cluster members always land in the same split; singletons
    match the plain doc-id hash split exactly."""
    from arcane_framework_spark.operators.sampling import (
        leakage_guarded_split,
        with_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 21)], "doc_id: long"
    )
    # two clusters: {1,7,13} (a chain) and {2,5}; the rest are singletons
    pairs = spark.createDataFrame(
        [(1, 7), (7, 13), (2, 5)], "id_a: long, id_b: long"
    )
    out = leakage_guarded_split(docs, pairs).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(by_id) == 20
    assert {by_id[i].split for i in (1, 7, 13)} == {by_id[1].split}
    assert {by_id[i].cluster_key for i in (1, 7, 13)} == {1}
    assert by_id[2].split == by_id[5].split and by_id[2].cluster_key == 2

    plain = {r.doc_id: r.split for r in with_split(docs, ["doc_id"]).collect()}
    for i in by_id:
        if i not in (1, 7, 13, 2, 5):
            assert by_id[i].split == plain[i]  # singleton = plain hash


def test_incremental_minhash_pairs_types_and_estimates(spark):
    """New batch vs materialized corpus signatures: finds the near-dup of a
    corpus doc (new_old), finds duplicates inside the batch (new_new), and
    never re-reads corpus text (operator takes signatures only)."""
    from arcane_framework_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different words entirely here")],
        "doc_id: long, text: string",
    )
    corpus_sigs = minhash_signatures(corpus)
    batch = spark.createDataFrame(
        [(100, base + " " + base), (101, base + " " + base),
         (102, "unrelated fresh content nothing shared")],
        "doc_id: long, text: string",
    )
    out = incremental_minhash_pairs(batch, corpus_sigs).collect()
    got = {(r.id_a, r.id_b): r for r in out}
    assert (1, 100) in got and got[(1, 100)].pair_type == "new_old"
    assert (1, 101) in got
    assert (100, 101) in got and got[(100, 101)].pair_type == "new_new"
    assert got[(100, 101)].est_jaccard == 1.0  # identical batch docs
    assert all(0.5 <= r.est_jaccard <= 1.0 for r in out)
    assert not any(102 in (a, b) for (a, b) in got)  # fresh doc pairs nothing


def test_connected_components_long_chain_converges(spark):
    """A 200-node chain has diameter 199 — plain min-label propagation
    would exhaust max_rounds=20; pointer jumping converges in O(log n)
    rounds and labels every node with the chain's minimum id."""
    from arcane_framework_spark.operators.graph import connected_components

    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a: long, id_b: long"
    )
    comp = connected_components(edges).collect()
    assert len(comp) == n
    assert {r.component for r in comp} == {0}


def test_connected_components_releases_round_caches(spark):
    """Per-round persisted intermediates are dropped as rounds complete:
    a multi-round (long-chain) run must not leave one cached dataset per
    round in the block manager."""
    from arcane_framework_spark.operators.graph import connected_components

    spark.catalog.clearCache()
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], "id_a: long, id_b: long"
    )
    labels = connected_components(edges)
    # edges+sym+seed and every round's propagated table were released;
    # what may remain are the rounds' localCheckpoint RDDs, which the
    # ContextCleaner reclaims once their references drop. Nothing
    # DataFrame-persisted (non-checkpoint) may survive.
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().values().iterator()
    leaked = []
    while it.hasNext():
        rdd = it.next()
        if not rdd.isLocallyCheckpointed():
            leaked.append(rdd.toString())
    assert not leaked, f"leaked DataFrame persists: {leaked}"
    assert {r.component for r in labels.collect()} == {0}


def test_pps_systematic_sample_properties(spark):
    """Integer PPS: exactly n picks in total, multiplicity for docs heavier
    than T/n, zero-weight docs never picked, fully deterministic."""
    from arcane_framework_spark.operators.sampling import (
        pps_systematic_sample,
    )

    rows = [(1, 100), (2, 0), (3, 1), (4, 899)]  # T = 1000
    df = spark.createDataFrame(rows, "doc_id: long, n_tokens: long")
    out = {r.doc_id: r.n_picks for r in
           pps_systematic_sample(df, n=10).collect()}
    assert sum(out.values()) == 10          # systematic: exactly n ticks
    assert 2 not in out                     # zero weight -> never picked
    assert out.get(4, 0) >= 8               # ~weight share of 899/1000
    again = {r.doc_id: r.n_picks for r in
             pps_systematic_sample(df, n=10).collect()}
    assert out == again                     # deterministic


def test_pps_degenerate_inputs_agree_across_engines(spark):
    """Zero total weight (all-zero or empty input) returns an EMPTY
    sample in BOTH engines — not Spark-null-silence vs DuckDB
    division-by-zero — and an overflowing total raises in both."""
    import duckdb
    import pytest as _pytest

    from arcane_framework_spark.operators.sampling import (
        pps_sample_sql,
        pps_systematic_sample,
    )

    # all-zero weights
    zero = spark.createDataFrame(
        [(1, 0), (2, 0)], "doc_id: long, n_tokens: long"
    )
    assert pps_systematic_sample(zero, n=5).count() == 0
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, n_tokens BIGINT)")
    con.execute("INSERT INTO t VALUES (1, 0), (2, 0)")
    sql = pps_sample_sql(5, "n_tokens", table="t")
    assert con.execute(sql).fetchall() == []

    # empty input
    assert pps_systematic_sample(zero.limit(0), n=5).count() == 0
    con.execute("DELETE FROM t")
    assert con.execute(sql).fetchall() == []

    # 2*n*T >= 2^63: both engines fail fast instead of wrapping
    big = spark.createDataFrame(
        [(1, 2**62), (2, 2**62 - 1)], "doc_id: long, n_tokens: long"
    )
    with _pytest.raises(Exception, match="overflows int64"):
        pps_systematic_sample(big, n=2).count()
    con.execute(f"INSERT INTO t VALUES (1, {2**62}), (2, {2**62 - 1})")
    with _pytest.raises(Exception, match="overflows int64"):
        con.execute(pps_sample_sql(2, "n_tokens", table="t")).fetchall()
    # n must be positive
    with _pytest.raises(ValueError):
        pps_systematic_sample(zero, n=0)


def test_select_by_budget_order_and_cutoff(spark):
    """Selection order is (score desc, id % G, id); the straddling doc is
    kept; later docs are excluded even if tiny."""
    from arcane_framework_spark.operators.packing import select_by_budget

    rows = [  # (id, score, tokens) — ids < 32, so id % G order == id order
        (1, 5, 40), (2, 9, 30), (3, 9, 50), (4, 7, 20), (5, 1, 1),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, score: long, n_tokens: long")
    out = {r.doc_id: r.fill_before for r in
           select_by_budget(df, budget=100).collect()}
    # order: 2(0) -> 3(30) -> 4(80) -> 1(100, excluded) -> 5(140, excluded)
    assert out == {2: 0, 3: 30, 4: 80}
    # budget 101 admits the straddling doc 1
    out2 = {r.doc_id for r in select_by_budget(df, budget=101).collect()}
    assert out2 == {2, 3, 4, 1}


def test_select_by_budget_hot_band_deskewed(spark):
    """A dominant score band (90% of docs share score 0) must neither
    change the deterministic result nor run as one single-task window:
    the local prefix window is partitioned by (score, id % G)."""
    from arcane_framework_spark.operators.packing import select_by_budget

    G = 4
    rows = [(i, 7, 10) for i in range(10)] + \
           [(i, 0, 10) for i in range(10, 100)]  # hot band: score 0
    df = spark.createDataFrame(rows, "doc_id: long, score: long, n_tokens: long")
    picked = select_by_budget(df, budget=300, num_groups=G)

    # reference: exact prefix order computed in plain Python
    order = sorted(rows, key=lambda r: (-r[1], r[0] % G, r[0]))
    fill, expect = 0, {}
    for doc_id, _score, toks in order:
        if fill < 300:
            expect[doc_id] = fill
        fill += toks
    got = {r.doc_id: r.fill_before for r in picked.collect()}
    assert got == expect
    assert len(got) == 30  # 300 budget / 10 tokens

    # plan shape: the data-scale window partitions by score AND group
    plan = picked._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(score" in plan and "__grp" in plan


def test_scd2_history_intervals_and_deletes(spark):
    """Every non-delete change opens an interval, the next change (update
    OR delete) closes it, and a closing delete leaves no current row."""
    from arcane_framework_spark.operators.relational import scd2_history

    rows = [
        (1, 10, "I", "a0"), (1, 20, "U", "a1"), (1, 30, "D", None),
        (2, 15, "I", "b0"), (2, 25, "U", "b1"),
    ]
    df = spark.createDataFrame(
        rows, "k int, sys_change_version long, sys_change_operation string, v string"
    )
    hist = scd2_history(df, merge_key="k").collect()
    by = {(r.k, r.valid_from): r for r in hist}
    assert set(by) == {(1, 10), (1, 20), (2, 15), (2, 25)}  # deletes dropped
    assert by[(1, 10)].valid_to == 20
    assert by[(1, 20)].valid_to == 30          # closed by the delete
    assert not by[(1, 20)].is_current          # key 1 has NO current row
    assert by[(2, 25)].valid_to is None and by[(2, 25)].is_current


def test_knn_vectorized_matches_hof_baseline(spark):
    """The Arrow/numpy GEMM path returns the same neighbors and ranks as
    the oracle-gated HOF baseline on the real embeddings table."""
    from arcane_framework_spark.operators.similarity import (
        knn_bruteforce,
        knn_bruteforce_vectorized,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = emb.filter(F.col("vec_id") < 5)
    base = {(r.query_id, r.rank): r.neighbor_id
            for r in knn_bruteforce(emb, queries, k=3).collect()}
    fast = {(r.query_id, r.rank): r.neighbor_id
            for r in knn_bruteforce_vectorized(emb, queries, k=3).collect()}
    assert base == fast


def test_knn_zero_norm_scores_zero_both_paths(spark):
    """A zero vector must score 0.0 against everything (not NaN, which
    sorts above every real cosine under desc), in BOTH the HOF baseline
    and the vectorized GEMM path."""
    from arcane_framework_spark.operators.similarity import (
        knn_bruteforce,
        knn_bruteforce_vectorized,
    )

    rows = [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]),
        (4, [0.0, 0.0]),  # degenerate
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") == 1)
    for fn in (knn_bruteforce, knn_bruteforce_vectorized):
        out = {r.rank: (r.neighbor_id, r.cosine)
               for r in fn(df, queries, k=3).collect()}
        # 2 (≈0.994) > 4 and 3 tie at 0.0, broken by neighbor_id
        assert out[1][0] == 2
        assert out[2] == (3, 0.0)
        assert out[3] == (4, 0.0)


def test_zorder_key_interleaves_bits(spark):
    from arcane_framework_spark.operators.scale import with_zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "x: long, y: long"
    )
    out = {(r.x, r.y): r.zkey for r in
           with_zorder_key(df, "x", "y").collect()}
    # morton(x, y) with x in even bits, y in odd bits
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(3, 5)] == 0b100111          # x=11, y=101 -> 1 00 1 11
    assert out[(65535, 65535)] == (1 << 32) - 1


def test_incremental_minhash_resigned_doc_uses_new_signature(spark):
    """A doc re-ingested under its existing id replaces its corpus
    signature: it no longer pairs with itself, and pairs against the
    corpus reflect the NEW text."""
    from arcane_framework_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different words entirely here")],
        "doc_id: long, text: string",
    )
    corpus_sigs = minhash_signatures(corpus)
    # doc 2 is re-ingested with text near-identical to doc 1
    batch = spark.createDataFrame(
        [(2, base + " " + base)], "doc_id: long, text: string"
    )
    out = incremental_minhash_pairs(batch, corpus_sigs).collect()
    got = {(r.id_a, r.id_b) for r in out}
    assert (1, 2) in got      # new text pairs with doc 1
    assert (2, 2) not in got  # never pairs with its own stale signature


def test_semantic_dedup_prunes_planted_neighbor(spark):
    """Two tight groups of near-identical vectors plus one isolated vector:
    within each group only the centroid-closest survives; the isolated
    vector is never pruned."""
    import math

    from arcane_framework_spark.operators.similarity import semantic_dedup

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    rows = [
        # group A: three vectors within ~2 degrees of each other
        (0, unit(0.00)),
        (1, unit(0.02)),
        (2, unit(0.04)),
        # group B: two vectors near 90 degrees
        (10, unit(math.pi / 2)),
        (11, unit(math.pi / 2 + 0.02)),
        # isolated: opposite direction, alone in its cell
        (20, unit(math.pi)),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semantic_dedup(
        df, k=3, threshold=0.95, iterations=2, init_stride=10
    ).orderBy("vec_id")
    got = {r.vec_id: r.pruned for r in out.collect()}
    assert got[20] is False
    # each multi-member cell keeps exactly one representative
    cells = {r.vec_id: r.cid for r in out.collect()}
    for cell in set(cells.values()):
        members = [v for v, c in cells.items() if c == cell]
        kept = [v for v in members if not got[v]]
        if len(members) > 1:
            assert len(kept) == 1, (cell, members, kept)
    # every vector appears exactly once
    assert sorted(cells) == [0, 1, 2, 10, 11, 20]


def test_hard_negatives_excludes_same_label(spark):
    """Hard-negative mining: the nearest SAME-label vector must never
    appear; the top negative is the most-similar other-label vector."""
    import math

    from arcane_framework_spark.operators.similarity import hard_negatives

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    rows = [
        # label 0: query at angle 0, near-twin at 0.01 (same label)
        (0, unit(0.00), 0),
        (1, unit(0.01), 0),
        # label 1: one close (0.1), one far (1.5)
        (10, unit(0.10), 1),
        (11, unit(1.50), 1),
        # label 2: medium (0.5)
        (20, unit(0.50), 2),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>, label: int")
    out = hard_negatives(
        df, df.filter(F.col("vec_id") == 0), k=2
    ).orderBy("rank").collect()
    got = [(r.neighbor_id, r.rank) for r in out]
    # same-label near-twin (id 1) excluded; closest other-label first
    assert got == [(10, 1), (20, 2)], got
    assert all(r.neighbor_label != r.query_label for r in out)


def test_hard_negatives_enforces_max_queries_in_plan(spark):
    """The small-query-side assumption is enforced, not assumed: a query
    set larger than max_queries fails fast at execution time (the
    in-plan assert_true fires), instead of silently materializing
    |C|x|Q| scored rows."""
    import pytest as _pytest

    from arcane_framework_spark.operators.similarity import hard_negatives

    df = spark.createDataFrame(
        [(i, [float(i), 1.0], i % 2) for i in range(20)],
        "vec_id: long, embedding: array<double>, label: int",
    )
    with _pytest.raises(Exception, match="max_queries"):
        hard_negatives(df, df, k=1, max_queries=5).count()
    # at or under the cap: runs and returns cross-label neighbors
    assert hard_negatives(df, df, k=1, max_queries=20).count() == 20


def test_semantic_dedup_governed_k_scales_cells_with_corpus(spark):
    """target_cell_size mode: the centroid count is derived in-plan from
    the corpus count, so a 4x corpus yields ~4x cells and the average
    cell size stays ~target at every scale. This is the 100x governance
    contract — same code, bigger data, constant per-cell work."""
    import math

    from arcane_framework_spark.operators.similarity import semantic_dedup

    def corpus(n):
        rows = [
            (i, [math.cos(i / 7.0), math.sin(i / 7.0),
                 math.cos(i / 3.0), math.sin(i / 3.0)])
            for i in range(n)
        ]
        return spark.createDataFrame(rows, ["vec_id", "embedding"])

    target = 10
    cell_counts = {}
    for n in (100, 400):
        out = semantic_dedup(
            corpus(n), k=None, threshold=0.99, iterations=1,
            target_cell_size=target,
        )
        sizes = out.groupBy("cid").count()
        stats = sizes.agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.max("count").alias("max_cell"),
        ).first()
        cell_counts[n] = stats["n_cells"]
        # every vector classified exactly once
        assert out.count() == n
        # cells bounded: no cell degenerates to a corpus-wide bucket
        assert stats["max_cell"] <= 10 * target, stats
    # 4x corpus -> cell count grew with it (within k-means imbalance)
    assert cell_counts[400] >= 2 * cell_counts[100], cell_counts
    # k/init_stride/target_cell_size misuse fails fast
    import pytest as _pytest

    with _pytest.raises(ValueError):
        semantic_dedup(corpus(10), k=3, threshold=0.9, target_cell_size=5)
    with _pytest.raises(ValueError):
        semantic_dedup(corpus(10), k=None, threshold=0.9)


def test_plan_compaction_groups_small_files(spark):
    from arcane_framework_spark.operators.maintenance import plan_compaction

    rows = [
        # partition p1: six 300-byte files -> two ~1KiB groups
        *[("p1", i, 300) for i in range(6)],
        # one already-compact file: excluded
        ("p1", 6, 5000),
        # partition p2: a single small file -> singleton group, dropped
        ("p2", 7, 100),
    ]
    files = spark.createDataFrame(rows, ["part", "file_id", "size"])
    plan = plan_compaction(
        files, target_bytes=1024, small_file_threshold=1024, num_groups=4
    )
    got = plan.collect()
    # the compact file and the singleton partition are not rewritten
    assert all(r.file_id not in (6, 7) for r in got)
    # all six small p1 files are planned, in >1-file groups
    assert sorted(r.file_id for r in got) == [0, 1, 2, 3, 4, 5]
    by_group = {}
    for r in got:
        by_group.setdefault((r.part, r.compaction_group), []).append(r)
    for (part, _), members in by_group.items():
        assert part == "p1"
        assert len(members) > 1
        assert members[0].group_files == len(members)
        assert members[0].group_bytes == sum(m.size for m in members)
    # prefix bucketing: total bytes / target bounds the group count
    assert len(by_group) == 2


def test_frequent_ngrams_finds_planted_boilerplate(spark):
    from arcane_framework_spark.operators.text import frequent_ngrams

    banner = "accept all cookies"
    rows = (
        [(i, "en", f"doc {i} body {banner} tail words") for i in range(5)]
        + [(10, "en", "one two"), (11, "de", "kurz")]  # too short for trigrams
        + [(12, "de", "alle rechte vorbehalten hier"),
           (13, "de", "alle rechte vorbehalten dort")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = frequent_ngrams(df, n=3, top_k=2, min_count=2).collect()
    top = {(r.lang, r.rank): (r.ngram, r.cnt) for r in out}
    assert top[("en", 1)] == (banner, 5)
    assert top[("de", 1)] == ("alle rechte vorbehalten", 2)
    # min_count prunes singletons: nothing with cnt < 2 survives
    assert all(r.cnt >= 2 for r in out)


def test_incremental_components_equals_full_recompute(spark):
    from arcane_framework_spark.operators.graph import (
        connected_components,
        incremental_components,
    )

    old_edges = [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)]
    new_edges = [(3, 10), (40, 41), (21, 50)]
    prior = connected_components(
        spark.createDataFrame(old_edges, ["id_a", "id_b"])
    )
    inc = incremental_components(
        prior, spark.createDataFrame(new_edges, ["id_a", "id_b"])
    )
    full = connected_components(
        spark.createDataFrame(old_edges + new_edges, ["id_a", "id_b"])
    )
    got = {r.node: r.component for r in inc.collect()}
    want = {r.node: r.component for r in full.collect()}
    assert got == want
    # untouched component {30, 31} flowed through unchanged
    assert got[30] == 30 and got[31] == 30
    # merged chain 1-2-3-10-11 collapsed to min id 1
    assert got[11] == 1
    # output composes: result is a valid min-id assignment, so a second
    # batch can be folded into it the same way
    second = incremental_components(
        inc, spark.createDataFrame([(11, 30)], ["id_a", "id_b"])
    )
    got2 = {r.node: r.component for r in second.collect()}
    assert got2[31] == 1 and got2[50] == 20


def test_incremental_components_random_graphs_match_full(spark):
    """Randomized (fixed-seed) equivalence: fold a random edge batch into
    the CC of a random base graph == CC over the union."""
    import random

    from arcane_framework_spark.operators.graph import (
        connected_components,
        incremental_components,
    )

    for seed in (7, 23):
        rng = random.Random(seed)
        base = [(rng.randrange(60), rng.randrange(60)) for _ in range(40)]
        base = [(a, b) for a, b in base if a != b]
        batch = [(rng.randrange(80), rng.randrange(80)) for _ in range(15)]
        batch = [(a, b) for a, b in batch if a != b]
        prior = connected_components(
            spark.createDataFrame(base, ["id_a", "id_b"])
        )
        inc = incremental_components(
            prior, spark.createDataFrame(batch, ["id_a", "id_b"])
        )
        full = connected_components(
            spark.createDataFrame(base + batch, ["id_a", "id_b"])
        )
        got = {r.node: r.component for r in inc.collect()}
        want = {r.node: r.component for r in full.collect()}
        assert got == want, f"seed {seed}"


def test_plan_compaction_group_size_bounds(spark):
    """Every group's bytes stay below target + one file, and all but the
    last group per partition reach the target (prefix-bucketing bound)."""
    import random

    rng = random.Random(11)
    target = 1000
    rows = [
        (f"p{i % 3}", i, rng.randrange(1, 400)) for i in range(90)
    ]
    from arcane_framework_spark.operators.maintenance import plan_compaction

    plan = plan_compaction(
        spark.createDataFrame(rows, ["part", "file_id", "size"]),
        target_bytes=target, num_groups=8,
    ).collect()
    max_size = max(s for _, _, s in rows)
    groups = {}
    for r in plan:
        groups.setdefault((r.part, r.compaction_group), r)
    for (part, gid), r in groups.items():
        assert r.group_bytes < target + max_size
        last = max(g for p, g in groups if p == part)
        if gid < last:
            # a non-final group spans at least the target once its
            # straddling file (counted into the next group) is included
            assert r.group_bytes + max_size >= target


def test_skew_report_hot_key(spark):
    from arcane_framework_spark.operators.scale import skew_report

    rows = [(1,)] * 80 + [(2,)] * 10 + [(3,)] * 5 + [(4,)] * 5
    df = spark.createDataFrame(rows, ["k"])
    out = skew_report(df, "k", top_k=2).collect()
    assert [r.k for r in out] == [1, 2]
    hot = out[0]
    assert hot.cnt == 80 and hot.share == 0.8
    # uniform share would be 25 rows/key -> skew 80/25 = 3.2
    assert hot.skew == 3.2


def test_top_fraction_per_group_exact_counts(spark):
    from arcane_framework_spark.operators.sampling import (
        top_fraction_per_group,
    )

    rows = [("a", i, i * 10) for i in range(8)] + [
        ("b", 100 + i, 5) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["src", "doc_id", "score"])
    out = top_fraction_per_group(
        df, group_col="src", score_col="score", fraction=0.5
    ).collect()
    got = sorted((r.src, r.doc_id) for r in out)
    # group a: floor(8*0.5)=4 best scores -> ids 4..7
    # group b: floor(5*0.5)=2, all tied at score 5 -> lowest (grp, id)
    a = [d for s, d in got if s == "a"]
    b = [d for s, d in got if s == "b"]
    assert a == [4, 5, 6, 7]
    assert len(b) == 2
    # deterministic under different parallelism
    out2 = top_fraction_per_group(
        df.repartition(7), group_col="src", score_col="score", fraction=0.5
    ).collect()
    assert sorted((r.src, r.doc_id) for r in out2) == got


def test_embedding_dispersion_matches_bruteforce(spark):
    """The one-pass variance identity equals the explicit all-pairs mean
    squared distance."""
    import itertools
    import random

    from arcane_framework_spark.operators.similarity import (
        embedding_dispersion,
    )

    rng = random.Random(3)
    rows = [
        (i, "g%d" % (i % 2), [round(rng.uniform(-1, 1), 3) for _ in range(4)])
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    got = {
        r.label: r.dispersion
        for r in embedding_dispersion(df, vec_col="embedding").collect()
    }
    for g in ("g0", "g1"):
        vecs = [v for _, lab, v in rows if lab == g]
        pairs = [
            sum((a - b) ** 2 for a, b in zip(x, y))
            for x, y in itertools.permutations(vecs, 2)
        ]
        want = sum(pairs) / len(pairs)
        assert abs(got[g] - want) < 1e-4, (g, got[g], want)


def test_jpeg_subsampled_color_decodes_closed_form():
    """The 4:2:0 / 4:2:2 color path: decoded RGB equals the closed-form
    expectation (block-constant exactly-invertible planes, replicated
    chroma upsample, JFIF color transform) — the same contract the
    jpeg_decode_documents oracle recomputes in SQL."""
    import numpy as np

    from arcane_framework_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_ycbcr,
    )
    from arcane_framework_spark.operators.multimodal import (
        synth_jpeg_color_bytes,
        synth_jpeg_color_planes,
    )

    for seed, w, h, sampling in [
        (3, 22, 20, (2, 2)),   # 4:2:0, 2x2 MCU grid, cropped edges
        (7, 17, 19, (2, 1)),   # 4:2:2, odd dims
        (250, 16, 16, (2, 2)),  # seed wraps mod 256
        (11, 9, 13, (2, 2)),   # single MCU, heavy crop
    ]:
        hs, vs = sampling
        img = decode_jpeg(
            synth_jpeg_color_bytes(seed, w, h, sampling)
        ).astype(np.int64)
        i = np.arange(h)[:, None]
        j = np.arange(w)[None, :]
        yv = (64 + ((2 * seed + (i // 8) * 14 + (j // 8) * 6) % 128)
              ).astype(np.float64)
        ci, cj = (i // vs) // 8, (j // hs) // 8
        cbv = (128 + 17 * (((seed + ci + cj) % 5) - 2)).astype(np.float64)
        crv = (128 + 17 * (((2 * seed + ci + 2 * cj) % 5) - 2)
               ).astype(np.float64)
        exp = np.stack(
            [
                yv + 1.402 * (crv - 128.0),
                yv - 0.344136 * (cbv - 128.0) - 0.714136 * (crv - 128.0),
                yv + 1.772 * (cbv - 128.0),
            ],
            axis=2,
        )
        exp = np.floor(exp + 0.5).astype(np.int64)
        assert (exp >= 0).all() and (exp <= 255).all(), "synthetic clipped"
        assert np.array_equal(img, exp), (seed, w, h, sampling)


def test_jpeg_scan_order_permutation_decodes_identically():
    """T.81 allows the SOS to list components in any order; the decoder
    must index planes by FRAME component, not scan position (regression:
    planes were filled by scan index and would swap/mis-size)."""
    import numpy as np

    from arcane_framework_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_ycbcr,
    )
    from arcane_framework_spark.operators.multimodal import (
        synth_jpeg_color_planes,
    )

    y, cb, cr = synth_jpeg_color_planes(5, 20, 18, (2, 2))
    base = decode_jpeg(encode_jpeg_ycbcr(y, cb, cr, sampling=(2, 2)))
    for order in [(2, 1, 0), (1, 2, 0), (2, 0, 1)]:
        permuted = decode_jpeg(
            encode_jpeg_ycbcr(y, cb, cr, sampling=(2, 2), scan_order=order)
        )
        assert np.array_equal(base, permuted), order


def test_pq_encode_and_adc_structure(spark):
    """PQ structural contract: one code per (vector, subspace), codes in
    [0, k); reconstruction quality improves with codebook size; ADC
    ranking beats chance against the exact top-k."""
    import numpy as np
    from pyspark.sql import functions as F

    from arcane_framework_spark.operators.cache import cache_scope
    from arcane_framework_spark.operators.similarity import (
        PQ_SUBSPACES,
        knn_bruteforce,
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    rng = np.random.default_rng(11)
    n, dim = 240, 64
    vecs = rng.normal(size=(n, dim)).astype(float)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    with cache_scope():
        def recon_quality(k):
            cb = pq_codebooks(df, dim=dim, k=k, iterations=1)
            codes = pq_encode(df, cb, dim=dim)
            rows = codes.groupBy("vec_id").agg(
                F.count(F.lit(1)).alias("n_sub"),
                (F.sum("pdot") / (F.max("vnorm") * F.sqrt(F.sum("pcnorm"))))
                .alias("rc"),
            ).collect()
            assert all(r["n_sub"] == PQ_SUBSPACES for r in rows)
            return sum(r["rc"] for r in rows) / len(rows), cb, codes

        rc2, _, _ = recon_quality(2)
        rc8, cb8, codes8 = recon_quality(8)
        assert rc8 > rc2, (rc8, rc2)

        code_range = codes8.agg(
            F.min("code").alias("lo"), F.max("code").alias("hi")
        ).collect()[0]
        assert code_range["lo"] >= 0

        queries = df.filter(F.col("vec_id") < 5)
        k = 10
        adc = pq_adc_topk(codes8, cb8, queries, k=k, dim=dim)
        exact = knn_bruteforce(df, queries, k=k)
        hit = (
            exact.select("query_id", "neighbor_id")
            .join(adc.select("query_id", "neighbor_id"),
                  ["query_id", "neighbor_id"])
            .count()
        )
        # chance overlap: k*k/n ~ 0.42 per query -> ~2 over 5 queries;
        # require clearly above it
        assert hit >= 5, hit
        per_q = adc.groupBy("query_id").count().collect()
        assert all(r["count"] == k for r in per_q)


def test_gif_codec_lossless_roundtrip_and_structure():
    """GIF is lossless: decode(encode(img, pal)) == pal[img] exactly,
    across palette sizes, interlace, and dictionary saturation (the
    200x200x256 case forces LZW to 4096 entries and a CLEAR reset);
    extension blocks are skipped; malformed streams raise."""
    import numpy as np
    import pytest as _pytest

    from arcane_framework_spark.operators.gif import decode_gif, encode_gif
    from arcane_framework_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(19)
    for h, w, ncol, interlace in [
        (10, 12, 4, False),
        (33, 17, 64, True),
        (200, 200, 256, False),   # LZW hits 4096 -> CLEAR reset
        (29, 31, 16, True),
        (1, 1, 4, False),
    ]:
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = rng.integers(0, ncol, (h, w), dtype=np.uint8)
        dec = decode_gif(encode_gif(img, pal, interlace=interlace))
        assert np.array_equal(dec, pal[img]), (h, w, ncol, interlace)

    # interlaced and sequential encodings of the same image decode equal
    pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
    img = rng.integers(0, 32, (23, 9), dtype=np.uint8)
    assert np.array_equal(
        decode_gif(encode_gif(img, pal, interlace=True)),
        decode_gif(encode_gif(img, pal, interlace=False)),
    )

    # a Graphics Control Extension before the image must be skipped
    data = bytearray(encode_gif(img, pal))
    img_at = data.index(0x2C, 13)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = bytes(data[:img_at]) + gce + bytes(data[img_at:])
    assert np.array_equal(decode_gif(patched), pal[img])

    # decode_image dispatches on the GIF signature
    assert decode_image(bytes(data)).shape == (23, 9, 3)

    # documented failure modes
    with _pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    with _pytest.raises(ValueError):
        decode_gif(bytes(data[:-10]))  # truncated sub-blocks
    with _pytest.raises(ValueError):
        # header + trailer, no image descriptor
        decode_gif(bytes(data[:13 + 3 * 32]) + b"\x3b")


def test_wav_spectral_features_closed_form(spark):
    """The rfft dominant bin equals the integer cycle count (zero
    leakage by construction) and rms equals the amplitude exactly;
    multi-tone sanity: a higher-amplitude fundamental wins."""
    import numpy as np

    from arcane_framework_spark.operators.multimodal import (
        decode_wav,
        synthesize_tone_wav,
        wav_spectral_features,
    )

    ids = spark.createDataFrame(
        [(i,) for i in (0, 7, 13, 250, 999)], "doc_id long"
    )
    from arcane_framework_spark.operators.multimodal import (
        documents_as_tone_assets,
    )

    rows = {
        r["doc_id"]: r
        for r in wav_spectral_features(
            documents_as_tone_assets(ids)
        ).collect()
    }
    for d in (0, 7, 13, 250, 999):
        half, cycles, amp = 1 + d % 8, 24 + d % 40, 4096 + d % 8192
        r = rows[d]
        assert r["n_samples"] == 2 * half * cycles
        assert r["dominant_bin"] == cycles, d
        assert r["rms"] == float(amp), d
        assert abs(r["dominant_freq_hz"] - 8000.0 / (2 * half)) < 1e-3

    # independent cross-check: decode one tone and verify the comb shape
    rate, _, s = decode_wav(synthesize_tone_wav(13))
    mag = np.abs(np.fft.rfft(s.astype(np.float64)))
    cycles = 24 + 13 % 40
    # odd harmonics only: even multiples of the fundamental are ~zero
    assert mag[2 * cycles] < 1e-6 * mag[cycles]
    assert mag[3 * cycles] > 0.1 * mag[cycles]


def test_bpe_train_matches_reference_algorithm(spark):
    """bpe_train vs an independent pure-python Sennrich BPE (symbol
    lists, no string-replace trick): identical merge tables, including
    the repeated-pair case (aaaa -> two merges per pass) and count
    tie-breaks."""
    from collections import Counter

    from arcane_framework_spark.operators.bpe import bpe_train
    from arcane_framework_spark.operators.cache import cache_scope

    texts = [
        "low low low lower lowest",
        "new newer newest wide wider",
        "aaaa aaa aa banana bandana",
        "low newer banana aaaa wide wide",
    ]

    def py_bpe(texts, merges):
        words = Counter()
        for t in texts:
            for w in t.lower().split():
                words[tuple(w) + ("#",)] += 1
        table = []
        for step in range(1, merges + 1):
            pairs = Counter()
            for sym, cnt in words.items():
                for a, b in zip(sym, sym[1:]):
                    pairs[(a, b)] += cnt
            if not pairs:
                break
            (l, r), c = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0])
            )
            table.append((step, l, r, l + r, c))
            new_words = Counter()
            for sym, cnt in words.items():
                out, i = [], 0
                while i < len(sym):
                    if (i + 1 < len(sym) and sym[i] == l
                            and sym[i + 1] == r):
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                new_words[tuple(out)] += cnt
            words = new_words
        return table

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    with cache_scope():
        got = [
            (r["step"], r["left_tok"], r["right_tok"], r["merged"],
             r["pair_count"])
            for r in bpe_train(df, merges=6).orderBy("step").collect()
        ]
    assert got == py_bpe(texts, 6), got


class TestEditDistancePairs:
    def test_verified_pairs_and_threshold(self, spark):
        from arcane_framework_spark.operators.dedup import edit_distance_pairs

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over the lazy dog ab"),  # +3
                (3, "the quick brown fox jumps over the lazy cat"),     # 3 subs
                (4, "a completely different document about spark plans"),
                (5, "THE  quick brown fox jumps over the lazy dog"),    # norm-equal to 1
            ],
            ["doc_id", "text"],
        )
        rows = {
            (r.id_a, r.id_b): r.edit_distance
            for r in edit_distance_pairs(docs, max_block=64).collect()
        }
        assert rows[(1, 2)] == 3
        assert rows[(1, 5)] == 0  # normalization collapses case/whitespace
        assert rows[(2, 5)] == 3
        assert rows.get((1, 3)) == 3
        assert all(b != 4 and a != 4 for a, b in rows)

    def test_max_dist_rejects(self, spark):
        from arcane_framework_spark.operators.dedup import edit_distance_pairs

        docs = spark.createDataFrame(
            [(1, "shared prefix words here alpha"),
             (2, "shared prefix words here zulu victor xray")],
            ["doc_id", "text"],
        )
        assert edit_distance_pairs(docs, max_dist=3).count() == 0
        got = edit_distance_pairs(docs, max_dist=20).collect()
        assert len(got) == 1 and got[0].edit_distance == 14


class TestEvalMetrics:
    def test_roc_auc_perfect_and_ties(self, spark):
        from arcane_framework_spark.operators.evalmetrics import roc_auc

        rows = (
            [("perfect", float(s), 1 if s >= 3 else 0) for s in (1, 2, 3, 4)]
            + [("inverse", float(s), 0 if s >= 3 else 1) for s in (1, 2, 3, 4)]
            + [("tied", 1.0, 0), ("tied", 1.0, 1), ("tied", 2.0, 0),
               ("tied", 2.0, 1)]
            + [("oneclass", 1.0, 1), ("oneclass", 2.0, 1)]
        )
        df = spark.createDataFrame(rows, "score_name: string, score: double, y: int")
        got = {r.score_name: r for r in roc_auc(df).collect()}
        assert got["perfect"].auc == 1.0
        assert got["inverse"].auc == 0.0
        assert got["tied"].auc == 0.5
        assert got["oneclass"].auc is None
        assert got["perfect"].n_pos == 2 and got["perfect"].n_neg == 2

    def test_roc_auc_known_value(self, spark):
        from arcane_framework_spark.operators.evalmetrics import roc_auc

        # scores: pos {3, 1}, neg {2, 0} -> correct pairs: (3>2),(3>0),(1>0)=3
        # of 4 -> AUC 0.75
        df = spark.createDataFrame(
            [("m", 3.0, 1), ("m", 1.0, 1), ("m", 2.0, 0), ("m", 0.0, 0)],
            "score_name: string, score: double, y: int",
        )
        assert roc_auc(df).collect()[0].auc == 0.75

    def test_calibration_bins(self, spark):
        from arcane_framework_spark.operators.evalmetrics import (
            calibration_bins,
        )

        # bin 0: p=0.05 twice, 1 positive -> frac_pos 0.5, mean 0.05, gap 0.45
        # bin 9: p=1.0 (clamped), y=1 -> gap 0.0
        df = spark.createDataFrame(
            [(0.05, 0), (0.05, 1), (1.0, 1)], "p: double, y: int"
        )
        got = {r.bin: r for r in calibration_bins(df).collect()}
        assert got[0].n == 2 and got[0].frac_pos == 0.5
        assert abs(got[0].abs_gap - 0.45) < 1e-9
        assert got[9].n == 1 and got[9].abs_gap == 0.0
        # ece = (2*0.45 + 1*0.0)/3 = 0.3
        assert abs(got[0].ece - 0.3) < 1e-9


class TestQueryLikelihood:
    def test_tf_and_length_effects(self, spark):
        from arcane_framework_spark.operators.retrieval import (
            query_likelihood_topk,
        )

        docs = spark.createDataFrame(
            [
                (1, "apple apple banana cherry"),
                (2, "apple banana cherry dates"),
                (3, "kiwi lemon mango nectarine"),
            ],
            ["doc_id", "text"],
        )
        got = query_likelihood_topk(
            spark, docs, queries={1: ["apple"]}, k=5, mu=10.0
        ).collect()
        # doc 3 has no query term -> not a candidate; doc 1 (tf=2) beats
        # doc 2 (tf=1) at equal length.
        ranked = [r.doc_id for r in sorted(got, key=lambda r: r.rank)]
        assert ranked == [1, 2]
        scores = {r.doc_id: r.score for r in got}
        assert scores[1] > scores[2]

    def test_oov_terms_dropped(self, spark):
        from arcane_framework_spark.operators.retrieval import (
            query_likelihood_topk,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "beta gamma")], ["doc_id", "text"]
        )
        got = query_likelihood_topk(
            spark, docs, queries={1: ["alpha", "zzz_oov"]}, k=5, mu=10.0
        ).collect()
        # OOV term ignored on both engines; only docs matching 'alpha'.
        assert [r.doc_id for r in got] == [1]


class TestPageRank:
    def test_path_graph_symmetry_and_exact_arithmetic(self, spark):
        from arcane_framework_spark.operators.graph import (
            PR_DAMP_DEN,
            PR_DAMP_NUM,
            PR_ITERATIONS,
            PR_SCALE,
            pagerank,
        )

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], ["id_a", "id_b"]
        )
        got = {r.doc_id: r.rank_fp for r in pagerank(pairs).collect()}

        # replicate the integer iteration exactly
        edges = {1: [2], 2: [1, 3], 3: [2]}
        deg = {k: len(v) for k, v in edges.items()}
        n = 3
        base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // (PR_DAMP_DEN * n)
        r = {k: PR_SCALE // n for k in edges}
        for _ in range(PR_ITERATIONS):
            out = {k: (r[k] * PR_DAMP_NUM) // (deg[k] * PR_DAMP_DEN)
                   for k in edges}
            r = {k: base + sum(out[s] for s in edges if k in edges[s])
                 for k in edges}
        assert got == r
        assert got[1] == got[3] and got[2] > got[1]
        assert sum(got.values()) <= PR_SCALE


class TestMadOutliers:
    def test_flags_only_extremes_and_zero_mad_groups(self, spark):
        from arcane_framework_spark.operators.drift import mad_outliers

        rows = (
            # group a: median 10, MAD 1 -> 100 is a huge outlier
            [(i, "a", float(v)) for i, v in enumerate([9, 10, 10, 11, 100])]
            # group b: constant -> MAD 0 -> nothing flagged
            + [(10 + i, "b", 5.0) for i in range(5)]
        )
        df = spark.createDataFrame(rows, "event_id: long, event_type: string, value: double")
        got = mad_outliers(df).collect()
        assert len(got) == 1
        r = got[0]
        assert r.event_type == "a" and r.value == 100.0
        # z = 0.6745 * (100-10)/1 = 60.705
        assert abs(r.z - 60.705) < 1e-6


class TestSortedNeighborhood:
    def test_adjacent_neardups_found_window_respected(self, spark):
        from arcane_framework_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        # All share the 2-char prefix block 'do'; doc 2 is a near-dup of
        # doc 1 sorted adjacently; doc 9 is unrelated content in another
        # block.
        docs = spark.createDataFrame(
            [
                (1, "document alpha beta gamma delta epsilon"),
                (2, "document alpha beta gamma delta epsilon zeta"),
                (3, "document omega psi chi phi upsilon tau"),
                (9, "zebra yak xenops wolf vulture"),
            ],
            ["doc_id", "text"],
        )
        got = {(r.id_a, r.id_b): r.jaccard
               for r in sorted_neighborhood_pairs(docs).collect()}
        assert (1, 2) in got and got[(1, 2)] >= 0.5
        assert all(9 not in p for p in got)

    def test_no_self_join_blowup_on_identical_texts(self, spark):
        from arcane_framework_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        # 6 identical docs, window=3: candidates are only the 3 forward
        # neighbors each -> 3+3+3+2+1+0 = 12 pairs, NOT C(6,2)=15 at
        # window>n, and never n^2.
        docs = spark.createDataFrame(
            [(i, "same exact text content here") for i in range(6)],
            ["doc_id", "text"],
        )
        got = sorted_neighborhood_pairs(docs).collect()
        assert len(got) == 12
        assert all(r.jaccard == 1.0 for r in got)


class TestTriangleStats:
    def test_clique_chain_and_isolated_edge(self, spark):
        from arcane_framework_spark.operators.graph import triangle_stats

        # 1-2-3 triangle (clique), 3-4 pendant, 5-6 isolated edge
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (3, 4), (5, 6)], ["id_a", "id_b"]
        )
        got = {r.doc_id: r for r in triangle_stats(pairs).collect()}
        assert got[1].triangles == 1 and got[1].clustering == 1.0
        assert got[2].triangles == 1 and got[2].clustering == 1.0
        # node 3: degree 3, 1 triangle -> 2*1/(3*2) = 0.333333
        assert got[3].degree == 3 and abs(got[3].clustering - 0.333333) < 1e-9
        assert got[4].triangles == 0 and got[4].clustering == 0.0
        assert got[5].clustering == 0.0 and got[6].degree == 1

    def test_each_triangle_counted_once(self, spark):
        from arcane_framework_spark.operators.graph import triangle_stats

        # K4: every node in C(3,2)=3 triangles, coefficient 1
        edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        got = triangle_stats(
            spark.createDataFrame(edges, ["id_a", "id_b"])
        ).collect()
        assert all(r.triangles == 3 and r.clustering == 1.0 for r in got)


class TestBigramNll:
    def test_repetitive_doc_scores_lower_than_shuffled(self, spark):
        from arcane_framework_spark.operators.text import bigram_nll

        docs = spark.createDataFrame(
            [
                (1, "the cat sat the cat sat the cat sat"),
                (2, "sat the the cat sat cat the sat cat"),
                (3, "zebra quark nimbus octave fjord"),
            ],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r for r in bigram_nll(docs).collect()}
        # identical unigram composition, but doc 1's transitions are
        # predictable -> lower bigram NLL than the shuffled doc 2
        assert got[1].mean_nll < got[2].mean_nll
        assert got[1].n_bigrams == 9 and got[2].n_bigrams == 9

    def test_backoff_keeps_probabilities_finite(self, spark):
        from arcane_framework_spark.operators.text import bigram_nll

        # every bigram in doc 2 is unseen elsewhere; unigram backoff
        # must keep every probability > 0 (finite NLL)
        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "beta alpha")], ["doc_id", "text"]
        )
        rows = bigram_nll(docs).collect()
        assert all(r.sum_nll_micro > 0 for r in rows)


class TestWinsorizedStats:
    def test_outlier_stops_moving_the_mean(self, spark):
        from arcane_framework_spark.operators.drift import winsorized_stats

        rows = [(i, "a", 10.0) for i in range(99)] + [(99, "a", 100000.0)]
        df = spark.createDataFrame(
            rows, "event_id: long, event_type: string, value: double"
        )
        got = winsorized_stats(df).collect()[0]
        assert got.n == 100 and got.n_clipped >= 1
        assert got.mean_raw > 1000.0
        assert got.mean_winsorized < got.mean_raw
        assert got.mean_winsorized < 100.0


class TestClassifierEval:
    def test_perfect_prototypes(self, spark):
        from arcane_framework_spark.operators.evalmetrics import (
            prototype_classifier_eval,
        )

        # two well-separated clusters along orthogonal axes; prototypes
        # at ids 0 and 2 (stride 2)
        rows = [
            (0, [1.0, 0.0], 1), (1, [0.9, 0.1], 1),
            (2, [0.0, 1.0], 2), (3, [0.1, 0.9], 2),
        ]
        df = spark.createDataFrame(
            rows, "vec_id: long, embedding: array<double>, label: int"
        )
        got = {r.label: r for r in
               prototype_classifier_eval(df, stride=2).collect()}
        assert got[1].precision == 1.0 and got[1].recall == 1.0
        assert got[2].f1 == 1.0

    def test_never_predicted_class_null_precision(self, spark):
        from arcane_framework_spark.operators.evalmetrics import (
            prototype_classifier_eval,
        )

        # the only prototype (id 0) is label 1, so label-2 test rows can
        # never be predicted: recall 0 for class 2, NULL precision.
        rows = [
            (0, [1.0, 0.0], 1), (1, [0.9, 0.1], 1), (3, [0.0, 1.0], 2),
        ]
        df = spark.createDataFrame(
            rows, "vec_id: long, embedding: array<double>, label: int"
        )
        got = {r.label: r for r in
               prototype_classifier_eval(df, stride=2).collect()}
        assert got[2].precision is None and got[2].recall == 0.0
        # both test rows predicted as class 1, one correctly
        assert got[1].precision == 0.5 and got[1].recall == 1.0


class TestProfileColumns:
    def test_nulls_distincts_minmax(self, spark):
        from arcane_framework_spark.operators.audit import profile_columns

        df = spark.createDataFrame(
            [(1, "a", 2.5), (2, "b", None), (2, None, 1.5)],
            "k: long, s: string, v: double",
        )
        got = {r.col_name: r for r in profile_columns(df).collect()}
        assert got["k"].n_distinct == 2 and got["k"].min_val == "1"
        assert got["s"].n_null == 1 and got["s"].max_val == "b"
        # doubles: engine-unsafe formatting -> NULL min/max, distinct kept
        assert got["v"].min_val is None and got["v"].n_distinct == 2


class TestEventTransitions:
    def test_sequence_counts_and_row_normalization(self, spark):
        from arcane_framework_spark.operators.temporal import (
            event_transitions,
        )

        rows = [
            (1, 1, 100, "view"), (2, 1, 200, "click"), (3, 1, 300, "view"),
            (4, 2, 100, "view"), (5, 2, 200, "view"),
        ]
        df = spark.createDataFrame(
            rows, "event_id: long, user_id: long, ts_micros: long, event_type: string"
        )
        got = {(r.prev_type, r.next_type): r for r in
               event_transitions(df).collect()}
        assert got[("view", "click")].cnt == 1
        assert got[("view", "view")].cnt == 1
        assert got[("click", "view")].prob == 1.0
        # row 'view' total = 2 -> probs 0.5 each
        assert got[("view", "click")].prob == 0.5

    def test_no_cross_user_transitions(self, spark):
        from arcane_framework_spark.operators.temporal import (
            event_transitions,
        )

        rows = [(1, 1, 100, "a"), (2, 2, 200, "b")]
        df = spark.createDataFrame(
            rows, "event_id: long, user_id: long, ts_micros: long, event_type: string"
        )
        assert event_transitions(df).count() == 0


class TestTwoProportionZTest:
    def test_known_value_and_degenerate_null(self, spark):
        import math

        from arcane_framework_spark.operators.evalmetrics import (
            two_proportion_ztest,
        )

        rows = [(0, 1)] * 30 + [(0, 0)] * 70 + [(1, 1)] * 50 + [(1, 0)] * 50
        df = spark.createDataFrame(rows, "cohort: int, converted: int")
        r = two_proportion_ztest(df).collect()[0]
        assert (r.n_a, r.x_a, r.n_b, r.x_b) == (100, 30, 100, 50)
        p = 0.4
        want = (0.3 - 0.5) / math.sqrt(p * (1 - p) * (0.01 + 0.01))
        assert abs(r.z - want) < 1e-5

        allconv = spark.createDataFrame(
            [(0, 1), (1, 1)], "cohort: int, converted: int"
        )
        assert two_proportion_ztest(allconv).collect()[0].z is None


class TestKaplanMeier:
    def test_risk_sets_hazard_and_extinction(self, spark):
        import math

        from arcane_framework_spark.operators.temporal import kaplan_meier

        units = spark.createDataFrame(
            [(1, 1), (2, 1), (2, 0), (3, 1)], "duration: long, event: int"
        )
        got = {r.t: r for r in kaplan_meier(units).collect()}
        assert (got[1].n_risk, got[1].d, got[1].c) == (4, 1, 0)
        assert (got[2].n_risk, got[2].d, got[2].c) == (3, 1, 1)
        s1 = math.floor(-1e6 * math.log(1 - 1 / 4) + 0.5)
        s2 = math.floor(-1e6 * math.log(1 - 1 / 3) + 0.5)
        assert got[1].cum_lp_micro == s1
        assert got[2].cum_lp_micro == s1 + s2
        # t=3: the whole remaining risk set dies -> S=0, hazard infinite
        assert got[3].n_risk == 1 and got[3].cum_lp_micro is None

    def test_censor_only_step_keeps_survival_flat(self, spark):
        from arcane_framework_spark.operators.temporal import kaplan_meier

        units = spark.createDataFrame(
            [(1, 0), (2, 1), (3, 0)], "duration: long, event: int"
        )
        got = {r.t: r for r in kaplan_meier(units).collect()}
        assert got[1].cum_lp_micro == 0  # pure censoring: no hazard
        assert got[2].n_risk == 2 and got[2].cum_lp_micro > 0
        assert got[3].cum_lp_micro == got[2].cum_lp_micro


class TestMmrTopk:
    def test_diversifies_away_from_duplicate(self, spark):
        from arcane_framework_spark.operators.similarity import mmr_topk

        # query q=[1,0]; docs 1,2 nearly identical high-relevance pair;
        # doc 3 moderately relevant but orthogonal-ish to 1/2.
        rows = [
            (100, [1.0, 0.0]),            # query
            (1, [0.9, 0.1]),              # identical pair: sim(1,2)=1
            (2, [0.9, 0.1]),
            (3, [0.8, -0.6]),             # less relevant, far from 1/2
        ]
        df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
        got = sorted(
            mmr_topk(
                df, df.filter("vec_id = 100"), k=3, pool=10
            ).collect(),
            key=lambda r: r.rank,
        )
        assert got[0].vec_id == 1          # pure relevance first
        assert got[1].vec_id == 3          # diversity beats near-dup 2
        assert got[2].vec_id == 2
        assert got[0].mmr_score == got[0].relevance

    def test_rank1_is_relevance_argmax_per_query(self, spark):
        from arcane_framework_spark.operators.similarity import mmr_topk

        rows = [(i, [float(i % 7 + 1), float((i * 3) % 5 + 1)])
                for i in range(30)]
        df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
        queries = df.filter("vec_id < 3")
        got = mmr_topk(df, queries, k=2, pool=5).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, {})[r.rank] = r
        for qid, ranks in by_q.items():
            assert set(ranks) == {1, 2}
            assert ranks[1].relevance >= ranks[2].relevance - 1.0  # sane


class TestIntervalOverlap:
    def test_overlap_semantics_and_lengths(self, spark):
        from arcane_framework_spark.operators.rangejoin import (
            interval_overlap,
        )

        left = spark.createDataFrame(
            [(1, 100, 200), (2, 250, 260), (3, 395, 405)],
            "sid: long, s_us: long, e_us: long",
        )
        right = spark.createDataFrame(
            [(150, 400)], "h_us: long, hend_us: long"
        )
        got = {r.sid: r for r in interval_overlap(left, right).collect()}
        # [100,200] ∩ [150,400) -> [150,200] = 51 micros inclusive
        assert got[1].overlap_us == 51
        # fully inside -> full length 11
        assert got[2].overlap_us == 11
        # [395,405] ∩ [150,400) -> [395,399] = 5
        assert got[3].overlap_us == 5

    def test_touching_at_open_end_excluded(self, spark):
        from arcane_framework_spark.operators.rangejoin import (
            interval_overlap,
        )

        left = spark.createDataFrame(
            [(1, 400, 500)], "sid: long, s_us: long, e_us: long"
        )
        right = spark.createDataFrame(
            [(150, 400)], "h_us: long, hend_us: long"
        )
        # session starts exactly at the half-open end -> no pair
        assert interval_overlap(left, right).count() == 0


class TestRakeKeyphrases:
    def test_phrase_split_scoring_and_type_semantics(self, spark):
        from arcane_framework_spark.operators.text import rake_keyphrases

        docs = spark.createDataFrame(
            [
                (1, "deep learning is the best approach"),
                (2, "deep learning and machine learning"),
                (3, "the approach"),
            ],
            ["doc_id", "text"],
        )
        got = {r.phrase: r for r in rake_keyphrases(docs, top_k=10).collect()}
        # stopwords split runs: 'is'/'the'/'and' never inside a phrase
        assert "deep learning" in got
        assert all("the" not in p.split() and "is" not in p.split()
                   for p in got)
        # phrases: [deep learning] x2, [best approach], [machine learning],
        # [approach]. freq(learning)=3, deg(learning)=2+2+2=6 -> ws 2.0
        # freq(deep)=2, deg=4 -> 2.0 => 'deep learning' scores 4.0
        assert abs(got["deep learning"].score - 4.0) < 1e-9
        assert got["deep learning"].n_occurrences == 2
        # type semantics: repeated phrase does NOT multiply its score
        assert abs(got["machine learning"].score - 4.0) < 1e-9

    def test_long_runs_capped(self, spark):
        from arcane_framework_spark.operators.text import rake_keyphrases

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
        )
        # single 5-word run > max phrase length 3 -> nothing emitted
        assert rake_keyphrases(docs).count() == 0


class TestPrefixFilterPairs:
    def test_exactness_vs_bruteforce(self, spark):
        """The prefix filter must lose NO pair vs brute-force shingle
        Jaccard >= 3/5 — the guarantee that distinguishes it from LSH."""
        import itertools

        from arcane_framework_spark.operators.dedup import (
            prefix_filter_pairs,
        )

        texts = {
            1: "alpha beta gamma delta epsilon zeta",
            2: "alpha beta gamma delta epsilon zeta eta",
            3: "alpha beta gamma delta epsilon zeta eta theta",
            4: "one two three four five six seven",
            5: "one two three four five six seven",
            6: "unrelated words entirely different content here now",
        }
        docs = spark.createDataFrame(
            list(texts.items()), ["doc_id", "text"]
        )

        def shingles(t):
            w = t.split()
            return set(
                " ".join(w[i:i + 3]) for i in range(len(w) - 2)
            ) if len(w) >= 3 else {t}

        want = {}
        for a, b in itertools.combinations(sorted(texts), 2):
            sa, sb = shingles(texts[a]), shingles(texts[b])
            j = len(sa & sb) / len(sa | sb)
            if j >= 3 / 5:
                want[(a, b)] = round(j, 6)
        got = {(r.id_a, r.id_b): r.jaccard
               for r in prefix_filter_pairs(docs).collect()}
        assert got == want
        assert (4, 5) in got and got[(4, 5)] == 1.0
