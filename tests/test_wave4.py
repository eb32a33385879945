"""Invariants for the wave-4 hygiene/dispersion operators
(queries_wave4.py): planted-count closed forms and decile semantics the
oracle compare cannot distinguish from a consistently-wrong pair."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_encoding_audit_planted_closed_form(spark):
    """Every 11th doc gains 1 control + 1 replacement (+2 non-ASCII)
    chars, every 19th gains 5 control chars; the base corpus is clean.
    The audit totals must equal those plant counts exactly."""
    from arcane_framework_spark.queries_wave4 import (
        encoding_audit_documents,
    )

    rows = encoding_audit_documents(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n11 = docs.filter(F.col("doc_id") % 11 == 0).count()
    n19 = docs.filter(F.col("doc_id") % 19 == 0).count()
    tot = {
        "docs_with_ctrl": sum(r["docs_with_ctrl"] for r in rows),
        "ctrl_chars": sum(r["ctrl_chars"] for r in rows),
        "docs_with_replacement": sum(
            r["docs_with_replacement"] for r in rows
        ),
        "replacement_chars": sum(r["replacement_chars"] for r in rows),
    }
    assert tot["docs_with_ctrl"] == n11 + n19
    assert tot["ctrl_chars"] == n11 + 5 * n19
    assert tot["docs_with_replacement"] == n11
    assert tot["replacement_chars"] == n11
    assert all(r["nonascii_ppm"] >= 0 for r in rows)


def test_decile_shift_semantics(spark):
    """Each (type) emits exactly deciles 1..9, boundaries are
    non-decreasing in k within each half, and each boundary is a stored
    value from that type's half."""
    from arcane_framework_spark.queries_wave4 import decile_shift_events

    rows = decile_shift_events(spark, SF_DIR).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for t, rs in by_type.items():
        ks = sorted(r["decile"] for r in rs)
        assert ks == list(range(1, 10)), t
        rs = sorted(rs, key=lambda r: r["decile"])
        for a, b in zip(rs, rs[1:]):
            assert a["early_value"] <= b["early_value"], t
            assert a["late_value"] <= b["late_value"], t
        for r in rs:
            assert r["shift"] == r["late_value"] - r["early_value"]


def test_fano_matches_bruteforce(spark):
    """Fano factor equals the population variance/mean of the hourly
    counts computed directly."""
    from arcane_framework_spark.queries_wave4 import fano_dispersion_events

    rows = fano_dispersion_events(spark, SF_DIR).collect()
    assert rows
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(
            "event_type",
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 3600000000"
            ).alias("h"),
        )
        .count()
        .collect()
    )
    for r in rows:
        ys = [x["count"] for x in ev if x["event_type"] == r["event_type"]]
        n = len(ys)
        mean = sum(ys) / n
        var = sum((y - mean) ** 2 for y in ys) / n
        assert abs(r["fano"] - var / mean) < 2e-6, r["event_type"]
        assert r["n_hours"] == n
        assert r["mean_per_hour_micro"] == (sum(ys) * 1_000_000) // n


def test_image_dhash_matches_closed_form(spark):
    """The decoded-pixel dHash equals a pure-Python recompute from the
    synthetic pixel rule, across all three container formats."""
    from arcane_framework_spark.operators.multimodal import (
        image_dhash,
        synth_dhash_assets,
    )

    ids = spark.createDataFrame(
        [(i, (3 + i * 37) % 256) for i in range(24)], "doc_id: long, seed: long"
    )
    got = {
        r["doc_id"]: (r["hash_hi"], r["hash_lo"])
        for r in image_dhash(synth_dhash_assets(ids, 18, 16)).collect()
    }
    for i in range(24):
        seed = (3 + i * 37) % 256
        cells = [[0] * 9 for _ in range(8)]
        for r in range(16):
            for c in range(18):
                for ch in range(3):
                    cells[r // 2][c // 2] += (seed + 7 * r + 3 * c + ch) % 256
        hi = lo = 0
        for r in range(8):
            for c in range(8):
                if cells[r][c] < cells[r][c + 1]:
                    if r < 4:
                        hi |= 1 << (r * 8 + c)
                    else:
                        lo |= 1 << ((r - 4) * 8 + c)
        assert got[i] == (hi, lo), i


def test_image_dhash_format_invariance(spark):
    """The same seed must hash identically regardless of container
    format (ids 0,1,2 cycle bmp/ppm/png)."""
    from arcane_framework_spark.operators.multimodal import (
        image_dhash,
        synth_dhash_assets,
    )

    ids = spark.createDataFrame(
        [(i, 42) for i in range(3)], "doc_id: long, seed: long"
    )
    rows = image_dhash(synth_dhash_assets(ids, 18, 16)).collect()
    hashes = {(r["hash_hi"], r["hash_lo"]) for r in rows}
    assert len(hashes) == 1


def test_hamilton_allocation_invariants(spark):
    """Quotas sum EXACTLY to the budget and each source gets its floor
    share or floor+1 (the largest-remainder guarantee)."""
    from arcane_framework_spark.queries_wave4 import (
        HAMILTON_BUDGET,
        allocation_hamilton_documents,
    )

    rows = allocation_hamilton_documents(spark, SF_DIR).collect()
    total_docs = sum(r["n_docs"] for r in rows)
    assert sum(r["quota"] for r in rows) == HAMILTON_BUDGET
    for r in rows:
        fl = (HAMILTON_BUDGET * r["n_docs"]) // total_docs
        assert r["quota"] in (fl, fl + 1), r["source"]


def test_did_cells_match_bruteforce(spark):
    """The four DiD cell means equal a direct pandas recompute."""
    from arcane_framework_spark.queries_wave4 import did_estimator_events

    rows = {r["event_type"]: r for r in
            did_estimator_events(spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").selectExpr(
        "event_type",
        "user_id % 2 AS treated",
        "unix_micros(cast(ts as timestamp)) AS ts_us",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
    ).collect()
    mn = min(r["ts_us"] for r in ev)
    mx = max(r["ts_us"] for r in ev)
    for et, r in rows.items():
        cells = {}
        for x in ev:
            if x["event_type"] != et:
                continue
            key = (x["treated"], 1 if x["ts_us"] * 2 > mn + mx else 0)
            n, s = cells.get(key, (0, 0))
            cells[key] = (n + 1, s + x["cents"])
        want = {
            k: round(s / n / 100.0, 6) for k, (n, s) in cells.items()
        }
        assert r["treated_pre"] == want[(1, 0)], et
        assert r["treated_post"] == want[(1, 1)], et
        assert r["control_pre"] == want[(0, 0)], et
        assert r["control_post"] == want[(0, 1)], et


def test_shard_rebalance_expectations(spark):
    """HRW must move roughly 1/33 of docs; mod-hash must move the vast
    majority — the whole point of consistent hashing."""
    from arcane_framework_spark.queries_wave4 import (
        shard_rebalance_documents,
    )

    rows = {r["strategy"]: r for r in
            shard_rebalance_documents(spark, SF_DIR).collect()}
    assert rows["mod"]["moved_ppm"] > 900_000
    assert rows["hrw"]["moved_ppm"] < 100_000
    assert rows["hrw"]["n_moved"] > 0
    assert rows["mod"]["n_docs"] == rows["hrw"]["n_docs"]


def test_youden_threshold_matches_bruteforce(spark):
    """The picked threshold attains the true max of TPR-FPR over all
    candidate thresholds, computed by brute force."""
    from arcane_framework_spark.queries_wave4 import (
        threshold_pick_embeddings,
    )

    rows = {r["score_name"]: r for r in
            threshold_pick_embeddings(spark, SF_DIR).collect()}
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").selectExpr(
        "element_at(embedding, 1) AS dim0",
        "element_at(embedding, 5) AS dim4",
        "array_max(embedding) AS maxdim",
        "CAST(label % 2 AS LONG) AS y",
    ).collect()
    for name in ("dim0", "dim4", "maxdim"):
        pts = [(float(r[name]), r["y"]) for r in emb]
        n_pos = sum(y for _, y in pts)
        n_neg = len(pts) - n_pos
        best = None
        for t in sorted({s for s, _ in pts}):
            tp = sum(y for s, y in pts if s >= t)
            fp = sum(1 - y for s, y in pts if s >= t)
            j = tp * n_neg - fp * n_pos
            if best is None or j > best[0] or (j == best[0] and t < best[1]):
                best = (j, t, tp, fp)
        r = rows[name]
        assert r["threshold"] == best[1], name
        assert (r["tp"], r["fp"]) == (best[2], best[3]), name
        assert r["fn"] == n_pos - best[2] and r["tn"] == n_neg - best[3]


def test_trend_break_invariants(spark):
    """Two segments can never fit worse than one; the breakpoint is an
    observed day; both slopes are finite."""
    from arcane_framework_spark.queries_wave4 import trend_break_events

    rows = trend_break_events(spark, SF_DIR).collect()
    assert rows
    days = {
        (r["event_type"], r["day"])
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr(
            "event_type",
            "unix_micros(cast(ts as timestamp)) div 86400000000 AS day",
        )
        .distinct()
        .collect()
    }
    for r in rows:
        assert r["sse_two_segment"] <= r["sse_single"] + 1e-6, r
        assert r["improvement_ppm"] >= 0
        assert (r["event_type"], r["break_day_us"] // 86_400_000_000) in days
        assert r["slope_left"] is not None and r["slope_right"] is not None
