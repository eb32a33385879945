"""Targeted invariants for the wave-3 analytics operators
(queries_wave3.py) beyond the catalog smoke + oracle gate: properties
the oracle compare cannot see because both engines would be wrong
together (day-of-week calendar truth, window semantics vs a brute-force
recompute, quintile mass balance)."""

import datetime

import pytest
from pyspark.sql import functions as F

from arcane_framework_spark.queries_wave3 import (
    BENFORD_MICRO,
    RFM_BUCKETS,
    RRF_DAMP,
    RRF_POOL_K,
    _DOW_LABELS,
    _quintile_map,
)

SF_DIR = "/root/testdata/sf0.001"


def test_integer_dow_matches_python_calendar():
    """(epoch_day + 4) % 7 with 0=Sunday must agree with the real
    calendar for dates spanning leap years and both epoch sides."""
    for d in (
        datetime.date(1970, 1, 1),
        datetime.date(1969, 12, 31),
        datetime.date(2000, 2, 29),
        datetime.date(2024, 2, 29),
        datetime.date(2026, 8, 15),
        datetime.date(1999, 12, 31),
    ):
        epoch_day = (d - datetime.date(1970, 1, 1)).days
        got = _DOW_LABELS[(epoch_day + 4) % 7]
        # Python: Monday=0 ... Sunday=6; our labels start at Sunday.
        want = ("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")[d.weekday()]
        assert got == want, d


def test_benford_micro_literals():
    """The micro-unit literals are round(log10(1+1/d)*1e6) and sum to
    ~1e6 (they are a probability distribution)."""
    import math

    for d, v in enumerate(BENFORD_MICRO, start=1):
        assert v == round(math.log10(1 + 1 / d) * 1_000_000)
    assert abs(sum(BENFORD_MICRO) - 1_000_000) <= 2


def test_quintile_map_mass_balance(spark):
    """Buckets are 0..4, weakly monotone in the value, and each holds
    between floor(n/5)-minus-tie-slack and the largest tie run."""
    rows = [(v,) for v in [1, 1, 1, 2, 3, 4, 5, 5, 6, 7, 8, 9, 10, 11, 12,
                           13, 14, 15, 16, 17]]
    df = spark.createDataFrame(rows, "v: long")
    levels = df.groupBy("v").agg(F.count(F.lit(1)).alias("m"))
    mp = _quintile_map(levels, "v", "b").collect()
    by_v = {r["v"]: r["b"] for r in mp}
    assert set(by_v.values()) <= set(range(RFM_BUCKETS))
    vs = sorted(by_v)
    assert all(by_v[a] <= by_v[b] for a, b in zip(vs, vs[1:]))
    # n=20: rank positions 0..19, bucket = (5*first_rank) div 20 — the
    # first value (3 ties, positions 0-2) lands in bucket 0; the last
    # value (position 19) in bucket 4.
    assert by_v[1] == 0 and by_v[17] == 4


def test_rolling_wau_matches_bruteforce(spark):
    """The fan-out sliding distinct equals the brute-force 'distinct
    users in [d-6, d]' on a corpus with gaps and repeat users."""
    from arcane_framework_spark.queries_wave3 import (
        rolling_active_users_events,
    )

    out = {
        r["day_us"] // 86_400_000_000: (r["dau"], r["wau"])
        for r in rolling_active_users_events(spark, SF_DIR).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 86400000000"
            ).alias("day"),
            "user_id",
        )
        .distinct()
        .collect()
    )
    days = sorted({r["day"] for r in ev})
    for d in days:
        dau = len({r["user_id"] for r in ev if r["day"] == d})
        wau = len({r["user_id"] for r in ev if d - 6 <= r["day"] <= d})
        assert out[d] == (dau, wau), d


def test_rrf_scores_match_recompute(spark):
    """Fused micro scores equal the rank-only recompute from the two
    underlying rankers (full-outer semantics: missing rank adds 0)."""
    from arcane_framework_spark.operators.retrieval import (
        bm25_topk,
        query_likelihood_topk,
    )
    from arcane_framework_spark.queries_eval import QL_ENTRY_MU
    from arcane_framework_spark.queries_wave3 import rrf_fusion_documents

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    ra = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in bm25_topk(spark, docs, k=RRF_POOL_K).collect()
    }
    rb = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in query_likelihood_topk(
            spark, docs, k=RRF_POOL_K, mu=QL_ENTRY_MU
        ).collect()
    }
    fused = rrf_fusion_documents(spark, SF_DIR).collect()
    assert fused, "fusion returned no rows"
    for r in fused:
        key = (r["query_id"], r["doc_id"])
        want = (1_000_000 // (RRF_DAMP + ra[key]) if key in ra else 0) + (
            1_000_000 // (RRF_DAMP + rb[key]) if key in rb else 0
        )
        assert r["rrf_micro"] == want, key
        assert (r["in_bm25"], r["in_ql"]) == (
            int(key in ra), int(key in rb)
        )


def test_spearman_bounds_and_sign(spark):
    """rho must be in [-1, 1] and strongly positive: token count is a
    near-proxy for n_chars on this corpus."""
    from arcane_framework_spark.queries_wave3 import spearman_corr_documents

    row = spearman_corr_documents(spark, SF_DIR).collect()[0]
    assert -1.0 <= row["spearman_rho"] <= 1.0
    assert row["spearman_rho"] > 0.5


def test_ols_residual_identity(spark):
    """R^2 must lie in [0, 1] and slope/intercept reproduce the daily
    totals' least-squares line computed directly in Python."""
    from arcane_framework_spark.queries_wave3 import ols_trend_events

    rows = ols_trend_events(spark, SF_DIR).collect()
    assert rows
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(
            "event_type",
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 86400000000"
            ).alias("day"),
        )
        .count()
        .collect()
    )
    for r in rows:
        assert r["r2"] is None or 0.0 <= r["r2"] <= 1.0 + 1e-9
        pts = sorted(
            (x["day"], x["count"]) for x in ev
            if x["event_type"] == r["event_type"]
        )
        if len(pts) < 2:
            continue
        x0 = pts[0][0]
        xs = [p[0] - x0 for p in pts]
        ys = [p[1] for p in pts]
        n = len(xs)
        den = n * sum(x * x for x in xs) - sum(xs) ** 2
        slope = (n * sum(a * b for a, b in zip(xs, ys))
                 - sum(xs) * sum(ys)) / den
        assert r["slope_per_day"] == pytest.approx(slope, abs=2e-6)
