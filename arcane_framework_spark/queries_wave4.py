"""Round-8 wave-4 extension queries: hygiene, dispersion, image
near-dup, causal/allocation, and infra audits.

Eight operators with the repo's standard exact-oracle contract:

- ``encoding_audit_documents``: control-character / replacement-character
  / non-ASCII hygiene rates per source, over a corpus with DETERMINISTIC
  planted dirty documents (the synthetic corpus is clean — like the
  near-dup families, the audit must be shown catching something).
- ``fano_dispersion_events``: per-type Fano factor (variance/mean) of
  hourly counts — the burstiness diagnostic that separates "steady
  stream" from "batchy/bursty" event types (Poisson => Fano ~ 1).
- ``decile_shift_events``: per-decile boundary drift between the early
  and late time halves — the DIRECTION/magnitude profile that the KS
  entry's single max-gap statistic cannot show.
- ``image_dhash_documents`` / ``image_dhash_near_pairs_documents``:
  perceptual-hash bucketing of decoded image assets and the
  Hamming-radius band join over DISTINCT hashes.
- ``did_estimator_events``: difference-in-differences value lift from
  exact integer-cent cell sums.
- ``allocation_hamilton_documents``: largest-remainder sample-budget
  allocation in pure integer arithmetic.
- ``shard_rebalance_documents``: mod vs HRW/rendezvous resharding
  movement audit (md5-derived weights, max(struct) argmax).
- ``vocab_shift_documents``: word-level drift attribution via log-free
  integer rate ratios.

Cross-engine notes: regex classes use explicit ``\\xNN`` escapes (Java
regex and RE2 agree on those); planted suffixes are built with chr() on
the SQL side so the oracle source stays printable; decile boundaries are
STORED values picked by integer rank conditions (``cum*10 >= k*n``) —
no interpolation, no float arithmetic before the final delta.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arcane_framework_spark.session import load_tables, ts_micros

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000

#: Planted dirty-doc id offsets (distinct from the near-dup families'
#: 100k/300k/400k and the edit family's offsets).
ENC_BELL_OFFSET = 500_000
ENC_CTRL_OFFSET = 600_000

#: Suffix codepoints: every 11th doc gains BEL + U+FFFD + NBSP (one
#: control, one replacement, one non-ASCII); every 19th gains five C0
#: control characters.
ENC_BELL_CODES = (0x07, 0xFFFD, 0xA0)
ENC_CTRL_CODES = (0x01, 0x02, 0x03, 0x04, 0x05)

#: Character classes with explicit escapes — Java regex (Spark) and RE2
#: (DuckDB) agree on \xNN classes. NUL excluded from planting (C-string
#: hostile) but included in the class.
CTRL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
NON_ASCII_RE = r"[^\x00-\x7F]"
REPLACEMENT_CHAR = "�"


def _planted_dirty_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "source", "text")
    bell = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + ENC_BELL_OFFSET).alias("doc_id"),
        "source",
        F.concat(
            F.col("text"), F.lit("".join(chr(c) for c in ENC_BELL_CODES))
        ).alias("text"),
    )
    ctrl = docs.filter(F.col("doc_id") % 19 == 0).select(
        (F.col("doc_id") + ENC_CTRL_OFFSET).alias("doc_id"),
        "source",
        F.concat(
            F.col("text"), F.lit("".join(chr(c) for c in ENC_CTRL_CODES))
        ).alias("text"),
    )
    return docs.unionByName(bell).unionByName(ctrl)


def encoding_audit_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-encoding hygiene audit per source: how many documents carry
    C0/DEL control characters, U+FFFD replacement characters (the
    signature of a mis-decoded byte stream), and what fraction of the
    characters are non-ASCII. The per-source report every ingest
    pipeline gates on before text reaches a tokenizer. All counts are
    exact integers (regexp occurrence counts summed per source); the
    non-ASCII rate is micro-unit INTEGER division. Map-side only until
    the tiny per-source aggregate."""
    d = _planted_dirty_docs(spark, sf_dir)
    feats = d.select(
        "source",
        F.length("text").alias("n_chars"),
        F.regexp_count("text", F.lit(CTRL_RE)).alias("n_ctrl"),
        F.regexp_count("text", F.lit(NON_ASCII_RE)).alias("n_nonascii"),
        F.regexp_count("text", F.lit(REPLACEMENT_CHAR)).alias("n_repl"),
    )
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("n_ctrl") > 0).cast("long"))
        .cast("long")
        .alias("docs_with_ctrl"),
        F.sum("n_ctrl").cast("long").alias("ctrl_chars"),
        F.sum((F.col("n_repl") > 0).cast("long"))
        .cast("long")
        .alias("docs_with_replacement"),
        F.sum("n_repl").cast("long").alias("replacement_chars"),
        F.expr(
            "CAST((sum(n_nonascii) * 1000000) div sum(n_chars) AS BIGINT)"
        ).alias("nonascii_ppm"),
    )


def _encoding_sql() -> str:
    bell = " || ".join(f"chr({c})" for c in ENC_BELL_CODES)
    ctrl = " || ".join(f"chr({c})" for c in ENC_CTRL_CODES)
    return rf"""
WITH planted AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + {ENC_BELL_OFFSET}, source, text || {bell}
  FROM documents WHERE doc_id % 11 = 0
  UNION ALL
  SELECT doc_id + {ENC_CTRL_OFFSET}, source, text || {ctrl}
  FROM documents WHERE doc_id % 19 = 0
),
feats AS (
  SELECT source,
         length(text)::BIGINT AS n_chars,
         len(regexp_extract_all(text, '{CTRL_RE}'))::BIGINT AS n_ctrl,
         len(regexp_extract_all(text, '{NON_ASCII_RE}'))::BIGINT
           AS n_nonascii,
         len(regexp_extract_all(text, chr(65533)))::BIGINT AS n_repl
  FROM planted
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN n_ctrl > 0 THEN 1 ELSE 0 END)::BIGINT
         AS docs_with_ctrl,
       sum(n_ctrl)::BIGINT AS ctrl_chars,
       sum(CASE WHEN n_repl > 0 THEN 1 ELSE 0 END)::BIGINT
         AS docs_with_replacement,
       sum(n_repl)::BIGINT AS replacement_chars,
       ((sum(n_nonascii) * 1000000) // sum(n_chars))::BIGINT
         AS nonascii_ppm
FROM feats GROUP BY 1
"""


def fano_dispersion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion, variance/mean) of hourly event
    counts per type: ~1 for a Poisson-steady stream, >>1 for bursty
    arrivals, <1 for throttled/regular ones — the burstiness diagnostic
    next to the hourly-anomaly z-scores. Population variance from exact
    integer moments: ``fano = (n*Syy - Sy^2) / (n * Sy)`` — numerator
    and denominator exact int64, ONE division, round 6. Hourly rows are
    metadata scale."""
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_type", ts_micros(t["events"]).alias("ts_us")
    )
    hourly = ev.groupBy(
        "event_type", F.expr(f"ts_us div {_HOUR_US}").alias("h")
    ).agg(F.count(F.lit(1)).alias("y"))
    agg = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.col("sy").cast("long").alias("n_events"),
        F.expr("CAST((sy * 1000000) div n AS BIGINT)").alias(
            "mean_per_hour_micro"
        ),
        F.round(
            (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            .cast("double")
            / (F.col("n") * F.col("sy")).cast("double"),
            6,
        ).alias("fano"),
    )


_FANO_SQL = rf"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} AS h,
         count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(y)::BIGINT AS sy,
         sum(y * y)::BIGINT AS syy
  FROM hourly GROUP BY 1
)
SELECT event_type, n AS n_hours, sy AS n_events,
       ((sy * 1000000) // n)::BIGINT AS mean_per_hour_micro,
       round((n*syy - sy*sy)::DOUBLE / (n*sy)::DOUBLE, 6) AS fano
FROM agg
"""


def decile_shift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile drift profile of the value distribution between the
    early and late time halves, per event type: boundary k (k=1..9) is
    the smallest STORED value whose cumulative count satisfies
    ``cum*10 >= k*n`` — exact integer rank conditions over per-distinct-
    value level tables (the KS entry's cumulative pattern), zero
    interpolation. Each level emits the k-range it covers
    (``(10*cum_prev) div n + 1 .. (10*cum) div n``) — Spark's sequence()
    REVERSES when start > stop, so the emptiness filter runs before the
    explode on both engines. The early/late boundary tables join on
    (type, k); the delta is one IEEE double subtraction of stored
    values."""
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_type", "value", ts_micros(t["events"]).alias("ts_us")
    )
    rng = ev.agg(F.min("ts_us").alias("__mn"), F.max("ts_us").alias("__mx"))
    sided = with_broadcast_scalar(ev, rng).select(
        "event_type",
        "value",
        (F.col("ts_us") * 2 <= F.col("__mn") + F.col("__mx"))
        .cast("int")
        .alias("half"),
    )
    levels = sided.groupBy("event_type", "half", "value").agg(
        F.count(F.lit(1)).alias("m")
    )
    w = Window.partitionBy("event_type", "half").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("event_type", "half")
    cum = (
        levels.withColumn("cum", F.sum("m").over(w))
        .withColumn("n", F.sum("m").over(wt))
        .withColumn("k_lo", F.expr("(10 * (cum - m)) div n + 1"))
        .withColumn("k_hi", F.least(F.expr("(10 * cum) div n"), F.lit(9)))
        .filter(F.col("k_lo") <= F.col("k_hi"))
    )
    bounds = cum.select(
        "event_type",
        "half",
        F.explode(F.sequence(F.col("k_lo"), F.col("k_hi"))).alias("k"),
        "value",
    )
    early = bounds.filter(F.col("half") == 1).select(
        "event_type", "k", F.col("value").alias("early_value")
    )
    late = bounds.filter(F.col("half") == 0).select(
        "event_type", "k", F.col("value").alias("late_value")
    )
    return early.join(late, ["event_type", "k"]).select(
        "event_type",
        F.col("k").cast("int").alias("decile"),
        "early_value",
        "late_value",
        (F.col("late_value") - F.col("early_value")).alias("shift"),
    )


_DECILE_SHIFT_SQL = r"""
WITH ev AS (
  SELECT event_type, value, epoch_us(ts) AS ts_us FROM events
),
rng AS (SELECT min(ts_us) AS mn, max(ts_us) AS mx FROM ev),
sided AS (
  SELECT event_type, value,
         CASE WHEN ts_us * 2 <= mn + mx THEN 1 ELSE 0 END AS half
  FROM ev CROSS JOIN rng
),
levels AS (
  SELECT event_type, half, value, count(*)::BIGINT AS m
  FROM sided GROUP BY 1, 2, 3
),
cum AS (
  SELECT event_type, half, value, m,
         (sum(m) OVER (PARTITION BY event_type, half ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         )::BIGINT AS cum,
         (sum(m) OVER (PARTITION BY event_type, half))::BIGINT AS n
  FROM levels
),
ks AS (
  SELECT event_type, half, value,
         (10 * (cum - m)) // n + 1 AS k_lo,
         least((10 * cum) // n, 9) AS k_hi
  FROM cum
  WHERE (10 * (cum - m)) // n + 1 <= least((10 * cum) // n, 9)
),
bounds AS (
  SELECT event_type, half, unnest(generate_series(k_lo, k_hi)) AS k, value
  FROM ks
)
SELECT e.event_type, e.k::INT AS decile,
       e.value AS early_value, l.value AS late_value,
       l.value - e.value AS shift
FROM (SELECT * FROM bounds WHERE half = 1) e
JOIN (SELECT * FROM bounds WHERE half = 0) l
  ON e.event_type = l.event_type AND e.k = l.k
"""


#: Planted dHash-variant id offset (brightness +1 twin of every 13th doc).
DHASH_VARIANT_OFFSET = 700_000
#: Asset dims — multiples of the 8x9 dHash grid.
DHASH_W, DHASH_H = 18, 16


def image_dhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (dHash) bucketing of image assets — the image-
    modality near-dup blocking key next to the text family (MinHash /
    SimHash / winnowing). One synthetic asset per doc (closed-form
    gradient pixels, format cycling bmp/ppm/png) plus a planted
    brightness+1 variant of every 13th doc whose id offset ALSO rotates
    the format — equal hashes across formats prove decode consistency,
    and a +1 brightness shift preserves most hashes (it only moves the
    single mod-256 wrap seam). The hash is 64 exact integer cell-sum
    comparisons over the decoded pixels (operators/multimodal.py
    ``image_dhash``), emitted as two 32-bit halves (no int64 sign bit
    on either engine); the output is the bucket table (hash, count,
    id range) — metadata scale, never raw pairs."""
    hashes = _dhash_hashes(spark, sf_dir)
    return hashes.groupBy("hash_hi", "hash_lo").agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
    )


def _image_dhash_sql() -> str:
    return rf"""
WITH ids AS (
  SELECT doc_id, doc_id % 256 AS seed FROM documents
  UNION ALL
  SELECT doc_id + {DHASH_VARIANT_OFFSET}, (doc_id % 256 + 1) % 256
  FROM documents WHERE doc_id % 13 = 0
),
rs AS (SELECT unnest(generate_series(0, {DHASH_H - 1})) AS r),
cs AS (SELECT unnest(generate_series(0, {DHASH_W - 1})) AS c),
chs AS (SELECT unnest(generate_series(0, 2)) AS ch),
px AS (
  SELECT doc_id,
         r // {DHASH_H // 8} AS cr, c // {DHASH_W // 9} AS cc,
         (seed + 7*r + 3*c + ch) % 256 AS v
  FROM ids CROSS JOIN rs CROSS JOIN cs CROSS JOIN chs
),
cells AS (
  SELECT doc_id, cr, cc, sum(v)::BIGINT AS s FROM px GROUP BY 1, 2, 3
),
bits AS (
  SELECT a.doc_id, a.cr, a.cc,
         CASE WHEN a.s < b.s THEN 1 ELSE 0 END AS bit
  FROM cells a
  JOIN cells b ON a.doc_id = b.doc_id AND a.cr = b.cr AND b.cc = a.cc + 1
  WHERE a.cc < 8
),
hashes AS (
  SELECT doc_id,
         sum(CASE WHEN cr < 4
                  THEN bit * (1::BIGINT << (cr*8 + cc)) ELSE 0 END
            )::BIGINT AS hash_hi,
         sum(CASE WHEN cr >= 4
                  THEN bit * (1::BIGINT << ((cr-4)*8 + cc)) ELSE 0 END
            )::BIGINT AS hash_lo
  FROM bits GROUP BY 1
)
SELECT hash_hi, hash_lo, count(*)::BIGINT AS n_images,
       min(doc_id)::BIGINT AS min_doc_id, max(doc_id)::BIGINT AS max_doc_id
FROM hashes GROUP BY 1, 2
"""


#: Hamming radius for "near" image pairs (1..HAM_MAX; 0 = identical,
#: already covered by the bucket table).
DHASH_HAM_MAX = 6


def _dhash_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared hash table for the two dHash entries (bucket + near-pair)."""
    from arcane_framework_spark.operators.multimodal import (
        image_dhash,
        synth_dhash_assets,
    )

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id")
    base = docs.select("doc_id", (F.col("doc_id") % 256).alias("seed"))
    variant = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + DHASH_VARIANT_OFFSET).alias("doc_id"),
        ((F.col("doc_id") % 256 + 1) % 256).alias("seed"),
    )
    return image_dhash(
        synth_dhash_assets(base.unionByName(variant), DHASH_W, DHASH_H)
    )


def image_dhash_near_pairs_documents(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Hamming-radius image near-dup search over the dHash space — the
    image analog of LSH banding, at HASH level so it scales: duplicate-
    heavy corpora make image-level band joins quadratic in bucket size
    (every exact duplicate shares a hash), so the join runs over
    DISTINCT hashes with multiplicities and reports ``n_pairs =
    n_a * n_b`` image pairs per hash pair. Each 64-bit hash splits into
    4 x 16-bit bands (integer shift/mask); a band match is the
    candidate condition. Recall is GUARANTEED only when >= 1 band is
    clean (pigeonhole: always true for <= 3 flipped bits; a Hamming
    4..6 pair that spreads flips across all four bands, e.g. 2+2+1+1,
    is silently missed) — so the radius-6 report is best-effort beyond
    Hamming 3. The planted brightness twins flip few, clustered bits,
    which is why they survive banding here; use 8 x 8-bit bands for
    guaranteed recall up to Hamming 7 at 2x the candidate fan-out. The
    verify is exact ``bit_count(xor)`` integer arithmetic on both
    engines. Hamming 0 (identical) is excluded — that is the bucket
    table's job."""
    h = _dhash_hashes(spark, sf_dir)
    hh = h.groupBy("hash_hi", "hash_lo").agg(
        F.count(F.lit(1)).alias("n")
    )
    bands = hh.select(
        "hash_hi",
        "hash_lo",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_idx"),
                        F.expr(
                            f"shiftright({'hash_hi' if k < 2 else 'hash_lo'},"
                            f" {16 * (k % 2)}) & 65535"
                        ).alias("band_val"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("b"),
    ).select("hash_hi", "hash_lo", "n", "b.band_idx", "b.band_val")
    a = bands.select(
        F.col("hash_hi").alias("hi_a"), F.col("hash_lo").alias("lo_a"),
        F.col("n").alias("n_a"), "band_idx", "band_val",
    )
    b = bands.select(
        F.col("hash_hi").alias("hi_b"), F.col("hash_lo").alias("lo_b"),
        F.col("n").alias("n_b"), "band_idx", "band_val",
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(
            (F.col("hi_a") < F.col("hi_b"))
            | ((F.col("hi_a") == F.col("hi_b"))
               & (F.col("lo_a") < F.col("lo_b")))
        )
        .select("hi_a", "lo_a", "n_a", "hi_b", "lo_b", "n_b")
        .distinct()
    )
    ham = F.expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)")
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(
            (F.col("hamming") >= 1) & (F.col("hamming") <= DHASH_HAM_MAX)
        )
        .select(
            "hi_a", "lo_a", "hi_b", "lo_b", "hamming",
            (F.col("n_a") * F.col("n_b")).cast("long").alias("n_pairs"),
        )
    )


def _image_dhash_pairs_sql() -> str:
    hashes_cte = _image_dhash_sql()
    # Reuse the dhash oracle's hash derivation up to the `hashes` CTE,
    # swapping its final SELECT for the band join.
    head = hashes_cte[: hashes_cte.rindex("SELECT hash_hi")]
    return rf"""{head}
,
hh AS (
  SELECT hash_hi, hash_lo, count(*)::BIGINT AS n
  FROM hashes GROUP BY 1, 2
),
bands AS (
  SELECT hash_hi, hash_lo, n, k AS band_idx,
         CASE WHEN k < 2 THEN (hash_hi >> (16 * (k % 2))) & 65535
              ELSE (hash_lo >> (16 * (k % 2))) & 65535 END AS band_val
  FROM hh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k)
),
cand AS (
  SELECT DISTINCT
         a.hash_hi AS hi_a, a.hash_lo AS lo_a, a.n AS n_a,
         b.hash_hi AS hi_b, b.hash_lo AS lo_b, b.n AS n_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
  WHERE a.hash_hi < b.hash_hi
     OR (a.hash_hi = b.hash_hi AND a.hash_lo < b.hash_lo)
)
SELECT hi_a, lo_a, hi_b, lo_b,
       (bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)))::INT
         AS hamming,
       (n_a * n_b)::BIGINT AS n_pairs
FROM cand
WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b))
      BETWEEN 1 AND {DHASH_HAM_MAX}
"""


#: Hamilton allocation: total sample slots to distribute across sources.
HAMILTON_BUDGET = 10_000


def did_estimator_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the treated cohort's value
    lift per event type — the workhorse quasi-experimental estimator
    (treated = odd user ids, period split at the integer time midpoint).
    Event values are fixed to integer cents ONCE per row (double sums
    are order-dependent; integer sums are not); the four cell means and
    the DiD ``(T1-T0)-(C1-C0)`` are IEEE-double expressions over
    exact-integer sums/counts, computed identically in both engines.
    One hash aggregate over (type, cohort, period) — 4 cells per type."""
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_type",
        "user_id",
        "value",
        ts_micros(t["events"]).alias("ts_us"),
    )
    rng = ev.agg(F.min("ts_us").alias("__mn"), F.max("ts_us").alias("__mx"))
    cells = (
        with_broadcast_scalar(ev, rng)
        .select(
            "event_type",
            (F.col("user_id") % 2).cast("int").alias("treated"),
            (F.col("ts_us") * 2 > F.col("__mn") + F.col("__mx"))
            .cast("int")
            .alias("post"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias(
                "cents"
            ),
        )
        .groupBy("event_type", "treated", "post")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
        )
    )
    mean = lambda tr, po: F.max(  # noqa: E731 — cell extractor
        F.when(
            (F.col("treated") == tr) & (F.col("post") == po),
            F.col("s").cast("double") / F.col("n").cast("double"),
        )
    )
    agg = cells.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_events"),
        mean(1, 0).alias("__t0"),
        mean(1, 1).alias("__t1"),
        mean(0, 0).alias("__c0"),
        mean(0, 1).alias("__c1"),
    )
    r6 = lambda c: F.round(c / 100.0, 6)  # noqa: E731 — cents → dollars
    return agg.select(
        "event_type",
        "n_events",
        r6(F.col("__t0")).alias("treated_pre"),
        r6(F.col("__t1")).alias("treated_post"),
        r6(F.col("__c0")).alias("control_pre"),
        r6(F.col("__c1")).alias("control_post"),
        r6(
            (F.col("__t1") - F.col("__t0"))
            - (F.col("__c1") - F.col("__c0"))
        ).alias("did"),
    )


_DID_SQL = r"""
WITH ev AS (
  SELECT event_type, user_id, value, epoch_us(ts) AS ts_us FROM events
),
rng AS (SELECT min(ts_us) AS mn, max(ts_us) AS mx FROM ev),
cells AS (
  SELECT event_type,
         (user_id % 2)::INT AS treated,
         CASE WHEN ts_us * 2 > mn + mx THEN 1 ELSE 0 END AS post,
         count(*)::BIGINT AS n,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS s
  FROM ev CROSS JOIN rng
  GROUP BY 1, 2, 3
),
agg AS (
  SELECT event_type, sum(n)::BIGINT AS n_events,
         max(CASE WHEN treated = 1 AND post = 0
                  THEN s::DOUBLE / n::DOUBLE END) AS t0,
         max(CASE WHEN treated = 1 AND post = 1
                  THEN s::DOUBLE / n::DOUBLE END) AS t1,
         max(CASE WHEN treated = 0 AND post = 0
                  THEN s::DOUBLE / n::DOUBLE END) AS c0,
         max(CASE WHEN treated = 0 AND post = 1
                  THEN s::DOUBLE / n::DOUBLE END) AS c1
  FROM cells GROUP BY 1
)
SELECT event_type, n_events,
       round(t0 / 100.0, 6) AS treated_pre,
       round(t1 / 100.0, 6) AS treated_post,
       round(c0 / 100.0, 6) AS control_pre,
       round(c1 / 100.0, 6) AS control_post,
       round(((t1 - t0) - (c1 - c0)) / 100.0, 6) AS did
FROM agg
"""


def allocation_hamilton_documents(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Proportional sample-budget allocation across sources by the
    Hamilton (largest-remainder) method — the deterministic integer
    answer to "give me exactly N sample slots split fairly by corpus
    share" (floor quotas always under-allocate; ranking the SCALED
    remainders ``budget*n_src - floor*N`` hands out the shortfall one
    slot at a time, ties broken by source name). Every quantity is an
    exact integer; windows run over source rows (≤ dozens)."""
    t = load_tables(spark, sf_dir, "documents")
    src = t["documents"].groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    wt = Window.partitionBy()
    q = (
        src.withColumn("__total", F.sum("n_docs").over(wt))
        .withColumn(
            "__floor",
            F.expr(f"({HAMILTON_BUDGET} * n_docs) div __total"),
        )
        .withColumn(
            "__rem",
            F.expr(
                f"{HAMILTON_BUDGET} * n_docs - __floor * __total"
            ),
        )
        .withColumn("__short", F.lit(HAMILTON_BUDGET) - F.sum("__floor").over(wt))
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.orderBy(F.col("__rem").desc(), "source")
            ),
        )
    )
    return q.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        (
            F.col("__floor")
            + (F.col("__rk") <= F.col("__short")).cast("long")
        ).cast("long").alias("quota"),
    )


_HAMILTON_SQL = rf"""
WITH src AS (
  SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1
),
q AS (
  SELECT source, n_docs,
         (sum(n_docs) OVER ())::BIGINT AS total,
         (({HAMILTON_BUDGET} * n_docs) // (sum(n_docs) OVER ()))::BIGINT
           AS fl
  FROM src
),
r AS (
  SELECT source, n_docs, fl,
         ({HAMILTON_BUDGET} * n_docs - fl * total)::BIGINT AS rem,
         ({HAMILTON_BUDGET} - sum(fl) OVER ())::BIGINT AS short
  FROM q
)
SELECT source, n_docs,
       (fl + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                       <= short THEN 1 ELSE 0 END)::BIGINT AS quota
FROM r
"""


#: Shard-rebalance audit: shard counts before/after adding one shard.
SHARDS_BEFORE = 32
SHARDS_AFTER = 33


def shard_rebalance_documents(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """How much data moves when the cluster grows from 32 to 33 shards,
    under (a) mod-hashing and (b) HRW/rendezvous (highest-random-weight)
    consistent hashing — the operational question behind every
    repartition/resharding plan at 100 TB. Mod moves ~(1 - 1/33) ≈ 97%
    of rows; HRW provably moves only the ~1/33 that land on the new
    shard. Both use the repo's engine-identical md5→int idiom; the HRW
    argmax is a max(struct(weight, shard)) — deterministic (md5 ties
    are impossible in practice and break by shard id), one aggregate
    over an exploded doc×33 weight table. Output: 2 strategy rows with
    exact moved counts and integer-ppm moved rates."""
    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id")
    hid = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT)"
    )
    mod = docs.select(
        (
            (hid % SHARDS_BEFORE)
            != (hid % SHARDS_AFTER)
        ).cast("long").alias("moved")
    ).agg(
        F.lit("mod").alias("strategy"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("moved").cast("long").alias("n_moved"),
        F.expr("CAST((sum(moved) * 1000000) div count(1) AS BIGINT)")
        .alias("moved_ppm"),
    )
    w = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(SHARDS_AFTER - 1))
        ).alias("s"),
    ).select(
        "doc_id",
        "s",
        F.expr(
            "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':',"
            " CAST(s AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        ).alias("wt"),
    )
    picks = w.groupBy("doc_id").agg(
        F.max(
            F.when(
                F.col("s") < SHARDS_BEFORE,
                F.struct(F.col("wt"), F.col("s")),
            )
        )["s"].alias("s_before"),
        F.max(F.struct(F.col("wt"), F.col("s")))["s"].alias("s_after"),
    )
    hrw = picks.select(
        (F.col("s_before") != F.col("s_after")).cast("long").alias("moved")
    ).agg(
        F.lit("hrw").alias("strategy"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("moved").cast("long").alias("n_moved"),
        F.expr("CAST((sum(moved) * 1000000) div count(1) AS BIGINT)")
        .alias("moved_ppm"),
    )
    return mod.unionByName(hrw)


_SHARD_REBALANCE_SQL = rf"""
WITH ids AS (SELECT doc_id FROM documents),
modv AS (
  SELECT CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                   % {SHARDS_BEFORE}
              <> ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                   % {SHARDS_AFTER}
         THEN 1 ELSE 0 END AS moved
  FROM ids
),
w AS (
  SELECT doc_id, s,
         ('0x' || substr(md5(doc_id::VARCHAR || ':' || s::VARCHAR), 1, 8)
         )::BIGINT AS wt
  FROM ids CROSS JOIN
       (SELECT unnest(generate_series(0, {SHARDS_AFTER - 1})) AS s)
),
picks AS (
  SELECT doc_id,
         (max(CASE WHEN s < {SHARDS_BEFORE}
                   THEN struct_pack(wt := wt, s := s) END)).s AS s_before,
         (max(struct_pack(wt := wt, s := s))).s AS s_after
  FROM (SELECT doc_id, s, wt FROM w) GROUP BY doc_id
),
hrw AS (
  SELECT CASE WHEN s_before <> s_after THEN 1 ELSE 0 END AS moved
  FROM picks
)
SELECT 'mod' AS strategy, count(*)::BIGINT AS n_docs,
       sum(moved)::BIGINT AS n_moved,
       ((sum(moved) * 1000000) // count(*))::BIGINT AS moved_ppm
FROM modv
UNION ALL
SELECT 'hrw', count(*)::BIGINT, sum(moved)::BIGINT,
       ((sum(moved) * 1000000) // count(*))::BIGINT
FROM hrw
"""


#: Vocab shift: minimum combined term count and how many risers/fallers
#: to report.
VOCAB_SHIFT_MIN_COUNT = 20
VOCAB_SHIFT_TOP = 20


def vocab_shift_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which WORDS drove the drift between two corpus halves (doc-id
    split — the "old crawl vs new crawl" question after the corpus-level
    diff fires). Per-term add-one-smoothed rate ratio, log-free (libm is
    not cross-engine): each half's term rate goes to exact NANO units by
    integer division (``(c+1)*1e9 div (T+V)``), the ratio to micro units
    by a second integer division — two deterministic truncations, same
    on both engines, monotone in the true odds ratio. Top risers and
    fallers by the integer score (ties by term); rank windows run over
    the filtered term-TYPE table.  Bound: the NANO rate truncates to 0
    once a half's token total exceeds 1e9; the ratio divisor is
    nullif-guarded so such terms yield NULL ratio_micro (identically in
    both engines) rather than Spark-NULL / DuckDB-error divergence."""
    from arcane_framework_spark.operators.scale import with_broadcast_scalar
    from arcane_framework_spark.operators.text import tokens_expr

    t = load_tables(spark, sf_dir, "documents")
    toks = (
        t["documents"]
        .select(
            (F.col("doc_id") % 2).alias("half"),
            F.explode(tokens_expr("text")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.lit(1) - F.col("half")).alias("c0"),
        F.sum("half").alias("c1"),
    )
    tot = counts.agg(
        F.sum("c0").alias("__t0"),
        F.sum("c1").alias("__t1"),
        F.count(F.lit(1)).alias("__v"),
    )
    scored = (
        with_broadcast_scalar(
            counts.filter(
                F.col("c0") + F.col("c1") >= VOCAB_SHIFT_MIN_COUNT
            ),
            tot,
        )
        .withColumn(
            "__r1",
            F.expr("((c1 + 1) * 1000000000) div (__t1 + __v)"),
        )
        .withColumn(
            "__r0",
            F.expr("((c0 + 1) * 1000000000) div (__t0 + __v)"),
        )
        .withColumn(
            # nullif guard: once a half's token total exceeds 1e9 the
            # scaled rate truncates to 0; emit NULL (both engines agree)
            # instead of Spark-NULL / DuckDB-error divergence.
            "ratio_micro",
            F.expr("(__r1 * 1000000) div nullif(__r0, 0)"),
        )
    )
    w_up = Window.orderBy(F.col("ratio_micro").desc(), "term")
    w_dn = Window.orderBy(F.col("ratio_micro").asc(), "term")
    up = (
        scored.withColumn("rank", F.row_number().over(w_up))
        .filter(F.col("rank") <= VOCAB_SHIFT_TOP)
        .withColumn("direction", F.lit("rising"))
    )
    dn = (
        scored.withColumn("rank", F.row_number().over(w_dn))
        .filter(F.col("rank") <= VOCAB_SHIFT_TOP)
        .withColumn("direction", F.lit("falling"))
    )
    return up.unionByName(dn).select(
        "direction",
        F.col("rank").cast("int").alias("rank"),
        "term",
        F.col("c0").cast("long").alias("n_old"),
        F.col("c1").cast("long").alias("n_new"),
        F.col("ratio_micro").cast("long").alias("ratio_micro"),
    )


def _vocab_shift_sql() -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id % 2 AS half,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
),
counts AS (
  SELECT term, sum(1 - half)::BIGINT AS c0, sum(half)::BIGINT AS c1
  FROM toks WHERE term <> '' GROUP BY 1
),
tot AS (
  SELECT sum(c0)::BIGINT AS t0, sum(c1)::BIGINT AS t1,
         count(*)::BIGINT AS v
  FROM counts
),
scored AS (
  SELECT term, c0, c1,
         ((((c1 + 1) * 1000000000) // (t1 + v)) * 1000000)
           // nullif(((c0 + 1) * 1000000000) // (t0 + v), 0) AS ratio_micro
  FROM counts CROSS JOIN tot
  WHERE c0 + c1 >= {VOCAB_SHIFT_MIN_COUNT}
),
up AS (
  SELECT 'rising' AS direction,
         row_number() OVER (ORDER BY ratio_micro DESC, term) AS rank,
         term, c0, c1, ratio_micro
  FROM scored
),
dn AS (
  SELECT 'falling' AS direction,
         row_number() OVER (ORDER BY ratio_micro ASC, term) AS rank,
         term, c0, c1, ratio_micro
  FROM scored
)
SELECT direction, rank::INT AS rank, term,
       c0 AS n_old, c1 AS n_new, ratio_micro::BIGINT AS ratio_micro
FROM (SELECT * FROM up WHERE rank <= {VOCAB_SHIFT_TOP}
      UNION ALL
      SELECT * FROM dn WHERE rank <= {VOCAB_SHIFT_TOP})
"""


def threshold_pick_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal classification threshold (max Youden's J) for the same
    three deterministic embedding scorers the ROC-AUC entry evaluates —
    the operating point a practitioner sets after reading the AUC.
    Fully integer argmax (``tp*n_neg - fp*n_pos`` over distinct STORED
    scores, ROC two-level cumulative pattern); see
    operators/evalmetrics.py ``youden_threshold``."""
    from arcane_framework_spark.operators.evalmetrics import (
        youden_threshold,
    )

    t = load_tables(spark, sf_dir, "embeddings")
    y = (F.col("label") % 2).cast("long").alias("y")
    scored = t["embeddings"].select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("dim0").alias("score_name"),
                    F.element_at("embedding", 1)
                    .cast("double")
                    .alias("score"),
                ),
                F.struct(
                    F.lit("dim4").alias("score_name"),
                    F.element_at("embedding", 5)
                    .cast("double")
                    .alias("score"),
                ),
                F.struct(
                    F.lit("maxdim").alias("score_name"),
                    F.array_max("embedding").cast("double").alias("score"),
                ),
            )
        ).alias("sc"),
        y,
    ).select(
        F.col("sc.score_name").alias("score_name"),
        F.col("sc.score").alias("score"),
        "y",
    )
    return youden_threshold(scored)


_THRESHOLD_PICK_SQL = r"""
WITH sc AS (
  SELECT 'dim0' AS score_name, embedding[1]::DOUBLE AS score,
         (label % 2)::BIGINT AS y FROM embeddings
  UNION ALL
  SELECT 'dim4', embedding[5]::DOUBLE, (label % 2)::BIGINT FROM embeddings
  UNION ALL
  SELECT 'maxdim', list_max(embedding)::DOUBLE, (label % 2)::BIGINT
  FROM embeddings
),
g AS (
  SELECT score_name, score, sum(y)::BIGINT AS n_pos,
         sum(1 - y)::BIGINT AS n_neg
  FROM sc GROUP BY 1, 2
),
cum AS (
  SELECT *,
         coalesce(sum(n_pos) OVER (
             PARTITION BY score_name ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0
         )::BIGINT AS cum_pos,
         coalesce(sum(n_neg) OVER (
             PARTITION BY score_name ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0
         )::BIGINT AS cum_neg,
         (sum(n_pos) OVER (PARTITION BY score_name))::BIGINT AS tot_pos,
         (sum(n_neg) OVER (PARTITION BY score_name))::BIGINT AS tot_neg
  FROM g
),
x AS (
  SELECT score_name, score,
         tot_pos - cum_pos AS tp, tot_neg - cum_neg AS fp,
         tot_pos, tot_neg,
         (tot_pos - cum_pos) * tot_neg
           - (tot_neg - cum_neg) * tot_pos AS j
  FROM cum
)
SELECT score_name, score AS threshold,
       tp::BIGINT AS tp, fp::BIGINT AS fp,
       (tot_pos - tp)::BIGINT AS fn, (tot_neg - fp)::BIGINT AS tn,
       floor(j::DOUBLE / (tot_pos * tot_neg)::DOUBLE * 1e6 + 0.5) / 1e6
         AS youden_j,
       floor(tp::DOUBLE / (tp + fp)::DOUBLE * 1e6 + 0.5) / 1e6
         AS precision,
       floor(tp::DOUBLE / tot_pos::DOUBLE * 1e6 + 0.5) / 1e6 AS recall
FROM (
  SELECT *, row_number() OVER (PARTITION BY score_name
                               ORDER BY j DESC, score ASC) AS rn
  FROM x
) WHERE rn = 1
"""


def trend_break_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single trend breakpoint per event type: the day that splits
    the daily-volume series into two OLS segments with minimal total
    SSE — "when did the growth REGIME change, and from what slope to
    what" (CUSUM sees mean shifts; this sees slope shifts). Candidate
    breakpoints are the per-type daily rows (metadata scale); each
    candidate's left/right segment moments come from inclusive integer
    prefix sums (one value-ordered window per type), and the segment
    SSEs are the identical IEEE-double expression on both engines
    ``Syy - Sy^2/n - (n*Sxy - Sx*Sy)^2 / (n*(n*Sxx - Sx^2))`` over
    int64-exact moments. The argmin key is the double total SSE with a
    deterministic day tie-break; slopes are one division each."""
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_type", ts_micros(t["events"]).alias("ts_us")
    )
    daily = ev.groupBy(
        "event_type", F.expr(f"ts_us div {_DAY_US}").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    wt = Window.partitionBy("event_type")
    xy = daily.withColumn("x", F.col("day") - F.min("day").over(wt))
    w = Window.partitionBy("event_type").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        xy.withColumn("cn", F.count(F.lit(1)).over(w))
        .withColumn("csx", F.sum("x").over(w))
        .withColumn("csy", F.sum("y").over(w))
        .withColumn("csxy", F.sum(F.col("x") * F.col("y")).over(w))
        .withColumn("csxx", F.sum(F.col("x") * F.col("x")).over(w))
        .withColumn("csyy", F.sum(F.col("y") * F.col("y")).over(w))
        .withColumn("tn", F.count(F.lit(1)).over(wt))
        .withColumn("tsx", F.sum("x").over(wt))
        .withColumn("tsy", F.sum("y").over(wt))
        .withColumn("tsxy", F.sum(F.col("x") * F.col("y")).over(wt))
        .withColumn("tsxx", F.sum(F.col("x") * F.col("x")).over(wt))
        .withColumn("tsyy", F.sum(F.col("y") * F.col("y")).over(wt))
    )

    def sse(n, sx, sy, sxy, sxx, syy):
        n_d = n.cast("double")
        num = (n * sxy - sx * sy).cast("double")
        den = (n * (n * sxx - sx * sx)).cast("double")
        return (
            syy.cast("double")
            - (sy.cast("double") * sy.cast("double")) / n_d
            - (num * num) / den
        )

    L = sse(F.col("cn"), F.col("csx"), F.col("csy"), F.col("csxy"),
            F.col("csxx"), F.col("csyy"))
    rn_ = F.col("tn") - F.col("cn")
    R = sse(rn_, F.col("tsx") - F.col("csx"), F.col("tsy") - F.col("csy"),
            F.col("tsxy") - F.col("csxy"), F.col("tsxx") - F.col("csxx"),
            F.col("tsyy") - F.col("csyy"))
    single = sse(F.col("tn"), F.col("tsx"), F.col("tsy"), F.col("tsxy"),
                 F.col("tsxx"), F.col("tsyy"))
    slope = lambda n, sx, sy, sxy, sxx: F.round(  # noqa: E731
        (n * sxy - sx * sy).cast("double")
        / F.nullif(n * sxx - sx * sx, F.lit(0)).cast("double"),
        6,
    )
    cand = (
        cum.filter((F.col("cn") >= 2) & (F.col("tn") - F.col("cn") >= 2))
        .withColumn("__sse2", L + R)
        .withColumn("__sse1", single)
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("__sse2").asc(), F.col("day").asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(
            "event_type",
            (F.col("day") * _DAY_US).alias("break_day_us"),
            F.col("tn").cast("long").alias("n_days"),
            F.round(F.col("__sse1"), 6).alias("sse_single"),
            F.round(F.col("__sse2"), 6).alias("sse_two_segment"),
            # nullif guard: a perfectly linear series has sse1 == 0 and
            # the unguarded ratio is NaN — Spark casts NaN->long as 0 but
            # DuckDB errors; NULL improvement_ppm agrees cross-engine.
            F.floor(
                (F.lit(1.0)
                 - F.col("__sse2")
                 / F.nullif(F.col("__sse1"), F.lit(0.0)))
                * F.lit(1_000_000.0)
            ).cast("long").alias("improvement_ppm"),
            slope(F.col("cn"), F.col("csx"), F.col("csy"),
                  F.col("csxy"), F.col("csxx")).alias("slope_left"),
            slope(rn_, F.col("tsx") - F.col("csx"),
                  F.col("tsy") - F.col("csy"),
                  F.col("tsxy") - F.col("csxy"),
                  F.col("tsxx") - F.col("csxx")).alias("slope_right"),
        )
    )


_TREND_BREAK_SQL = rf"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
xy AS (
  SELECT event_type, day, y,
         day - min(day) OVER (PARTITION BY event_type) AS x
  FROM daily
),
cum AS (
  SELECT event_type, day,
         (count(*) OVER wc)::BIGINT AS cn,
         (sum(x) OVER wc)::BIGINT AS csx,
         (sum(y) OVER wc)::BIGINT AS csy,
         (sum(x*y) OVER wc)::BIGINT AS csxy,
         (sum(x*x) OVER wc)::BIGINT AS csxx,
         (sum(y*y) OVER wc)::BIGINT AS csyy,
         (count(*) OVER wt)::BIGINT AS tn,
         (sum(x) OVER wt)::BIGINT AS tsx,
         (sum(y) OVER wt)::BIGINT AS tsy,
         (sum(x*y) OVER wt)::BIGINT AS tsxy,
         (sum(x*x) OVER wt)::BIGINT AS tsxx,
         (sum(y*y) OVER wt)::BIGINT AS tsyy
  FROM xy
  WINDOW wc AS (PARTITION BY event_type ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wt AS (PARTITION BY event_type)
),
cand AS (
  SELECT *,
         (csyy::DOUBLE - (csy::DOUBLE * csy::DOUBLE) / cn::DOUBLE
          - ((cn*csxy - csx*csy)::DOUBLE * (cn*csxy - csx*csy)::DOUBLE)
            / ((cn * (cn*csxx - csx*csx))::DOUBLE))
         +
         ((tsyy-csyy)::DOUBLE
          - ((tsy-csy)::DOUBLE * (tsy-csy)::DOUBLE) / (tn-cn)::DOUBLE
          - (((tn-cn)*(tsxy-csxy) - (tsx-csx)*(tsy-csy))::DOUBLE
             * ((tn-cn)*(tsxy-csxy) - (tsx-csx)*(tsy-csy))::DOUBLE)
            / (((tn-cn) * ((tn-cn)*(tsxx-csxx)
                           - (tsx-csx)*(tsx-csx)))::DOUBLE)
         ) AS sse2,
         (tsyy::DOUBLE - (tsy::DOUBLE * tsy::DOUBLE) / tn::DOUBLE
          - ((tn*tsxy - tsx*tsy)::DOUBLE * (tn*tsxy - tsx*tsy)::DOUBLE)
            / ((tn * (tn*tsxx - tsx*tsx))::DOUBLE)) AS sse1
  FROM cum
  WHERE cn >= 2 AND tn - cn >= 2
)
SELECT event_type, day * {_DAY_US} AS break_day_us, tn AS n_days,
       round(sse1, 6) AS sse_single,
       round(sse2, 6) AS sse_two_segment,
       CAST(floor((1.0 - sse2 / nullif(sse1, 0.0)) * 1000000.0) AS BIGINT)
         AS improvement_ppm,
       round((cn*csxy - csx*csy)::DOUBLE
             / nullif(cn*csxx - csx*csx, 0)::DOUBLE, 6) AS slope_left,
       round(((tn-cn)*(tsxy-csxy) - (tsx-csx)*(tsy-csy))::DOUBLE
             / nullif((tn-cn)*(tsxx-csxx) - (tsx-csx)*(tsx-csx),
                      0)::DOUBLE, 6) AS slope_right
FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY sse2 ASC, day ASC) AS rn
  FROM cand
) WHERE rn = 1
"""


#: Weekday-adjusted anomalies reported per type.
WDAY_ANOM_TOP = 3


def weekday_adjusted_anomaly_events(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Seasonality-adjusted daily anomalies: the raw hourly-anomaly
    entry flags every weekend as anomalous when traffic has a weekly
    rhythm — this one subtracts each type's day-of-week mean first and
    ranks days by the absolute RESIDUAL. The dow mean goes to exact
    micro-units by integer division (deterministic), the residual
    ``y*1e6 - mean_micro`` stays an exact integer, and the per-type
    rank (|residual| desc, day asc) runs over daily rows — metadata
    scale. Day-of-week is the calendar-free ``(epoch_day + 4) % 7``."""
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_type", ts_micros(t["events"]).alias("ts_us")
    )
    daily = ev.groupBy(
        "event_type", F.expr(f"ts_us div {_DAY_US}").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    daily = daily.withColumn("dow", ((F.col("day") + 4) % 7))
    wd = Window.partitionBy("event_type", "dow")
    adj = (
        daily.withColumn(
            "mean_micro",
            F.expr("(sum(y) OVER (PARTITION BY event_type, dow)"
                   " * 1000000) div"
                   " count(1) OVER (PARTITION BY event_type, dow)"),
        )
        .withColumn("n_dow_days", F.count(F.lit(1)).over(wd))
        .withColumn(
            "residual_micro",
            F.col("y") * F.lit(1_000_000) - F.col("mean_micro"),
        )
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("residual_micro")).desc(), F.col("day").asc()
    )
    return (
        adj.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") <= WDAY_ANOM_TOP)
        .select(
            "event_type",
            F.col("__rn").cast("int").alias("rank"),
            (F.col("day") * _DAY_US).alias("day_us"),
            F.col("dow").cast("int").alias("dow"),
            F.col("y").cast("long").alias("n_events"),
            F.col("mean_micro").cast("long").alias("dow_mean_micro"),
            F.col("residual_micro").cast("long").alias("residual_micro"),
            F.col("n_dow_days").cast("long").alias("n_dow_days"),
        )
    )


_WDAY_ANOM_SQL = rf"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
adj AS (
  SELECT event_type, day, (day + 4) % 7 AS dow, y,
         ((sum(y) OVER (PARTITION BY event_type, (day + 4) % 7)
          ) * 1000000)
           // (count(*) OVER (PARTITION BY event_type, (day + 4) % 7))
           AS mean_micro,
         (count(*) OVER (PARTITION BY event_type, (day + 4) % 7)
         )::BIGINT AS n_dow_days
  FROM daily
)
SELECT event_type, rn::INT AS rank, day * {_DAY_US} AS day_us,
       dow::INT AS dow, y AS n_events,
       mean_micro::BIGINT AS dow_mean_micro,
       (y * 1000000 - mean_micro)::BIGINT AS residual_micro,
       n_dow_days
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY event_type
      ORDER BY abs(y * 1000000 - mean_micro) DESC, day ASC) AS rn
  FROM adj
) WHERE rn <= {WDAY_ANOM_TOP}
"""


def price_reconciliation_orders(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Cross-table arithmetic reconciliation: does each order's stored
    total equal the recomputed ``sum(extendedprice*(1+tax)*(1-discount))``
    over its line items — the classic finance-pipeline consistency gate
    (and on THIS synthetic corpus it fires: the generator does not
    maintain the TPC-H invariant, which is exactly what the audit is
    for). Per-lineitem amounts fix to integer cents ONCE (one IEEE
    product + floor per row — order-independent integer sums), the
    stored total likewise; per-priority summary reports mismatch counts
    and exact absolute-difference cents. One co-partitioned aggregate +
    one join."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    li = t["lineitem"].select(
        F.col("l_orderkey").alias("okey"),
        F.expr(
            "CAST(floor(l_extendedprice * (1 + l_tax) * (1 - l_discount)"
            " * 100 + 0.5) AS BIGINT)"
        ).alias("cents"),
    )
    calc = li.groupBy("okey").agg(F.sum("cents").alias("calc_cents"))
    od = t["orders"].select(
        F.col("o_orderkey").alias("okey"),
        "o_orderpriority",
        F.expr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        ).alias("stored_cents"),
    )
    j = od.join(calc, "okey").withColumn(
        "diff", F.abs(F.col("stored_cents") - F.col("calc_cents"))
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum((F.col("diff") > 0).cast("long"))
        .cast("long")
        .alias("n_mismatched"),
        F.sum("diff").cast("long").alias("sum_abs_diff_cents"),
        F.max("diff").cast("long").alias("max_abs_diff_cents"),
    )


_PRICE_RECON_SQL = r"""
WITH calc AS (
  SELECT l_orderkey AS okey,
         sum(CAST(floor(l_extendedprice * (1 + l_tax) * (1 - l_discount)
                        * 100 + 0.5) AS BIGINT))::BIGINT AS calc_cents
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT o_orderpriority,
         abs(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             - calc_cents) AS diff
  FROM orders JOIN calc ON o_orderkey = okey
)
SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
       sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END)::BIGINT AS n_mismatched,
       sum(diff)::BIGINT AS sum_abs_diff_cents,
       max(diff)::BIGINT AS max_abs_diff_cents
FROM j GROUP BY 1
"""


def date_gaps_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-completeness calendar: per month, how many calendar days
    have NO orders — the "did ingestion skip days" audit run before any
    time-series computation trusts the data. Distinct order dates per
    (year, month) vs the month's calendar length (``last_day`` — pure
    calendar arithmetic, locale-free on both engines); the first and
    last observed months are flagged partial (their gaps are expected).
    Output is month-cardinality."""
    t = load_tables(spark, sf_dir, "orders")
    d = t["orders"].select(F.col("o_orderdate").alias("dt"))
    bym = d.groupBy(
        F.year("dt").alias("y"), F.month("dt").alias("m")
    ).agg(
        F.countDistinct("dt").cast("long").alias("days_observed"),
        F.dayofmonth(F.last_day(F.min("dt"))).cast("long").alias(
            "days_in_month"
        ),
    )
    wt = Window.partitionBy()
    flagged = (
        bym.withColumn(
            "__ym", F.col("y") * 100 + F.col("m")
        )
        .withColumn("__mn", F.min("__ym").over(wt))
        .withColumn("__mx", F.max("__ym").over(wt))
    )
    return flagged.select(
        F.col("y").cast("int").alias("year"),
        F.col("m").cast("int").alias("month"),
        "days_observed",
        "days_in_month",
        (F.col("days_in_month") - F.col("days_observed"))
        .cast("long")
        .alias("missing_days"),
        (
            (F.col("__ym") == F.col("__mn"))
            | (F.col("__ym") == F.col("__mx"))
        ).cast("int").alias("is_partial_month"),
    )


_DATE_GAPS_SQL = r"""
WITH bym AS (
  SELECT year(o_orderdate)::INT AS y, month(o_orderdate)::INT AS m,
         count(DISTINCT o_orderdate)::BIGINT AS days_observed,
         day(last_day(min(o_orderdate)))::BIGINT AS days_in_month
  FROM orders GROUP BY 1, 2
),
f AS (
  SELECT *, y * 100 + m AS ym,
         min(y * 100 + m) OVER () AS mn,
         max(y * 100 + m) OVER () AS mx
  FROM bym
)
SELECT y AS year, m AS month, days_observed, days_in_month,
       (days_in_month - days_observed)::BIGINT AS missing_days,
       (CASE WHEN ym = mn OR ym = mx THEN 1 ELSE 0 END)::INT
         AS is_partial_month
FROM f
"""


WAVE4_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "encoding_audit_documents": encoding_audit_documents,
    "fano_dispersion_events": fano_dispersion_events,
    "decile_shift_events": decile_shift_events,
    "image_dhash_documents": image_dhash_documents,
    "image_dhash_near_pairs_documents": image_dhash_near_pairs_documents,
    "did_estimator_events": did_estimator_events,
    "allocation_hamilton_documents": allocation_hamilton_documents,
    "shard_rebalance_documents": shard_rebalance_documents,
    "vocab_shift_documents": vocab_shift_documents,
    "threshold_pick_embeddings": threshold_pick_embeddings,
    "trend_break_events": trend_break_events,
    "weekday_adjusted_anomaly_events": weekday_adjusted_anomaly_events,
    "price_reconciliation_orders": price_reconciliation_orders,
    "date_gaps_orders": date_gaps_orders,
}

WAVE4_ORACLE_SQL: dict[str, str] = {
    "encoding_audit_documents": _encoding_sql(),
    "fano_dispersion_events": _FANO_SQL,
    "decile_shift_events": _DECILE_SHIFT_SQL,
    "image_dhash_documents": _image_dhash_sql(),
    "image_dhash_near_pairs_documents": _image_dhash_pairs_sql(),
    "did_estimator_events": _DID_SQL,
    "allocation_hamilton_documents": _HAMILTON_SQL,
    "shard_rebalance_documents": _SHARD_REBALANCE_SQL,
    "vocab_shift_documents": _vocab_shift_sql(),
    "threshold_pick_embeddings": _THRESHOLD_PICK_SQL,
    "trend_break_events": _TREND_BREAK_SQL,
    "weekday_adjusted_anomaly_events": _WDAY_ANOM_SQL,
    "price_reconciliation_orders": _PRICE_RECON_SQL,
    "date_gaps_orders": _DATE_GAPS_SQL,
}
