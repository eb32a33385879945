"""Round-14 second-wave optimization equivalence tests.

Each test pins an operator whose INTERNALS changed for performance to a
reference implementation of the old shape — the optimization contract is
"same results, fewer/cheaper jobs", so the reference is computed inline
the slow way and compared exactly.
"""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# norm_grams: Arrow-batched gram build == expression-HOF build, byte for
# byte INCLUDING array order (dict.fromkeys preserves first occurrence,
# matching array_distinct).
# ---------------------------------------------------------------------------


def _expression_norm_grams(df, text_col="text", id_col="doc_id"):
    from arcane_framework_spark.operators.dedup import char_ngrams_from_norm

    norm = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
            )
        ).alias("s"),
    )
    return norm.select(
        "id", "s", char_ngrams_from_norm(F.col("s")).alias("grams")
    )


def test_norm_grams_matches_expression_form(spark):
    from arcane_framework_spark.operators.dedup import norm_grams

    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "aaaaaaa"),            # heavy duplicate grams (order matters)
        (3, "abc"),                # shorter than one gram -> whole text
        (4, ""),                   # empty -> [""]
        (5, "  Mixed   CASE   and   spaces  "),
        (6, "naïve café résumé"),  # non-ASCII code points
        (7, "abcabcabcabc"),       # periodic text, interleaved dup grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = norm_grams(df).orderBy("id").collect()
    want = _expression_norm_grams(df).orderBy("id").collect()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.id == w.id
        assert g.s == w.s
        # exact list equality: content AND order
        assert list(g.grams) == list(w.grams), g.id


# ---------------------------------------------------------------------------
# simhash: chunked-nibble integer votes == per-digit string votes.
# ---------------------------------------------------------------------------


def test_simhash_bit_votes_match_string_votes(spark):
    from arcane_framework_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_signatures,
        tokens_expr,
    )

    rows = [(i, f"token{i} shared words appear here row {i * 7 % 5}")
            for i in range(40)] + [(99, ""), (100, "one")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    votes = (
        df.select(
            F.col("doc_id").alias("id"),
            F.explode(tokens_expr("text")).alias("t"),
        )
        .withColumn("h", F.md5("t"))
        .groupBy("id")
        .agg(
            *[
                F.sum(
                    F.when(F.substring("h", p, 1) >= "8", 1).otherwise(-1)
                ).alias(f"v{p}")
                for p in range(1, SIMHASH_BITS + 1)
            ]
        )
    )
    bit_cols = [
        F.when(F.col(f"v{p}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for p in range(1, SIMHASH_BITS + 1)
    ]
    want = {
        r.id: r.simhash
        for r in votes.select(
            "id", F.concat(*bit_cols).alias("simhash")
        ).collect()
    }
    got = {r.id: r.simhash for r in simhash_signatures(df).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# prefix_filter_pairs: the positional filter + array_intersect verify must
# lose NO pair against brute-force all-pairs shingle Jaccard — exercised
# on a corpus with drift chains (the adversarial case for prefix/positional
# pruning: overlapping but shifted shingle sets).
# ---------------------------------------------------------------------------


def _brute_force_jaccard(spark, df, num, den):
    from arcane_framework_spark.operators.dedup import (
        _with_tokens,
        shingles_from_tokens,
    )

    sh = _with_tokens(df, "text", "doc_id").select(
        "id", shingles_from_tokens(F.col("toks")).alias("sh")
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sa"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sb"))
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sa", "sb")).alias("ni"),
            (F.size("sa") + F.size("sb")).alias("ns"),
        )
        .filter(F.col("ni") * den >= num * (F.col("ns") - F.col("ni")))
    )
    return {
        (r.id_a, r.id_b): (r.ni, r.ns - r.ni) for r in pairs.collect()
    }


def test_prefix_filter_positional_no_lost_pairs(spark):
    from arcane_framework_spark.operators.dedup import (
        PREFIX_JACCARD_DEN,
        PREFIX_JACCARD_NUM,
        prefix_filter_pairs,
    )

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = []
    # drift chain: each doc shifts the window by one word — neighbors are
    # near-dups, distant docs are not
    for i in range(12):
        rows.append((i, " ".join(words[i % 6:(i % 6) + 12])))
    # exact clones
    rows.append((100, rows[0][1]))
    rows.append((101, rows[0][1] + " extra"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_pairs(df).collect()
    }
    want = _brute_force_jaccard(
        spark, df, PREFIX_JACCARD_NUM, PREFIX_JACCARD_DEN
    )
    assert set(got) == set(want)
    for (ia, ib), (ni, nu) in want.items():
        assert got[(ia, ib)] == pytest.approx(round(ni / nu, 6))


def test_containment_pairs_positional_no_lost_pairs(spark):
    from arcane_framework_spark.operators.dedup import (
        CONTAIN_DEN,
        CONTAIN_NUM,
        _with_tokens,
        containment_pairs,
        shingles_from_tokens,
    )

    base = ("one two three four five six seven eight nine ten eleven "
            "twelve thirteen fourteen fifteen")
    rows = [
        (1, base),
        (2, "intro words then " + base + " and a long tail of other words "
            "that dilute jaccard far below any threshold whatsoever"),
        (3, "three four five six seven"),       # contained span
        (4, "unrelated content entirely here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    got = {
        (r.contained_id, r.container_id): r.containment
        for r in containment_pairs(df).collect()
    }

    sh = _with_tokens(df, "text", "doc_id").select(
        "id", shingles_from_tokens(F.col("toks")).alias("sh")
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sa"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sb"))
    want = {}
    for r in (
        a.join(b, F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sa", "sb")).alias("ni"),
            F.size("sa").alias("na"),
        )
        .filter(F.col("ni") * CONTAIN_DEN >= CONTAIN_NUM * F.col("na"))
        .collect()
    ):
        want[(r.id_a, r.id_b)] = round(r.ni / r.na, 6)
    assert got == want


# ---------------------------------------------------------------------------
# edit_distance_pairs: ids-only candidate distinct + text join-back keeps
# the pair set and distances (existing behavior tests cover semantics;
# this pins the refactor on a corpus with duplicate-heavy blocks).
# ---------------------------------------------------------------------------


def test_edit_distance_pairs_text_joinback(spark):
    from arcane_framework_spark.operators.dedup import edit_distance_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonite"),
        (3, "the quick brown fox jumps over the lazy cat tonight"),
        (4, "completely different text with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.edit_distance
        for r in edit_distance_pairs(df).collect()
    }
    # levenshtein("...dog tonight", "...dog tonite") = 2 (drop h->nothing?
    # gh->te is 2 substitutions/indels); compute the reference directly:
    import itertools

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    texts = dict(rows)
    want = {}
    for ia, ib in itertools.combinations(sorted(texts), 2):
        d = lev(texts[ia], texts[ib])
        if d <= 3 and abs(len(texts[ia]) - len(texts[ib])) <= 3:
            want[(ia, ib)] = d
    # blocking may legitimately miss pairs sharing no sketch gram, but on
    # this corpus the near-pairs share nearly all grams; require exact set
    assert got == want
