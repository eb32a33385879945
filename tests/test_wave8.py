"""Round-13 regression tests: the four round-12 ADVICE items.

1. GEMM in-cell dominance with a >6-decimal threshold must make the same
   decisions as the join path (bound_units derivation, ADVICE medium).
2. GEMM in-cell dominance must accept non-integer id columns the join
   path always accepted (schema/dtype generalization, ADVICE low).
3. offset_size / responseSize < 1 is rejected at construction on every
   face (ADVICE low — a 0 page size loops the sweep forever).
4. readBetweenOffsets raises when the cursor chain ends short of the
   committed end offset instead of returning a truncated row set
   (ADVICE low — fail-don't-truncate on API shrink).
"""
import math

import pytest


def _assigned_frame(spark, rows, id_ddl="vec_id long"):
    """Hand-built dominance input: (id, cid, vec, __n, cent_cos)."""
    ddl = f"{id_ddl}, cid long, vec array<double>, __n double, cent_cos double"
    return spark.createDataFrame(rows, ddl)


def _norm(vec):
    acc = 0.0
    for x in vec:
        acc += x * x
    return math.sqrt(acc)


def test_incell_dominance_seven_decimal_threshold(spark):
    """threshold=0.7000004 (not a 6-decimal multiple): a pair whose
    cosine rounds to 0.700000 sits in [round(t*1e6)*1e-6, t) — the old
    round()-derived bound pruned it on the GEMM path while the join path
    kept it. Both paths must agree, and must keep it."""
    from arcane_framework_spark.operators.similarity import (
        _incell_dominance_gemm,
        _incell_dominance_join,
    )

    c = 0.7000002  # rounds half-up at 6 decimals to 0.700000 < threshold
    v1 = [1.0, 0.0]
    v2 = [c, math.sqrt(1.0 - c * c)]
    p = 0.9999  # a genuinely-dominated pair in another cell
    v4 = [p, math.sqrt(1.0 - p * p)]
    rows = [
        (1, 0, v1, _norm(v1), 0.9),
        (2, 0, v2, _norm(v2), 0.8),
        (3, 1, v1, _norm(v1), 0.9),
        (4, 1, v4, _norm(v4), 0.8),
    ]
    assigned = _assigned_frame(spark, rows)
    threshold = 0.7000004
    join_out = sorted(
        (r.vec_id, r.cid, r.pruned)
        for r in _incell_dominance_join(assigned, "vec_id", threshold).collect()
    )
    gemm_out = sorted(
        (r.vec_id, r.cid, r.pruned)
        for r in _incell_dominance_gemm(assigned, "vec_id", threshold).collect()
    )
    assert gemm_out == join_out
    by_id = dict((i, pruned) for i, _, pruned in gemm_out)
    assert by_id[2] is False  # rounded 0.700000 < 0.7000004: kept
    assert by_id[4] is True   # cosine ~0.9999: pruned in both paths


def test_incell_dominance_threshold_below_six_decimal_grid(spark):
    """The mirrored case: threshold=0.6999996 must PRUNE a pair whose
    cosine rounds to 0.700000 on both paths (smallest-k bound, not
    nearest-k)."""
    from arcane_framework_spark.operators.similarity import (
        _incell_dominance_gemm,
        _incell_dominance_join,
    )

    c = 0.7000002
    v1 = [1.0, 0.0]
    v2 = [c, math.sqrt(1.0 - c * c)]
    rows = [(1, 0, v1, _norm(v1), 0.9), (2, 0, v2, _norm(v2), 0.8)]
    assigned = _assigned_frame(spark, rows)
    threshold = 0.6999996
    join_out = sorted(
        (r.vec_id, r.pruned)
        for r in _incell_dominance_join(assigned, "vec_id", threshold).collect()
    )
    gemm_out = sorted(
        (r.vec_id, r.pruned)
        for r in _incell_dominance_gemm(assigned, "vec_id", threshold).collect()
    )
    assert gemm_out == join_out
    assert dict(gemm_out)[2] is True  # 0.700000 >= 0.6999996: pruned


def test_incell_dominance_string_ids(spark):
    """Non-integer id columns: the join path always accepted them; the
    GEMM path must too (output schema follows the input id type, id
    tiebreak is the same lexicographic `<`)."""
    from arcane_framework_spark.operators.similarity import (
        _incell_dominance_gemm,
        _incell_dominance_join,
    )

    p = 0.95
    v1 = [1.0, 0.0]
    v2 = [p, math.sqrt(1.0 - p * p)]
    rows = [
        ("doc-x", 0, v1, _norm(v1), 0.5),  # tie on cent_cos -> id tiebreak
        ("doc-y", 0, v2, _norm(v2), 0.5),
        ("doc-z", 1, v1, _norm(v1), 0.5),  # singleton cell
    ]
    assigned = _assigned_frame(spark, rows, id_ddl="doc_id string")
    gemm = _incell_dominance_gemm(assigned, "doc_id", 0.9)
    assert gemm.schema["doc_id"].dataType.simpleString() == "string"
    gemm_out = sorted(
        (r.doc_id, r.pruned) for r in gemm.collect()
    )
    join_out = sorted(
        (r.doc_id, r.pruned)
        for r in _incell_dominance_join(assigned, "doc_id", 0.9).collect()
    )
    assert gemm_out == join_out
    assert gemm_out == [("doc-x", False), ("doc-y", True), ("doc-z", False)]


def test_offset_size_rejected_below_one():
    """offset_size=0 would loop the batch sweep forever and make the
    streaming face refetch the same offset every trigger — every face
    rejects it at construction."""
    import json as _json

    from pyspark.sql.types import LongType, StructField, StructType

    from arcane_framework_spark.plans.spec import PageResolverConfiguration
    from arcane_framework_spark.sources.rest import PageOffsetResolver
    from arcane_framework_spark.sources.rest_datasource import (
        RestReader,
        options_from_spec,
    )

    schema = StructType([StructField("id", LongType())])
    with pytest.raises(ValueError, match="offset_size"):
        RestReader(schema, {
            "url_template": "http://127.0.0.1:9/d?off=@page",
            "offset_size": "0",
        })
    with pytest.raises(ValueError, match="responseSize"):
        options_from_spec(_json.dumps({"options": {
            "urlTemplate": "http://127.0.0.1:9/d?off=@theOffset",
            "templatedFields": [
                {"fieldType": "RESPONSE_PAGE", "fieldName": "theOffset",
                 "placement": "URL"},
            ],
            "pageResolver": {
                "resolverType": "OFFSET",
                "resolverPropertyKeyChain": ["items"],
                "responseSize": 0,
            },
            "responsePropertyKeyChain": ["items"],
            "schemaDdl": "id LONG",
        }}))
    with pytest.raises(ValueError, match="responseSize"):
        PageResolverConfiguration.from_dict({
            "resolverType": "OFFSET",
            "resolverPropertyKeyChain": ["items"],
            "responseSize": 0,
        })
    with pytest.raises(ValueError, match="response_size"):
        PageOffsetResolver(["items"], response_size=0)


def test_replay_shrunk_api_raises_instead_of_truncating():
    """A committed offset range must replay in full: if the cursor chain
    goes terminal ('done') before reaching the committed end — the API
    shrank between the original read and the replay — the task fails
    instead of committing a truncated row set."""
    from pyspark.sql.types import LongType, StructField, StructType

    from arcane_framework_spark.sources.rest_datasource import (
        RestStreamReader,
    )

    schema = StructType([StructField("id", LongType())])

    # token mode: chain now ends at t1, but t2 was committed
    reader = RestStreamReader(schema, {
        "url_template": "http://127.0.0.1:9/d?token=@token",
        "key_chain": "items",
        "next_token_key_chain": "next",
    })

    def shrunk_read_token(cur):
        if cur.get("token") == "":
            return iter([(1,)]), {"token": "t1"}
        return iter([(2,)]), {"token": "t1", "done": 1}

    reader._read_token = shrunk_read_token
    with pytest.raises(RuntimeError, match="before committed end"):
        list(reader.readBetweenOffsets({"token": ""}, {"token": "t2"}))

    # offset mode: API shrank to one short page, but off=200 was committed
    off_reader = RestStreamReader(schema, {
        "url_template": "http://127.0.0.1:9/d?off=@page",
        "key_chain": "items",
        "offset_size": "100",
    })

    def shrunk_read_offset(cur):
        if cur.get("done"):
            return iter([]), cur
        return iter([(1,)]), {"off": int(cur["off"]), "done": 1}

    off_reader._read_offset = shrunk_read_offset
    with pytest.raises(RuntimeError, match="before committed end"):
        list(off_reader.readBetweenOffsets({"off": 0}, {"off": 200}))

    # the intact chain still replays cleanly to the committed end
    ok_reader = RestStreamReader(schema, {
        "url_template": "http://127.0.0.1:9/d?token=@token",
        "key_chain": "items",
        "next_token_key_chain": "next",
    })

    def ok_read_token(cur):
        if cur.get("token") == "":
            return iter([(1,)]), {"token": "t1"}
        return iter([(2,)]), {"token": "t2"}

    ok_reader._read_token = ok_read_token
    rows = list(ok_reader.readBetweenOffsets({"token": ""}, {"token": "t2"}))
    assert rows == [(1,), (2,)]


def test_anchored_xxhash64_decision_equivalence(spark):
    """Round-12 verdict #1: the production xxhash64 token->anchor hash
    must make the same REMOVAL decisions as the md5 gate path on the
    planted offset-copy corpus — both remove the interior of every
    planted copy (offsets 1..7), both remove nothing from unique docs,
    and the per-doc removed-token counts differ only by span-edge
    segments (cut positions differ; the offset-invariance property does
    not)."""
    from arcane_framework_spark.operators.dedup import (
        anchored_substring_stats,
    )

    span = " ".join(f"body{i}" for i in range(400))
    docs = (
        [(0, span)]
        + [
            (m, " ".join(f"fill{m}q{j}" for j in range(m)) + " " + span)
            for m in range(1, 8)
        ]
        + [
            (100 + u, " ".join(f"uniq{u}t{j}" for j in range(120)))
            for u in range(4)
        ]
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {}
    for hf in ("md5", "xxhash64"):
        out[hf] = {
            r["doc_id"]: r["removed_tokens"]
            for r in anchored_substring_stats(df, hash_fn=hf).collect()
        }
        assert out[hf][0] == 0, hf  # first occurrence kept
        for u in range(4):
            assert out[hf][100 + u] == 0, hf  # unique docs untouched
        for m in range(1, 8):
            # the planted 400-token span's interior is removed at every
            # offset — the offset-invariance contract, under EITHER hash
            assert out[hf][m] >= 300, (hf, m, out[hf][m])
    for m in range(1, 8):
        # agreement is quantified, not assumed: only span-edge segments
        # (geometric, mean SEGMENT_WIDTH=8) may differ between hashes
        assert abs(out["md5"][m] - out["xxhash64"][m]) <= 80, m


def test_anchored_xxhash64_rejects_unknown_hash(spark):
    import pytest as _pytest

    from arcane_framework_spark.operators.text import (
        anchored_segment_hashes,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="hash_fn"):
        anchored_segment_hashes(df, hash_fn="sha1")


def test_logging_properties_enrichment(spark, tmp_path, monkeypatch):
    """Contracts/Logging.cs analog (round-12 'what's missing' #3): the
    LOGGING_PROPERTIES env JSON enriches every log record (filter) and
    every metric observation (listener tags) — end-to-end with the env
    var set, including the unset -> no-op reference path."""
    import json as _json
    import logging as _logging
    import time as _time

    from arcane_framework_spark.streaming.metrics import (
        ROWS_INCOMING,
        CustomPropertiesFilter,
        RowsIncomingListener,
        SourceTags,
        custom_log_properties,
    )

    # unset -> the reference's pass-through path
    assert custom_log_properties(env={}) == {}

    monkeypatch.setenv(
        "STREAMCONTEXT__LOGGING_PROPERTIES",
        _json.dumps({"team": "ingest", "region": "weu"}),
    )
    assert custom_log_properties() == {"team": "ingest", "region": "weu"}

    # log-record enrichment, the Serilog Enrich.WithProperty loop
    logger = _logging.getLogger("arcane-test-logging-props")
    records = []
    handler = _logging.Handler()
    handler.emit = records.append
    logger.addHandler(handler)
    logger.addFilter(CustomPropertiesFilter())
    try:
        logger.warning("tick")
    finally:
        logger.removeHandler(handler)
    assert records and records[0].team == "ingest"
    assert records[0].region == "weu"

    # metric-tag enrichment end-to-end through a real streaming query
    src = tmp_path / "logprops"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(_json.dumps({"id": i}) for i in range(3))
    )
    listener = RowsIncomingListener(SourceTags(stream_id="s-lp"))
    spark.streams.addListener(listener)
    try:
        q = (
            spark.readStream.schema("id LONG").json(str(src))
            .writeStream.format("memory").queryName("logprops_t")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        deadline = _time.time() + 30
        while _time.time() < deadline and not listener.observations:
            _time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)
    obs = [o for o in listener.observations if o.name == ROWS_INCOMING]
    assert obs and obs[0].tags["team"] == "ingest"
    assert obs[0].tags["arcane.stream_id"] == "s-lp"  # tags win collisions
