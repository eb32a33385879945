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


def test_ivf_assign_gemm_matches_join_path(spark):
    """Round-12 verdict #2: the GEMM assignment (exact and routed) must
    make bit-identical (cos, -cid) argmax decisions to the max_by join
    path — including exact ties (duplicate centroids -> lowest cid) and
    near-ties inside the boundary band."""
    import random

    from arcane_framework_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_routed,
        kmeans_fit,
    )

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = kmeans_fit(df, k=None, iterations=2, target_cell_size=32)
    for fn in (ivf_assign, ivf_assign_routed):
        join_out = sorted(
            (r.id, r.cid) for r in fn(df, cent, method="join").collect()
        )
        gemm_out = sorted(
            (r.id, r.cid) for r in fn(df, cent, method="gemm").collect()
        )
        assert gemm_out == join_out and len(gemm_out) == len(rows)

    # exact tie: two identical centroids with different cids -> every
    # vector on that side must pick the LOWER cid under both methods
    cent2 = spark.createDataFrame(
        [(5, [1.0] * 16), (3, [1.0] * 16), (9, [-1.0] * 16)],
        "cid long, cvec array<double>",
    )
    join_out = sorted(
        (r.id, r.cid) for r in ivf_assign(df, cent2, method="join").collect()
    )
    gemm_out = sorted(
        (r.id, r.cid) for r in ivf_assign(df, cent2, method="gemm").collect()
    )
    assert gemm_out == join_out
    assert {c for _, c in gemm_out} <= {3, 9}  # cid 5 never wins its tie


def test_ivf_assign_gemm_plan_has_no_exchange(spark):
    """The GEMM assignment's reason to exist at 100 TB: the join path
    shuffles N x k scored rows through a groupBy argmax plus a join back;
    the mapInPandas path must introduce NO exchange."""
    from arcane_framework_spark.operators.similarity import ivf_assign

    df = spark.createDataFrame(
        [(i, [float(i % 7), 1.0]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, cvec array<double>"
    )
    plan = (
        ivf_assign(df, cent, method="gemm")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_rest_datasource_post_body_travels(spark):
    """Round-12 verdict #5: BODY-placed templated fields travel on the
    format('arcane_rest') face — the COUNTER-paged spec renders its page
    number AND date filter into the POST payload (the URL carries
    neither), and the result matches the driver-loop face running the
    SAME spec (parity on rows and on the bodies the server saw)."""
    import http.server
    import json as _json
    import threading

    from arcane_framework_spark.plans import spec as spec_mod
    from arcane_framework_spark.sources.rest import rest_source_from_spec
    from arcane_framework_spark.sources.rest_datasource import RestDataSource

    TOTAL_PAGES = 3
    bodies = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            payload = _json.loads(self.rfile.read(n).decode())
            bodies.append((self.path, payload))
            page = int(payload.get("page", -1))
            out = _json.dumps({
                "meta": {"totalPages": TOTAL_PAGES},
                "items": [
                    {"id": page * 10 + j,
                     "name": f"{payload['updatedAfter']}-p{page}"}
                    for j in range(2)
                ],
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *args):
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    spark.dataSource.register(RestDataSource)
    spec_json = _json.dumps({"options": {
        "urlTemplate": f"http://127.0.0.1:{port}/search",
        "bodyTemplate": '{"page": "@p", "updatedAfter": "@d"}',
        "templatedFields": [
            {"fieldType": "RESPONSE_PAGE", "fieldName": "p",
             "placement": "BODY"},
            {"fieldType": "FILTER_DATE_FROM", "fieldName": "d",
             "formatString": "%Y-%m-%d", "placement": "BODY"},
        ],
        "pageResolver": {"resolverType": "COUNTER",
                         "resolverPropertyKeyChain": ["meta", "totalPages"]},
        "responsePropertyKeyChain": ["items"],
        "schemaDdl": "id LONG, name STRING",
        "backfillStartUnixMillis": 1577836800000,  # 2020-01-01
    }})
    want = sorted(
        (p * 10 + j, f"2020-01-01-p{p}")
        for p in range(1, TOTAL_PAGES + 1) for j in range(2)
    )
    try:
        native = (
            spark.read.format("arcane_rest")
            .option("spec", spec_json)
            .load()
        )
        got = sorted((r.id, r.name) for r in native.collect())
        assert got == want
        # every page went out as a POST body; the URL carried no params
        assert all(path == "/search" for path, _ in bodies)
        assert {int(b["page"]) for _, b in bodies} == {1, 2, 3}
        assert all(b["updatedAfter"] == "2020-01-01" for _, b in bodies)

        # driver-loop parity: the SAME spec through rest_source_from_spec
        bodies.clear()
        env = {spec_mod.ENV_BACKFILL: "true", spec_mod.ENV_SPEC: spec_json}
        source = rest_source_from_spec(spark, spec_mod.from_env(env))
        loop_got = sorted(
            (r.id, r.name) for r in source.fetch_batch().collect()
        )
        assert loop_got == want
    finally:
        server.shutdown()


def test_seen_state_compaction_bounds_file_count(spark, tmp_path):
    """Round-12 verdict #4: the streaming seen-state gets a compaction
    story. With compact_files_per_bucket set, the X47 planner triggers a
    bucketed generation rewrite; across many ticks the live state's file
    count stays bounded while the no-compaction twin's grows, decisions
    are identical, and the state keeps its bucketing (the exchange-free
    contract is structural in the bucket layout, asserted separately in
    test_wave7)."""
    import glob as _glob
    import os as _os

    from arcane_framework_spark.queries_wave6 import (
        run_substring_dedup_stream,
    )

    # 8 single-doc arrival files -> 8 ticks with maxFilesPerTrigger=1;
    # every doc shares a span so decisions involve real removals
    span = " ".join(f"sharedspan{j}" for j in range(24))
    arrivals_dir = str(tmp_path / "arrivals")
    for i in range(8):
        spark.createDataFrame(
            [(1000 + i, f"lead{i} " + span)], "doc_id long, text string"
        ).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(arrivals_dir)

    sf_dir = "/root/testdata/sf0.001"

    def run(seen_dir, compact):
        acc = []
        run_substring_dedup_stream(
            spark, sf_dir, seen_dir,
            lambda out, bid: acc.extend(
                (bid, r.doc_id, r.removed_tokens) for r in out.collect()
            ),
            max_files_per_trigger=1,
            arrival_source=arrivals_dir,
            compact_files_per_bucket=compact,
        )
        return sorted(acc)

    plain_dir = str(tmp_path / "seen_plain")
    comp_dir = str(tmp_path / "seen_comp")
    plain = run(plain_dir, None)
    compacted = run(comp_dir, 1)
    assert compacted == plain and len(plain) == 8  # identical decisions

    def parquet_count(d):
        return len(_glob.glob(_os.path.join(d, "*.parquet")))

    gens = sorted(_glob.glob(comp_dir + "_g*"))
    assert gens, "no compaction generation was ever written"
    # round-13 verdict #6: each swap GCs its predecessor, so only the
    # LIVE generation dir remains — the seed dir and every superseded
    # generation are gone from disk
    assert len(gens) == 1, gens
    assert not _os.path.exists(comp_dir), "superseded seed dir survived"
    final_gen = max(gens, key=lambda d: int(d.rsplit("_g", 1)[1]))
    # the live generation holds at most one rewrite (one file per busy
    # bucket) plus at most one tick's appends; the no-compaction state
    # accumulated every tick's appends on top of the seed
    assert parquet_count(final_gen) < parquet_count(plain_dir), (
        parquet_count(final_gen), parquet_count(plain_dir)
    )
