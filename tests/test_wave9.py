"""Round-14 regression tests: the round-13 verdict + ADVICE items.

1. The GEMM assignment family guards degenerate inputs: an EMPTY
   centroids frame returns the join path's empty (id, vec, cid) frame
   instead of crashing in ``V @ C.T`` (verdict #2 / ADVICE), and a
   non-integral centroid-id column is rejected loudly at plan
   construction on every path (the (cos, -cid) tie-break needs numeric
   negation; the join path silently nulled the tie-break key).
2. The routed GEMM's output cid type follows the centroids schema like
   the exact path, instead of a hardcoded ``cid long`` (ADVICE).
3. ``@slot`` placeholder substitution is name-boundary-aware on every
   face: ``@to`` never corrupts ``@token``/``@total`` (verdict #4).
4. Counter-mode replay treats a chain that goes terminal AT the
   committed end position as success — a totalPages that shrank to
   exactly the committed end page must not permanently wedge recovery
   of a fully-replayable range (ADVICE).
5. ``StreamSpec.from_dict`` resolves ``pageResolver`` with explicit
   None checks: an explicit-but-empty ``{}`` config raises loudly from
   ``PageResolverConfiguration.from_dict`` instead of being silently
   dropped by truthiness (ADVICE).
6. ``custom_log_properties`` names the env var and the expected shape
   when the payload is valid JSON but not an object (verdict #5).
"""
import json

import pytest


def _centroids(spark, rows, ddl="cid long, cvec array<double>"):
    return spark.createDataFrame(rows, ddl)


def _vectors(spark):
    return spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )


def test_ivf_assign_empty_centroids_both_paths(spark):
    """k = 0: both methods return the same EMPTY (id, vec, cid) frame —
    the GEMM path used to crash in ``V @ C.T`` (shape-(0,) C) and the
    ``best[1]`` deref before producing a task error."""
    from arcane_framework_spark.operators.similarity import ivf_assign

    vecs = _vectors(spark)
    empty = _centroids(spark, [])
    for method in ("gemm", "join"):
        out = ivf_assign(vecs, empty, method=method)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == ["id", "vec", "cid"]
        assert out.schema["cid"].dataType.simpleString() == "bigint"


def test_ivf_assign_routed_empty_centroids(spark):
    """The routed twin's k = 0 contract matches: empty frame, no crash
    in the coarse GEMM."""
    from arcane_framework_spark.operators.similarity import (
        ivf_assign_routed,
    )

    out = ivf_assign_routed(_vectors(spark), _centroids(spark, []))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "vec", "cid"]


def test_ivf_assign_rejects_non_integral_cid(spark):
    """String centroid ids fail LOUDLY at plan construction on every
    path: the GEMM packs ids into int64 and both paths tie-break on
    -cid, which for a string silently casts to null on the join path."""
    from arcane_framework_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_routed,
    )

    vecs = _vectors(spark)
    scent = _centroids(
        spark, [("a", [1.0, 0.0])], "cid string, cvec array<double>"
    )
    for method in ("gemm", "join"):
        with pytest.raises(ValueError, match="integral centroid-id"):
            ivf_assign(vecs, scent, method=method)
        with pytest.raises(ValueError, match="integral centroid-id"):
            ivf_assign_routed(vecs, scent, method=method)


def test_ivf_assign_routed_cid_type_follows_centroids(spark):
    """ADVICE: the routed GEMM hardcoded ``cid long``; an int cid column
    must keep its type, matching the exact GEMM path and the join path."""
    from arcane_framework_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_routed,
    )

    vecs = _vectors(spark)
    icent = _centroids(
        spark,
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "cid int, cvec array<double>",
    )
    routed = ivf_assign_routed(vecs, icent, method="gemm")
    exact = ivf_assign(vecs, icent, method="gemm")
    join = ivf_assign(vecs, icent, method="join")
    assert (
        routed.schema["cid"].dataType.simpleString()
        == exact.schema["cid"].dataType.simpleString()
        == join.schema["cid"].dataType.simpleString()
        == "int"
    )
    # decisions still land (trivial geometry: each vector has an exact
    # matching centroid)
    assert sorted((r.id, r.cid) for r in routed.collect()) == [(1, 1), (2, 2)]


def test_sub_placeholder_is_boundary_aware():
    """``@to`` must never capture the prefix of ``@token``/``@total`` —
    plain str.replace corrupted any longer placeholder a slot name is a
    prefix of, regardless of substitution order."""
    from arcane_framework_spark.sources.rest import sub_placeholder

    t = "http://api/d?until=@to&tok=@token&n=@total&again=@to"
    out = sub_placeholder(t, "to", "2020")
    assert out == "http://api/d?until=2020&tok=@token&n=@total&again=2020"
    # replacement values with regex metacharacters stay literal
    assert sub_placeholder("x=@v", "v", r"a\1$&") == r"x=a\1$&"


def test_rest_template_resolve_boundary_aware():
    """Driver-loop face: a declared ``to`` field must not corrupt an
    UNDECLARED ``@token`` left in the template for a later stage."""
    from arcane_framework_spark.sources.rest import RestApiTemplate

    tpl = RestApiTemplate("http://api/d?until=@to&tok=@token", ["to"])
    out = tpl.resolve_field("to", "2020-01-01").resolve()
    assert out == "http://api/d?until=2020-01-01&tok=@token"


def test_render_boundary_aware():
    """DataSource face: rendering the ``to`` slot leaves ``@token``
    intact in both the URL and the body template."""
    from pyspark.sql.types import LongType, StructField, StructType

    from arcane_framework_spark.sources.rest_datasource import RestReader

    schema = StructType([StructField("id", LongType())])
    reader = RestReader(schema, {
        "url_template": "http://127.0.0.1:9/d?page=@page&until=@to&t=@token",
        "body_template": '{"until": "@to", "token": "@token"}',
        "pages": "1",
        "key_chain": "items",
    })
    url, body = reader._render(to="2020", page=3)
    assert url == "http://127.0.0.1:9/d?page=3&until=2020&t=@token"
    assert body == '{"until": "2020", "token": "@token"}'


def test_spec_sub_boundary_aware():
    """Spec translation: rewriting the page field to the internal
    ``@page`` slot must not corrupt a user placeholder the field name is
    a prefix of."""
    from arcane_framework_spark.sources.rest_datasource import (
        options_from_spec,
    )

    out = options_from_spec(json.dumps({"options": {
        # field 'p' is a prefix of the literal placeholder '@pk' that a
        # later stage owns — the rewrite must leave '@pk' alone
        "urlTemplate": "http://127.0.0.1:9/d?page=@p&k=@pk",
        "templatedFields": [
            {"fieldType": "RESPONSE_PAGE", "fieldName": "p",
             "placement": "URL"},
        ],
        "pageResolver": {
            "resolverType": "COUNTER",
            "resolverPropertyKeyChain": ["total"],
        },
        "responsePropertyKeyChain": ["items"],
        "schemaDdl": "id LONG",
    }}))
    assert out["url_template"] == "http://127.0.0.1:9/d?page=@page&k=@pk"


def test_counter_replay_done_at_committed_end_succeeds():
    """ADVICE: totalPages shrank to EXACTLY the committed end page — the
    replay cursor is {'page': N, 'done': 1} vs a committed end of
    {'page': N}; every committed page was fetched in full, so the
    replay must return the rows, not wedge recovery forever. A chain
    that goes terminal SHORT of the end still raises."""
    from pyspark.sql.types import LongType, StructField, StructType

    from arcane_framework_spark.sources.rest_datasource import (
        RestStreamReader,
    )

    schema = StructType([StructField("id", LongType())])
    reader = RestStreamReader(schema, {
        "url_template": "http://127.0.0.1:9/d?page=@page",
        "key_chain": "items",
        "pages_key_chain": "total",
    })

    def shrunk_to_end(cur):
        if cur.get("done"):
            return iter([]), cur
        nxt = int(cur["page"]) + 1
        # API now reports total=2: page 2 is terminal
        if nxt >= 2:
            return iter([(nxt,)]), {"page": nxt, "done": 1}
        return iter([(nxt,)]), {"page": nxt}

    reader._read_counter = shrunk_to_end
    # originally committed WITHOUT done: pages 1..2 were read while
    # total was still 3
    rows = list(reader.readBetweenOffsets({"page": 0}, {"page": 2}))
    assert rows == [(1,), (2,)]

    # terminal short of the committed end position still fails loudly
    with pytest.raises(RuntimeError, match="before committed end"):
        list(reader.readBetweenOffsets({"page": 0}, {"page": 5}))


def test_stream_spec_empty_page_resolver_raises():
    """An explicit top-level ``pageResolver: {}`` reaches from_dict and
    raises on the missing resolverType instead of being silently
    dropped by truthiness (the stream would run unpaginated)."""
    from arcane_framework_spark.plans.spec import StreamSpec

    with pytest.raises((KeyError, ValueError)):
        StreamSpec.from_dict({"pageResolver": {}})
    with pytest.raises((KeyError, ValueError)):
        StreamSpec.from_dict({"options": {"pageResolver": {}}})
    # top level wins over nested when both are present
    spec = StreamSpec.from_dict({
        "pageResolver": {
            "resolverType": "COUNTER",
            "resolverPropertyKeyChain": ["a", "b"],
        },
        "options": {"pageResolver": {
            "resolverType": "TOKEN",
            "resolverPropertyKeyChain": ["nested"],
        }},
    })
    assert spec.page_resolver.resolver_type == "COUNTER"
    assert list(spec.page_resolver.resolver_property_key_chain) == ["a", "b"]


def test_logging_properties_non_object_error_names_env_var():
    """Valid JSON that is not an object fails loudly AND helpfully:
    the error names the env var and the expected shape."""
    from arcane_framework_spark.streaming.metrics import (
        ENV_LOGGING_PROPERTIES,
        custom_log_properties,
    )

    with pytest.raises(ValueError, match="LOGGING_PROPERTIES"):
        custom_log_properties({ENV_LOGGING_PROPERTIES: "[1, 2]"})
    with pytest.raises(ValueError, match="JSON object"):
        custom_log_properties({ENV_LOGGING_PROPERTIES: '"just a string"'})
    # the object path still parses
    assert custom_log_properties(
        {ENV_LOGGING_PROPERTIES: '{"a": 1}'}
    ) == {"a": "1"}


def test_streaming_priority_sample_multibatch_equals_batch(spark, tmp_path):
    """X191: the DLT sample is batching-independent — draining the same
    corpus one file per trigger yields the identical sample (rows AND
    estimator weights) as the batch entry."""
    from pyspark.sql import functions as F

    from arcane_framework_spark.queries_wave8 import (
        priority_sample_documents,
        run_priority_sample_stream,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    arrivals_dir = str(tmp_path / "arrivals")
    # 5 single-slice files -> 5 micro-batches
    for i in range(5):
        docs.filter(F.col("doc_id") % 5 == i).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(arrivals_dir)

    stream = (
        spark.readStream.schema("doc_id long, source string, n_chars long")
        .option("maxFilesPerTrigger", "1")
        .parquet(arrivals_dir)
    )
    streamed = sorted(
        tuple(r) for r in run_priority_sample_stream(spark, stream).collect()
    )
    batch = sorted(
        tuple(r)
        for r in priority_sample_documents(spark, sf_dir).collect()
    )
    assert streamed == batch and len(batch) > 0
