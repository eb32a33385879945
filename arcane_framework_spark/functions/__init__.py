"""Flat, ``pyspark.sql.functions``-style namespace for the engine's scalar
and signature expression library.

Everything here is a pure Column expression (JVM-side, codegen-friendly) or
a deterministic plan-time helper — importable as:

    from arcane_framework_spark import functions as AF
    df.select(AF.merge_key_expr(["pk1", "pk2"]), AF.fingerprint_expr("text"))

The definitions live with their operator families (contracts/, operators/);
this module is the stable public surface re-exporting them.
"""

from arcane_framework_spark.contracts.columns import (
    merge_key_expr,
    with_change_defaults,
    with_date_partition,
    with_merge_key,
)
from arcane_framework_spark.contracts.openapi import parse_openapi_schema
from arcane_framework_spark.contracts.schema import (
    schema_hash,
    short_schema_hash,
)
from arcane_framework_spark.operators.dedup import (
    band_hashes_expr,
    char_ngrams_from_norm,
    minhash_signature_expr,
    shingle_hash_expr,
    shingles_expr,
    shingles_from_tokens,
    simhash_expr,
)
from arcane_framework_spark.operators.sampling import split_expr
from arcane_framework_spark.session import ts_micros, ts_timestamp
from arcane_framework_spark.operators.similarity import (
    cosine_expr,
    dequantize_expr,
    dot_expr,
    hyperplane_weights,
    lsh_signature_expr,
    norm_expr,
    quantize_expr,
)
from arcane_framework_spark.operators.text import (
    bpe_token_count_expr,
    fingerprint_expr,
    lang_id_expr,
    lang_score_expr,
    punct_ratio_expr,
    quality_score_expr,
    stopword_ratio_expr,
    token_count_expr,
    tokens_expr,
)
from arcane_framework_spark.sources.csv_ops import (
    is_complete,
    parse_csv_line,
    replace_quoted_newlines,
)

__all__ = [
    "merge_key_expr",
    "with_merge_key",
    "with_date_partition",
    "with_change_defaults",
    "parse_openapi_schema",
    "schema_hash",
    "short_schema_hash",
    "band_hashes_expr",
    "char_ngrams_from_norm",
    "minhash_signature_expr",
    "shingles_expr",
    "shingles_from_tokens",
    "simhash_expr",
    "cosine_expr",
    "dequantize_expr",
    "quantize_expr",
    "split_expr",
    "shingle_hash_expr",
    "ts_micros",
    "ts_timestamp",
    "dot_expr",
    "hyperplane_weights",
    "lsh_signature_expr",
    "norm_expr",
    "bpe_token_count_expr",
    "fingerprint_expr",
    "lang_id_expr",
    "lang_score_expr",
    "punct_ratio_expr",
    "quality_score_expr",
    "stopword_ratio_expr",
    "token_count_expr",
    "tokens_expr",
    "parse_csv_line",
    "is_complete",
    "replace_quoted_newlines",
]
