"""Multimodal (image/audio/video) column handling.

Design (SURVEY.md north star): media assets travel as opaque ``binary``
columns with typed metadata alongside — the table stays a plain DataFrame,
so partitioning, predicate pushdown on the metadata columns, and columnar
parquet storage all keep working at 100 TB. Heavy per-asset work (decode,
resize, frame-sample, feature-extract) runs in Arrow-batched Pandas UDFs via
``mapInPandas``: one Python worker per partition, zero driver involvement,
batch size bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

The actual media decode is STUBBED (``decode_image`` raises
``NotImplementedError`` unless PIL is installed — the container has no image
libs); everything around it — schema, batching, UDF signature, deterministic
byte-level features — is real and oracle-tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

#: Output schema of ``extract_features`` — fixed, so downstream plans and
#: the streaming variant bind to a stable contract.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def documents_as_assets(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Model the documents table as a binary-asset table.

    (id, content: binary, mime) — the testdata has no media files, so the
    text bytes stand in for an encoded asset; the downstream plumbing is
    identical for real media.
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )


def fake_dimensions(n_bytes: int) -> tuple[int, int]:
    """Deterministic stand-in for decoded media dimensions.

    Derived from the byte length only, so the DuckDB oracle can reproduce it
    in SQL; a real decoder would read the container header instead.
    """
    return n_bytes % 640 + 16, (n_bytes * 7) % 480 + 16


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched per-asset feature extraction over the binary column.

    The Pandas iterator keeps per-batch memory bounded regardless of
    partition size — the pattern scales to arbitrarily large asset tables.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            content = pdf["content"]
            n_bytes = content.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n_bytes.astype("int64"),
                    "sha256": content.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "width": (n_bytes % 640 + 16).astype("int32"),
                    "height": (n_bytes * 7 % 480 + 16).astype("int32"),
                }
            )

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


def decode_image(content: bytes):  # pragma: no cover - stub by design
    """Decode an image asset to a pixel array. STUB: the execution container
    ships no imaging libraries; with PIL installed this becomes real."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires an imaging library (PIL) not present in "
            "this environment; byte-level features remain available"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(content))
