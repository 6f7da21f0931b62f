"""Multimodal columns (SURVEY.md §2.11 L5 + north-star).

Pattern: media as opaque ``binary`` payload columns with typed metadata
alongside; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the only place Python touches data, and it is
vectorized per batch).  The image/audio codec libraries are not in this
container, so the decode body is a clearly-marked deterministic stub —
the Spark-side plumbing (schema, batching, partitioning) is real.

The fixture has no binary column; the payload is manufactured from
``documents.text`` (utf-8 bytes), which exercises identical plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io.tables import table
from ..registry import register

# --------------------------------------------------------------------------
# L5: multimodal join — text + embedding side by side in one row.
# --------------------------------------------------------------------------


@register(
    "multimodal_join",
    oracle="""
SELECT d.doc_id, d.lang, d.n_chars, e.label, LEN(e.embedding) AS n_dims
FROM documents d
JOIN embeddings e ON d.doc_id = e.vec_id
""",
    tags=("multimodal", "llm", "join"),
    doc="L5: documents ⋈ embeddings on doc_id=vec_id — one multimodal row.",
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id", "lang", "n_chars", "label", F.size("embedding").cast("bigint").alias("n_dims")
    )


# --------------------------------------------------------------------------
# Binary payload plumbing: opaque bytes + typed metadata, JVM-side ops.
# --------------------------------------------------------------------------


@register(
    "binary_payload_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       lower(hex(encode(substring(text, 1, 8)))) AS head_hex,
       lang AS media_lang
FROM documents
""",
    tags=("multimodal", "binary"),
    doc="Binary columns: byte length + head bytes hex over an opaque payload.",
)
def binary_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 8), "UTF-8"))).alias("head_hex"),
        F.col("lang").alias("media_lang"),
    )


# --------------------------------------------------------------------------
# Decode / feature-extract via Arrow-batched mapInPandas (rows-only).
# --------------------------------------------------------------------------

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
    ]
)


def _decode_image(payload: bytes) -> tuple[int, int]:
    """Real codec hook.  Image/audio libraries are not available in this
    environment — a production build would dispatch to PIL/ffmpeg here.
    Raises so callers must opt into the deterministic stub.
    """
    raise NotImplementedError("media codecs unavailable; use the deterministic stub")


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dimensions derived from payload bytes."""
    h = (sum(payload[:16]) % 32) + 1
    w = (sum(payload[16:32]) % 32) + 1
    return h, w


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        dims = [_decode_stub(p) for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "fake_height": [d[0] for d in dims],
                "fake_width": [d[1] for d in dims],
                "byte_mean": [sum(p) / len(p) if len(p) else 0.0 for p in payloads],
            }
        )


@register(
    "multimodal_decode_stub",
    oracle=None,
    tags=("multimodal", "binary", "pandas-udf"),
    doc=(
        "Decode/feature-extract over binary payloads via Arrow-batched "
        "mapInPandas; codec stubbed deterministically (libs not in container)."
    ),
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return docs.mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)
