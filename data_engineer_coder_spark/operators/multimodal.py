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
from ._helpers import shuffle_parts

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


# --------------------------------------------------------------------------
# Frame sampling: the video pattern — payload split into fixed-size
# "frames", every k-th frame sampled, one output row per sampled frame
# (1→N mapInPandas expansion).  The fixture payload is ASCII text bytes,
# so per-frame byte sums are expressible in DuckDB too → oracle-checked,
# unusual for media plumbing.
# --------------------------------------------------------------------------

_FRAME_BYTES = 32
_FRAME_STRIDE = 4  # keep every 4th frame

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_checksum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for idx in range(0, (len(payload) + _FRAME_BYTES - 1) // _FRAME_BYTES, _FRAME_STRIDE):
                fr = payload[idx * _FRAME_BYTES : (idx + 1) * _FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_len"].append(len(fr))
                out["frame_checksum"].append(int(sum(fr)))
        yield pd.DataFrame(out)


@register(
    "media_frame_sample",
    oracle=f"""
WITH f AS (
  SELECT doc_id,
         i AS frame_idx,
         substring(text, i * {_FRAME_BYTES} + 1, {_FRAME_BYTES}) AS fr
  FROM documents,
       unnest(range(0, CAST(CEIL(LENGTH(text) / {_FRAME_BYTES}.0) AS BIGINT))) AS t(i)
  WHERE i % {_FRAME_STRIDE} = 0
)
SELECT doc_id, frame_idx,
       CAST(LENGTH(fr) AS BIGINT) AS frame_len,
       CAST(list_sum(list_transform(string_split(fr, ''), c -> ascii(c))) AS BIGINT)
         AS frame_checksum
FROM f
""",
    tags=("multimodal", "binary", "pandas-udf"),
    doc=(
        "Media frame sampling: payload → 32-byte frames, every 4th kept, "
        "one row per frame via Arrow-batched mapInPandas (1→N); byte "
        "checksums oracle-checked (ASCII fixture makes bytes == chars)."
    ),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    # Spread docs before the Python stage — same single-file hazard as
    # the other documents-table pandas paths.
    return docs.repartition(shuffle_parts(docs), F.col("doc_id")).mapInPandas(
        _frame_sample_batches, schema=_FRAME_SCHEMA
    )


# --------------------------------------------------------------------------
# Feature extraction / "resize": fixed-width feature row per payload —
# char-class histogram (the stand-in for a channel histogram) plus a
# 4-point "thumbnail" (first byte of each quarter).  numpy-vectorized
# inside mapInPandas; scalar output columns (array cells are hostile to
# downstream pandas canonicalizers).
# --------------------------------------------------------------------------

_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_lower_am", T.LongType()),
        T.StructField("n_lower_nz", T.LongType()),
        T.StructField("n_digit", T.LongType()),
        T.StructField("n_space", T.LongType()),
        T.StructField("thumb_0", T.IntegerType()),
        T.StructField("thumb_1", T.IntegerType()),
        T.StructField("thumb_2", T.IntegerType()),
        T.StructField("thumb_3", T.IntegerType()),
    ]
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows: dict[str, list] = {k.name: [] for k in _FEAT_SCHEMA.fields}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(payload, dtype=np.uint8)
            q = max(len(b) // 4, 1)
            rows["doc_id"].append(doc_id)
            rows["n_lower_am"].append(int(((b >= ord("a")) & (b <= ord("m"))).sum()))
            rows["n_lower_nz"].append(int(((b >= ord("n")) & (b <= ord("z"))).sum()))
            rows["n_digit"].append(int(((b >= ord("0")) & (b <= ord("9"))).sum()))
            rows["n_space"].append(int((b == ord(" ")).sum()))
            for t in range(4):
                # out-of-range sentinel is 0, matching the oracle's
                # ascii(substring(...)) = 0 for positions past end-of-string
                v = int(b[t * q]) if t * q < len(b) else 0
                rows[f"thumb_{t}"].append(v)
        yield pd.DataFrame(rows)


@register(
    "media_feature_stub",
    oracle="""
SELECT doc_id,
       CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[a-m]', '', 'g')) AS BIGINT) AS n_lower_am,
       CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[n-z]', '', 'g')) AS BIGINT) AS n_lower_nz,
       CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
       CAST(LENGTH(text) - LENGTH(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS n_space,
       ascii(substring(text, 0 * GREATEST(LENGTH(text) // 4, 1) + 1, 1)) AS thumb_0,
       ascii(substring(text, 1 * GREATEST(LENGTH(text) // 4, 1) + 1, 1)) AS thumb_1,
       ascii(substring(text, 2 * GREATEST(LENGTH(text) // 4, 1) + 1, 1)) AS thumb_2,
       ascii(substring(text, 3 * GREATEST(LENGTH(text) // 4, 1) + 1, 1)) AS thumb_3
FROM documents
""",
    tags=("multimodal", "binary", "pandas-udf"),
    doc=(
        "Feature-extract/resize stub: numpy char-class histogram + 4-point "
        "thumbnail per payload via mapInPandas, scalar outputs, "
        "oracle-checked against pure-SQL equivalents."
    ),
)
def media_feature_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return docs.repartition(shuffle_parts(docs), F.col("doc_id")).mapInPandas(
        _feature_batches, schema=_FEAT_SCHEMA
    )
