"""Multimodal column queries (SURVEY §2.3 K14 + decode-pipeline EXT).

The payloads are synthetic (md5-digest bytes of the text — no media
codecs in this container) but typed as real ``binary`` columns, so the
carriage semantics (filter/join/agg over binary + struct metadata) and
the mapInPandas decode plumbing are exercised for real and hash-checked:
the stub decoder's outputs are recomputable in SQL from the hex digest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nibbler_spark.operators.multimodal import (
    attach_synthetic_payload,
    decode_batches,
    feature_extract_batches,
    frame_sample_batches,
    resize_batches,
)
from nibbler_spark.queries import register
from nibbler_spark.sources import load_table


def _sql_byte(i: int) -> str:
    """DuckDB expr for 0-based byte ``i`` of the md5-digest payload,
    recomputed from the hex text."""
    n1 = f"(strpos('0123456789abcdef', substr(hx, {2 * i + 1}, 1)) - 1)"
    n2 = f"(strpos('0123456789abcdef', substr(hx, {2 * i + 2}, 1)) - 1)"
    return f"({n1} * 16 + {n2})"


@register(
    "k14_binary_carriage",
    survey_id="K14",
    category="multimodal",
    oracle="""
SELECT d.doc_id,
       16 AS n_bytes,
       lower(md5(d.text)) AS payload_hex,
       d.lang,
       strpos('0123456789abcdef', substr(md5(d.text), 1, 1)) - 1 >= 8 AS high_bit
FROM documents d
ORDER BY d.doc_id
""",
)
def k14_binary_carriage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + struct metadata carried through projection/
    filter logic; checked via hex rendering (byte-exact in both engines)."""
    d = load_table(spark, sf_dir, "documents")
    t = attach_synthetic_payload(d).join(
        d.select("doc_id", "lang"), "doc_id"
    )
    return t.select(
        "doc_id",
        F.col("meta.size").cast("long").alias("n_bytes"),
        F.lower(F.hex("payload")).alias("payload_hex"),
        "lang",
        # binary introspection: is the first nibble's high bit set
        (
            F.instr(
                F.lit("0123456789abcdef"),
                F.substring(F.lower(F.hex("payload")), 1, 1),
            )
            - 1
            >= 8
        ).alias("high_bit"),
    ).orderBy("doc_id")


@register(
    "ext_multimodal_decode",
    survey_id="EXT-MM-DECODE",
    category="multimodal",
    oracle="""
WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents)
SELECT doc_id,
       'image/fake' AS mime,
       16 AS n_bytes,
       (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) AS width,
       (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS height
FROM h ORDER BY doc_id
""",
)
def ext_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode pipeline end-to-end: payload bytes → typed
    features (stub decoder reads dimensions from the first bytes; the
    oracle recomputes them from the hex digest). Validates schema, Arrow
    batch shape, and partition-wise execution."""
    d = load_table(spark, sf_dir, "documents")
    decoded = decode_batches(attach_synthetic_payload(d))
    return decoded.select(
        "doc_id",
        "mime",
        "n_bytes",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
    ).orderBy("doc_id")


@register(
    "ext_multimodal_resize",
    survey_id="EXT-MM-RESIZE",
    category="multimodal",
    oracle=f"""
WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
dims AS (
  SELECT doc_id,
         {_sql_byte(0)} AS width,
         {_sql_byte(1)} AS height
  FROM h
)
SELECT doc_id,
       CAST(width AS INT) AS width,
       CAST(height AS INT) AS height,
       CAST(CASE WHEN greatest(width, height, 1) <= 64 THEN width
            ELSE (width * 64) // greatest(width, height, 1) END AS INT) AS out_w,
       CAST(CASE WHEN greatest(width, height, 1) <= 64 THEN height
            ELSE (height * 64) // greatest(width, height, 1) END AS INT) AS out_h
FROM dims ORDER BY doc_id
""",
)
def ext_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode → resize pipeline: aspect-preserving 64-box fit computed in
    the Arrow batch path; the oracle recomputes the integer geometry from
    the digest."""
    d = load_table(spark, sf_dir, "documents")
    decoded = decode_batches(attach_synthetic_payload(d))
    return resize_batches(decoded).orderBy("doc_id")


@register(
    "ext_multimodal_frame_sample",
    survey_id="EXT-MM-FRAMES",
    category="multimodal",
    oracle="""
WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       md5(hx || ':' || frame_idx) AS frame_md5
FROM h, unnest([0, 4, 8, 12]) AS t(frame_idx)
ORDER BY doc_id, frame_idx
""",
)
def ext_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over 'video' payloads: 1→N Arrow fan-out with a
    deterministic per-frame fingerprint (stride 4 over 16 frames)."""
    d = load_table(spark, sf_dir, "documents")
    frames = frame_sample_batches(attach_synthetic_payload(d), stride=4)
    return frames.orderBy("doc_id", "frame_idx")


@register(
    "ext_multimodal_features",
    survey_id="EXT-MM-FEAT",
    category="multimodal",
    oracle=f"""
WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents)
SELECT doc_id,
       [{", ".join(f"round({_sql_byte(i)} / 255.0, 4)" for i in range(8))}] AS features
FROM h ORDER BY doc_id
""",
)
def ext_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction head: payload bytes → ArrayType(Float) vector,
    the plumbing shape of a real embedding model over media columns (the
    output joins directly into the K6/K7 similarity operators)."""
    d = load_table(spark, sf_dir, "documents")
    feats = feature_extract_batches(attach_synthetic_payload(d))
    # float32 storage noise → canonical 4-dp doubles (FIXTURES §4.3)
    return feats.select(
        "doc_id",
        F.transform(
            "features", lambda e: F.round(e.cast("double"), 4)
        ).alias("features"),
    ).orderBy("doc_id")
