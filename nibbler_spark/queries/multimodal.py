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
)
from nibbler_spark.queries import register
from nibbler_spark.sources import load_table


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
