"""Multimodal column operators (SURVEY §2.3 K14).

Design: image/audio/video payloads ride as opaque ``binary`` columns next
to a typed metadata struct; every transformation is an Arrow-batched
``mapInPandas`` over (payload, metadata) so a 100 TB corpus streams
through Python workers batch-by-batch without ever materializing rows on
the driver. The decode step itself is STUBBED — the real codecs (PIL,
ffmpeg, torchaudio) are not in this container — but the Spark-side
plumbing (schema, batch iteration, UDF signature, partition flow) is the
production shape: swap `_decode_stub` for a real decoder and nothing
else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, mime string, n_bytes long, width int, height int, "
    "payload_md5 string"
)


def _decode_stub(payload: bytes, mime: str) -> dict:
    """Deterministic fake decode: derives 'image dimensions' from the
    first two payload bytes. A real decoder would parse the container
    format here."""
    return {
        "width": payload[0] if len(payload) > 0 else 0,
        "height": payload[1] if len(payload) > 1 else 0,
    }


def decode_image_real(payload: bytes, mime: str):  # pragma: no cover
    """The real decode hook — requires an image codec, absent here."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires PIL/pillow, which is not installed "
            "in this environment; use the deterministic stub path"
        ) from exc
    raise NotImplementedError("wire PIL decode here when the codec ships")


def decode_batches(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode pipeline: binary payload → typed features.

    Arrow moves each partition through Python in columnar batches; the
    output schema is fixed so downstream relational ops keep codegen.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            decoded = [
                _decode_stub(p, m)
                for p, m in zip(payloads, pdf["mime"], strict=True)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": payloads.map(len),
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(run, DECODED_SCHEMA)


def attach_synthetic_payload(docs: DataFrame) -> DataFrame:
    """Derive a deterministic binary payload + metadata struct from the
    documents table (the container has no real media files): payload =
    md5 digest bytes of the text, metadata = {mime, size}."""
    payload = F.unhex(F.md5("text"))
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("image/fake").alias("mime"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(payload).alias("size"),
        ).alias("meta"),
    )
