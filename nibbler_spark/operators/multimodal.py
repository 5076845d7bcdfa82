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


RESIZED_SCHEMA = "doc_id long, width int, height int, out_w int, out_h int"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"
FEATURE_SCHEMA = "doc_id long, features array<float>"

_BOX = 64  # resize target box (longest edge)


def resize_batches(decoded: DataFrame) -> DataFrame:
    """mapInPandas 'resize': aspect-preserving fit into a 64×64 box,
    integer arithmetic only (deterministic, oracle-recomputable). A real
    implementation would call the codec's resampler on the pixel buffer;
    the geometry math — the part Spark sees — is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            m = w.combine(h, max).clip(lower=1)
            scale_needed = m > _BOX
            out_w = w.where(~scale_needed, (w * _BOX) // m)
            out_h = h.where(~scale_needed, (h * _BOX) // m)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_w": out_w.astype("int32"),
                    "out_h": out_h.astype("int32"),
                }
            )

    return decoded.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_batches(df: DataFrame, stride: int = 4) -> DataFrame:
    """mapInPandas frame sampler: treats the payload as a 16-'frame'
    container and emits every ``stride``-th frame with a deterministic
    per-frame fingerprint (md5 of payload-hex + ':' + index). One input
    row fans out to several output rows — the Arrow path supports
    1→N row expansion without an explode stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, payload in zip(
                pdf["doc_id"], pdf["payload"], strict=True
            ):
                hx = bytes(payload).hex()
                for i in range(0, len(payload), stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(f"{hx}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


def feature_extract_batches(df: DataFrame, n: int = 8) -> DataFrame:
    """mapInPandas feature extraction: first ``n`` payload bytes scaled to
    [0,1] as a float vector — the stand-in for a real CNN/CLAP embedding
    head. Output is ArrayType(Float), joinable against the embeddings
    table's similarity operators (K6/K7)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [round(b / 255.0, 4) for b in bytes(p)[:n]]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.mapInPandas(run, FEATURE_SCHEMA)


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
