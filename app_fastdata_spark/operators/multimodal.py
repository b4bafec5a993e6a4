"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video are opaque `binary` columns with typed metadata. The
decode step probes for a real decoder (PIL) at runtime and uses it for
any payload that parses as an image; payloads that don't (including
every synthetic md5 payload below) fall back to a deterministic fake
clearly marked as such (`_fake_decode`). The Spark-side plumbing —
binary column synthesis, Arrow-batched `mapInPandas`, explicit output
schema, batch shape — is identical on both paths, so shipping media
libs into the executor image is a zero-code-change upgrade.

The synthetic payload is `unhex(md5(text))` (16 bytes), so the DuckDB
oracle can verify the decode metadata end-to-end: both sides derive
"width"/"height"/"format" from the same md5 hex digits.

Scale notes: mapInPandas processes Arrow record batches (vectorized
transfer); at 100 TB the decode stage is a pure map — no shuffle — and
parallelism is the file-split count. Binary payloads stay out of any
shuffle key.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

_FORMATS = ["png", "jpeg", "webp"]

DECODE_SCHEMA = (
    "doc_id long, byte_len int, width int, height int, format string"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the synthetic opaque binary column (stands in for image
    bytes). NULL text means no payload to decode — those docs are
    excluded here and by the oracles' WHERE text IS NOT NULL."""
    return docs.filter(F.col("text").isNotNull()).withColumn(
        "payload", F.unhex(F.md5(F.col("text")))
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic synthetic decode (fallback when no media lib is
    present or the payload is not a parseable image).

    Metadata derived from the payload's hex digest — the real
    implementation is `decode_payload`, which calls PIL when importable
    and returns true dimensions. The Spark plumbing is identical around
    both.
    """
    hexd = payload.hex()
    width = ord(hexd[0])
    height = ord(hexd[1])
    fmt = _FORMATS[payload[0] % 3]
    return len(payload), width, height, fmt


_PIL_IMAGE = None
_PIL_PROBED = False


def _pil_image():
    """Probe once per process for a real image decoder (executor-side:
    each Python worker probes its own interpreter)."""
    global _PIL_IMAGE, _PIL_PROBED
    if not _PIL_PROBED:
        try:
            from PIL import Image as _img

            _PIL_IMAGE = _img
        except ImportError:
            _PIL_IMAGE = None
        _PIL_PROBED = True
    return _PIL_IMAGE


def decode_payload(payload: bytes) -> tuple[int, int, int, str]:
    """(byte_len, width, height, format) for an opaque media payload.

    Real decode via PIL when it is importable AND the bytes parse as an
    image; the deterministic synthetic fallback otherwise. Both paths
    return the same shape, so the mapInPandas schema never changes with
    the environment.
    """
    img_mod = _pil_image()
    if img_mod is not None:
        import io

        try:
            with img_mod.open(io.BytesIO(payload)) as im:
                return (
                    len(payload),
                    int(im.width),
                    int(im.height),
                    (im.format or "unknown").lower(),
                )
        except Exception:  # noqa: BLE001 — not an image: synthetic fallback
            pass
    return _fake_decode(payload)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        meta = pdf["payload"].map(decode_payload)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": meta.map(lambda m: m[0]),
                "width": meta.map(lambda m: m[1]),
                "height": meta.map(lambda m: m[2]),
                "format": meta.map(lambda m: m[3]),
            }
        )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "payload").mapInPandas(
        _decode_batches, schema=DECODE_SCHEMA
    )


# Oracle mirrors the fake decode from the md5 hex: ascii of hex chars 1-2,
# format from the first byte mod 3.
register(
    "multimodal_decode",
    sql="""
    WITH h AS (SELECT doc_id, md5(text) AS hexd FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           16 AS byte_len,
           ascii(substr(hexd, 1, 1)) AS width,
           ascii(substr(hexd, 2, 1)) AS height,
           ['png', 'jpeg', 'webp'][
             (CAST(('0x' || substr(hexd, 1, 2)) AS INTEGER) % 3) + 1
           ] AS format
    FROM h
    """,
)(multimodal_decode)


# Frame-sampling plumbing: treat the payload as a "video" of byte-frames,
# emit every k-th byte as a frame fingerprint row (1→N mapInPandas shape).
FRAME_STRIDE = 4


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: list[tuple[int, int, int]] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for idx, off in enumerate(range(0, len(payload), FRAME_STRIDE)):
                rows.append((doc_id, idx, payload[off]))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_byte"])


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "payload").mapInPandas(
        _frame_batches, schema="doc_id long, frame_idx int, frame_byte int"
    )


register(
    "multimodal_frame_sample",
    sql=f"""
    WITH h AS (SELECT doc_id, md5(text) AS hexd FROM documents WHERE text IS NOT NULL),
    idx AS (SELECT doc_id, hexd, unnest(range(0, 4)) AS frame_idx FROM h)
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(('0x' || substr(hexd, frame_idx * {2 * FRAME_STRIDE} + 1, 2))
                AS INTEGER) AS frame_byte
    FROM idx
    """,
)(multimodal_frame_sample)


# Resize plumbing: aspect-preserving fit into a 64x64 box. The byte-level
# resample is faked (payload truncation — no media libs), but the shape
# math, the 1→1 mapInPandas contract, and the metadata columns are real.
# Integer floor arithmetic only, so the DuckDB oracle matches exactly.
RESIZE_BOX = 64


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _, w, h, _ = decode_payload(payload)
            if w >= h:
                dw, dh = RESIZE_BOX, (RESIZE_BOX * h) // w
            else:
                dw, dh = (RESIZE_BOX * w) // h, RESIZE_BOX
            resized = payload[:8]  # STUB: real impl resamples pixels here
            rows.append((doc_id, w, h, dw, dh, len(resized)))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "src_w", "src_h", "dst_w", "dst_h", "payload_len"],
        )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "payload").mapInPandas(
        _resize_batches,
        schema="doc_id long, src_w int, src_h int, dst_w int, dst_h int,"
        " payload_len int",
    )


register(
    "multimodal_resize",
    sql=f"""
    WITH h AS (
      SELECT doc_id,
             ascii(substr(md5(text), 1, 1)) AS w,
             ascii(substr(md5(text), 2, 1)) AS h
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, w AS src_w, h AS src_h,
           CAST(CASE WHEN w >= h THEN {RESIZE_BOX}
                     ELSE ({RESIZE_BOX} * w) // h END AS INTEGER) AS dst_w,
           CAST(CASE WHEN w >= h THEN ({RESIZE_BOX} * h) // w
                     ELSE {RESIZE_BOX} END AS INTEGER) AS dst_h,
           8 AS payload_len
    FROM h
    """,
)(multimodal_resize)


# Feature-extraction plumbing: payload bytes → dense float vector (the
# stage that feeds similarity.py's ANN ops). The "model" is a stub —
# bytes scaled to [0,1] — but the batch shape (binary in, array<float>
# out via Arrow) is the production contract. The registered query
# projects scalar summaries (dim, l2 norm, first component) so the
# oracle hash avoids cross-engine float-array formatting.
def _embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import math

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            vec = [b / 255.0 for b in payload]  # STUB: real encoder here
            rows.append(
                (
                    doc_id,
                    vec,
                    len(vec),
                    round(math.sqrt(sum(x * x for x in vec)), 6),
                    round(vec[0], 6),
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "embedding", "dim", "l2_norm", "c0"]
        )


def extract_features(docs: DataFrame) -> DataFrame:
    """binary payload → (doc_id, embedding array<float>, scalars)."""
    return docs.select("doc_id", "payload").mapInPandas(
        _embed_batches,
        schema="doc_id long, embedding array<float>, dim int,"
        " l2_norm double, c0 double",
    )


def multimodal_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return extract_features(docs).select("doc_id", "dim", "l2_norm", "c0")


register(
    "multimodal_embed",
    sql="""
    WITH b AS (
      SELECT doc_id,
             list_transform(range(1, 17),
               i -> CAST(('0x' || substr(md5(text), (i-1)*2 + 1, 2)) AS INTEGER)
                    / 255.0) AS vec
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, 16 AS dim,
           round(sqrt(list_sum(list_transform(vec, x -> x * x))), 6) AS l2_norm,
           round(vec[1], 6) AS c0
    FROM b
    """,
)(multimodal_embed)
