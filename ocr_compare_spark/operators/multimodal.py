"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step itself is STUBBED — no image/audio libraries exist
in this container (cv2/PIL/librosa absent), matching the reference's
import-guarded optional engines (ocr_impls/__init__.py:5-17). The
Spark-side plumbing is REAL and tested: schemas, mime routing,
Arrow-batched mapInPandas with bounded batch sizes, deterministic
fake features so downstream operators (dedup, ANN) can be exercised
end-to-end.

Reference analog: scan/document_scanner.py:21-50 decodes image bytes
to ndarrays inside the scan utility — same seam, one row per asset.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = (
    "url string, mime string, n_bytes long, magic_ok boolean"
)

FEATURE_DIM = 16

# feature is array<double>: feature[0] is an exact closed-form md5
# value (see fake_features) and float32 would round-trip it lossily.
FEATURES_SCHEMA = (
    f"url string, mime string, n_bytes long, feature array<double>, decode_error string"
)


def media_metadata(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Typed metadata via native expressions only (S4 mime sniff as
    column exprs; no Python)."""
    p = F.col(payload_col)
    mime = (
        F.when(F.expr(f"substring({payload_col}, 1, 4) = X'25504446'"), "application/pdf")
        .when(F.expr(f"substring({payload_col}, 1, 3) = X'FFD8FF'"), "image/jpeg")
        .when(F.expr(f"substring({payload_col}, 1, 8) = X'89504E470D0A1A0A'"), "image/png")
        .when(F.expr(f"substring({payload_col}, 1, 4) = X'52494646'"), "audio/wav-or-webp")
        .otherwise("text/html")
    )
    return df.select(
        "url",
        mime.alias("mime"),
        F.octet_length(p).cast("long").alias("n_bytes"),
        (F.octet_length(p) > 8).alias("magic_ok"),
    )


def decode_image(data: bytes) -> np.ndarray:
    """STUB: real implementation would be cv2.imdecode /
    PIL.Image.open. Raises so callers must route through
    fake_features in this environment."""
    raise NotImplementedError("image decode requires cv2/PIL (not in this container)")


def fake_features(data: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decoder+embedder, stable across
    processes (no salted hash). feature[0] is a CLOSED-FORM value —
    the first 4 md5 bytes as uint32 / 2^32 — so an ANSI-SQL oracle
    can recompute it from the payload bytes; the remaining dims are
    md5-seeded pseudo-random (not normalized, so f0 stays exact)."""
    digest = hashlib.md5(data).digest()
    f0 = int.from_bytes(digest[:4], "big") / 2**32
    rng = np.random.default_rng(int.from_bytes(digest[4:12], "little"))
    v = rng.standard_normal(dim)
    v[0] = f0
    return v


def extract_media_features(df: DataFrame, payload_col: str = "html", batch_rows: int = 256) -> DataFrame:
    """mapInPandas over binary payloads -> fixed-dim feature vectors.

    Real plumbing: Arrow batches are re-chunked to ``batch_rows`` so a
    partition of large blobs never materializes as one giant batch
    (the multimodal analog of arrow.maxRecordsPerBatch). Decode
    errors become rows, not task failures."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for url, data in zip(chunk["url"], chunk[payload_col]):
                    if data is None:
                        rows.append({"url": url, "mime": None, "n_bytes": 0, "feature": None, "decode_error": "null_payload"})
                        continue
                    b = bytes(data)
                    mime = "application/pdf" if b[:4] == b"%PDF" else "text/html"
                    try:
                        feat = fake_features(b)
                        rows.append({"url": url, "mime": mime, "n_bytes": len(b), "feature": [float(x) for x in feat], "decode_error": None})
                    except Exception as e:
                        rows.append({"url": url, "mime": mime, "n_bytes": len(b), "feature": None, "decode_error": type(e).__name__})
                yield pd.DataFrame(rows)

    return df.select("url", payload_col).mapInPandas(run, FEATURES_SCHEMA)


RESIZE_SCHEMA = "url string, width int, height int, image binary, decode_error string"


def _fake_raster(data: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode+resize: an md5 keystream of
    exactly width*height bytes (1 'channel'), so output sizing, Arrow
    binary transfer and error routing are all real."""
    need = width * height
    out = bytearray()
    counter = 0
    seed = hashlib.md5(data).digest()
    while len(out) < need:
        out += hashlib.md5(seed + counter.to_bytes(4, "big")).digest()
        counter += 1
    return bytes(out[:need])


def resize_images(
    df: DataFrame, width: int = 64, height: int = 64, payload_col: str = "html", batch_rows: int = 256
) -> DataFrame:
    """Decode -> resize -> re-encode over binary image columns
    (decode stubbed as in extract_media_features; the real
    implementation swaps _fake_raster for cv2.resize). Output is one
    row per input with a width*height binary raster."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for url, data in zip(chunk["url"], chunk[payload_col]):
                    if data is None:
                        rows.append({"url": url, "width": width, "height": height, "image": None, "decode_error": "null_payload"})
                        continue
                    try:
                        rows.append({"url": url, "width": width, "height": height, "image": _fake_raster(bytes(data), width, height), "decode_error": None})
                    except Exception as e:
                        rows.append({"url": url, "width": width, "height": height, "image": None, "decode_error": type(e).__name__})
                yield pd.DataFrame(rows)

    return df.select("url", payload_col).mapInPandas(run, RESIZE_SCHEMA)


FRAMES_SCHEMA = "url string, frame_no int, ts_ms long, frame binary, decode_error string"


def sample_frames(
    df: DataFrame,
    fps: float = 1.0,
    max_frames: int = 8,
    bytes_per_second: int = 4096,
    payload_col: str = "html",
    batch_rows: int = 64,
) -> DataFrame:
    """Video frame sampling: one OUTPUT ROW PER FRAME (the
    row-expanding mapInPandas shape a real ffmpeg-backed sampler
    needs — output cardinality differs from input, which a scalar
    pandas UDF cannot express). Duration is derived from payload size
    at ``bytes_per_second`` (decode stubbed); frames are sampled at
    1/fps intervals, capped at ``max_frames``; frame payloads are the
    deterministic fake raster keyed by (payload, frame_no)."""
    interval_ms = int(1000 / fps)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for url, data in zip(chunk["url"], chunk[payload_col]):
                    if data is None:
                        rows.append({"url": url, "frame_no": 0, "ts_ms": 0, "frame": None, "decode_error": "null_payload"})
                        continue
                    b = bytes(data)
                    duration_ms = int(len(b) * 1000 / bytes_per_second)
                    n = max(1, min(max_frames, duration_ms // interval_ms + 1))
                    for i in range(n):
                        rows.append({
                            "url": url, "frame_no": i, "ts_ms": i * interval_ms,
                            "frame": _fake_raster(b + i.to_bytes(4, "big"), 16, 16),
                            "decode_error": None,
                        })
                yield pd.DataFrame(rows)

    return df.select("url", payload_col).mapInPandas(run, FRAMES_SCHEMA)
