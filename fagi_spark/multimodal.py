"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB Common-Crawl-style pipeline carries media payloads next to
text. The engine treats them as ``binary`` columns with a typed
metadata struct and runs decode / feature-extract / resize /
frame-sample as Arrow-batched ``mapInPandas`` stages — the same
execution shape as the geocoding UDF (extract.py), so partitioning,
batch sizing, and schema handling are identical and real.

The actual codec calls are STUBBED (this container ships no
image/audio libraries): ``decode=\"fake\"`` produces deterministic
pseudo-decodes derived from the payload bytes (stable across
partitionings — safe for tests), ``decode=\"strict\"`` raises
NotImplementedError at the exact call site a real codec (Pillow,
ffmpeg, torchaudio) would occupy. The Spark-side plumbing — schemas,
Arrow batch shapes, partition behavior — is real and tested.

HTML decode is NOT stubbed: pages carry ``html binary``; decoding it
back to text is pure byte-work, and the byte-identical-text-per-url
invariant (BASELINE.json input_hint) is asserted against it.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = ("url string, media_kind string, n_bytes long, "
                     "mime string, content_sha int")

IMAGE_FEATURES_SCHEMA = ("url string, width int, height int, channels int, "
                         "mean_luma double, feature_vec array<float>")

FRAME_SAMPLE_SCHEMA = ("url string, frame_idx int, ts_ms long, frame_sha int")


def _sha32(b: bytes) -> int:
    return int.from_bytes(hashlib.sha256(b).digest()[:4], "big", signed=True)


def with_media_meta(df: DataFrame, binary_col: str = "html",
                    media_kind: str = "html") -> DataFrame:
    """Typed metadata columns over an opaque binary payload — pure
    column functions (length / hash stay JVM-side)."""
    b = F.col(binary_col)
    return (df.withColumn("media_kind", F.lit(media_kind))
              .withColumn("n_bytes", F.length(b).cast("long"))
              .withColumn("content_sha", F.xxhash64(b)))


def decode_html_text(pages: DataFrame, binary_col: str = "html") -> DataFrame:
    """Real decode: html bytes -> text (tag-stripped UTF-8). Used by the
    byte-identical invariant test: synth pages embed text verbatim
    inside <body>, so decode(html) == text."""
    import re as _re
    tag = _re.compile(rb"<[^>]+>")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_url, out_text = [], []
            for url, blob in zip(pdf["url"], pdf[binary_col]):
                if blob is None:
                    continue
                out_url.append(url)
                out_text.append(tag.sub(b"", bytes(blob)).decode("utf-8", "replace"))
            yield pd.DataFrame({"url": out_url, "decoded_text": out_text})

    return (pages.select("url", binary_col)
            .mapInPandas(run, "url string, decoded_text string"))


def image_features(df: DataFrame, binary_col: str = "payload",
                   decode: str = "fake", feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract for an image binary column.

    ``decode=\"fake\"``: deterministic pseudo-decode — dims/luma/vector
    derived from a sha of the payload (stable under repartitioning).
    ``decode=\"strict\"``: the real-codec call site -> NotImplementedError.
    Either way the stage is an Arrow-batched ``mapInPandas`` whose
    output schema, null handling, and batch shape match what a Pillow-
    backed kernel would produce."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "width": [], "height": [], "channels": [],
                    "mean_luma": [], "feature_vec": []}
            for url, blob in zip(pdf["url"], pdf[binary_col]):
                if blob is None:
                    continue
                if decode == "strict":
                    raise NotImplementedError(
                        "real image codec (e.g. PIL.Image.open) goes here; "
                        "not shipped in this container")
                b = bytes(blob)
                h = hashlib.sha256(b).digest()
                rows["url"].append(url)
                rows["width"].append(16 + h[0] % 64)
                rows["height"].append(16 + h[1] % 64)
                rows["channels"].append(3)
                rows["mean_luma"].append(h[2] / 255.0)
                vec = np.frombuffer(h[:feat_dim * 4], dtype=np.uint8)[:feat_dim]
                rows["feature_vec"].append((vec.astype(np.float32) / 255.0))
            yield pd.DataFrame(rows)

    return df.select("url", binary_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample(df: DataFrame, binary_col: str = "payload",
                 every_ms: int = 1000, max_frames: int = 4,
                 decode: str = "fake") -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (url, frame_idx, ts_ms, frame hash). Fake decode synthesizes a
    deterministic frame count from the payload; strict raises at the
    ffmpeg call site."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "frame_idx": [], "ts_ms": [], "frame_sha": []}
            for url, blob in zip(pdf["url"], pdf[binary_col]):
                if blob is None:
                    continue
                if decode == "strict":
                    raise NotImplementedError(
                        "real demuxer (e.g. ffmpeg/pyav) goes here; "
                        "not shipped in this container")
                b = bytes(blob)
                n = min(max_frames, 1 + b[0] % max_frames if b else 1)
                for i in range(n):
                    rows["url"].append(url)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    # ASCII frame-index suffix (not packed bytes): keeps the
                    # deterministic pseudo-decode SQL-mirrorable (DuckDB's
                    # sha256 is VARCHAR-only, so the hashed payload must be
                    # NUL-free when the payload is text)
                    rows["frame_sha"].append(_sha32(b + str(i).encode()))
            yield pd.DataFrame(rows)

    return df.select("url", binary_col).mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def resize_stub(df: DataFrame, binary_col: str = "payload",
                width: int = 224, height: int = 224) -> DataFrame:
    """Resize stage: passes bytes through with target-dims metadata
    (the real interpolation is a codec concern; the pipeline contract —
    binary in, binary + dims out — is what downstream stages consume)."""
    return (df.withColumn("resized", F.col(binary_col))
              .withColumn("target_w", F.lit(width))
              .withColumn("target_h", F.lit(height)))
