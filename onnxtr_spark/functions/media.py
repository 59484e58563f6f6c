"""Multimodal column operators: opaque binary media + typed metadata.

The decode step is the deterministic codec from imaging.py (PNG
stand-in; see that module's docstring) — the Spark-side plumbing
(binary columns, Arrow batching, mapInPandas feature extraction,
schema) is the real deliverable and is what a cv2/PIL-backed decode
would drop into unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from onnxtr_spark import imaging

PAGE_STATS_SCHEMA = "media_ref string, height long, width long, dark_ratio double, n_dark_rows long"


def page_stats(media: DataFrame) -> DataFrame:
    """Per-page image features: dimensions, dark-pixel ratio, rows
    containing any glyph — a feature-extraction pass over binary media."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for _, r in pdf.iterrows():
                img = imaging.decode_image(r["png"])
                dark = img[:, :, 0] < 255
                rows.append({
                    "media_ref": r["media_ref"],
                    "height": img.shape[0],
                    "width": img.shape[1],
                    "dark_ratio": round(float(dark.mean()), 6),
                    "n_dark_rows": int(dark.any(axis=1).sum()),
                })
            yield pd.DataFrame(rows, columns=["media_ref", "height", "width", "dark_ratio", "n_dark_rows"])

    return media.mapInPandas(run, schema=PAGE_STATS_SCHEMA)


def frame_sample(media: DataFrame, every: int = 4) -> DataFrame:
    """Frame-sampling analog for video-like media: emit every Nth row
    strip of each page as a (media_ref, strip_idx, strip_png) row.
    Demonstrates fan-out of one binary blob into sampled sub-blobs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for _, r in pdf.iterrows():
                img = imaging.decode_image(r["png"])
                strips = np.array_split(img, max(1, img.shape[0] // 64), axis=0)
                for i, strip in enumerate(strips):
                    if i % every == 0:
                        rows.append({
                            "media_ref": r["media_ref"],
                            "strip_idx": i,
                            "strip_png": imaging.encode_image(np.ascontiguousarray(strip)),
                        })
            yield pd.DataFrame(rows, columns=["media_ref", "strip_idx", "strip_png"])

    return media.mapInPandas(run, schema="media_ref string, strip_idx long, strip_png binary")
