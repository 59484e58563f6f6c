"""S1's rasterize half: injectable PDF page rasterizer.

The reference rasterizes scanned PDFs with pypdfium2 at scale=2 into
RGB page arrays (io/pdf.py:16-43) and re-enters the image pipeline
(io/reader.py:25-45). pypdfium2 is absent in this container, so —
exactly like the model registry in engine.py — the rasterizer is an
injectable contract resolved per Python worker:

- ``RasterizerConfig`` names the implementation and carries the
  reference's ``scale`` knob (pdf.py:16 ``scale: float = 2``);
- ``RASTERIZER_REGISTRY`` maps name → factory; a deployment with
  pypdfium2 registers ``lambda cfg: Pdfium(cfg)`` via an importable
  module named in ``factory_module`` (shipped with --py-files) and
  nothing else changes;
- the default ``stub_synth`` rasterizer is deterministic: it parses
  the PDF's own content streams (sources/pdf.py) and re-renders the
  text through the synthetic glyph renderer at ``round(scale)``×
  resolution — so the scanned branch's OCR output is span-equal to the
  born-digital parse and the whole pdf→raster→OCR chain is oracled.

Spark surface: ``rasterize_pdf_pages`` is Arrow-batched mapInPandas
over the binary pdf column, emitting one encoded page image per PDF
page — the same (doc_id, offset, media_ref, png) contract the fused
OCR stage consumes. Pages are encoded with the imaging codec (PNG
stand-in), so the scanned branch is byte-compatible with the image
branch downstream.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from onnxtr_spark.corpus import WORDS_PER_LINE
from onnxtr_spark.partitioning import spread


@dataclass(frozen=True)
class RasterizerConfig:
    """Which rasterizer to use and how (reference io/pdf.py:16-25:
    scale, rgb_mode; password/other kwargs would ride alongside)."""

    name: str = "stub_synth"
    scale: float = 2.0  # reference default: 2 ~ 144dpi (io/pdf.py:16)
    factory_module: str | None = None  # executor-side registration hook


RASTERIZER_REGISTRY: dict[str, Callable[[RasterizerConfig], object]] = {}
_RASTERIZERS: dict[tuple, object] = {}


def register_rasterizer(name: str, factory: Callable[[RasterizerConfig], object]) -> None:
    """Register a rasterizer factory (the pypdfium2 injection point)."""
    RASTERIZER_REGISTRY[name] = factory


def get_rasterizer(cfg: RasterizerConfig | None = None):
    """Per-worker cached rasterizer (same resolution discipline as
    engine._resolve: factory_module import, then registry lookup)."""
    cfg = cfg or RasterizerConfig()
    key = (cfg.name, cfg.scale)
    if key not in _RASTERIZERS:
        if cfg.name not in RASTERIZER_REGISTRY and cfg.factory_module:
            import importlib

            importlib.import_module(cfg.factory_module)
        if cfg.name not in RASTERIZER_REGISTRY:
            raise NotImplementedError(
                f"rasterizer {cfg.name!r} is not registered; pypdfium2 is absent in "
                "this container, so a real rasterizer needs a registered factory "
                "(register_rasterizer)."
            )
        _RASTERIZERS[key] = RASTERIZER_REGISTRY[cfg.name](cfg)
    return _RASTERIZERS[key]


class StubSynthRasterizer:
    """Deterministic stand-in for pypdfium2's render loop: content-stream
    text → glyph-rendered page at ``round(scale)``× resolution, H×W×3
    uint8 RGB (the reference's rgb_mode output, io/pdf.py:37-42)."""

    def __init__(self, cfg: RasterizerConfig):
        self.factor = max(1, int(round(cfg.scale)))

    def rasterize(self, blob: bytes) -> list[np.ndarray]:
        from onnxtr_spark import imaging
        from onnxtr_spark.sources.pdf import decode_pdf_texts

        pages = []
        for text in decode_pdf_texts(blob):
            words = [w for w in text.split() if w]
            lines = [words[i : i + WORDS_PER_LINE] for i in range(0, len(words), WORDS_PER_LINE)] or [[]]
            img = imaging.render_page(lines)
            if self.factor > 1:
                # np.repeat == kron with a ones block (each pixel tiles
                # into an f×f block) at ~10x less cost; rendered pages
                # are grayscale (3 equal channels), so upscale ONE plane
                # and re-broadcast — encode_image stores that plane
                f = self.factor
                ch0 = img[:, :, 0]
                if (img[:, :, 1] == ch0).all() and (img[:, :, 2] == ch0).all():
                    up0 = np.repeat(np.repeat(ch0, f, axis=0), f, axis=1)
                    img = np.broadcast_to(up0[:, :, None], up0.shape + (3,))
                else:
                    img = np.repeat(np.repeat(img, f, axis=0), f, axis=1)
            pages.append(img)
        return pages

    def rasterize_encoded(self, blob: bytes) -> list[tuple[bytes, int, int]]:
        """(png, height, width) per page with the upscale elided: the
        2× replication is pure pixel repetition, so the encoder stores
        the 1× plane + factor (imaging.encode_image_gray_scaled) and
        ``decode_image`` reproduces the exact full-resolution frame —
        compress/decompress and the upscale materialization drop f²×.
        Pages whose channels differ (never produced by the synth
        renderer, kept for safety) fall back to the full-frame path."""
        from onnxtr_spark import imaging
        from onnxtr_spark.sources.pdf import decode_pdf_texts

        out = []
        f = self.factor
        for text in decode_pdf_texts(blob):
            words = [w for w in text.split() if w]
            lines = [words[i : i + WORDS_PER_LINE] for i in range(0, len(words), WORDS_PER_LINE)] or [[]]
            img = imaging.render_page(lines)
            ch0 = img[:, :, 0]
            if f > 1 and not ((img[:, :, 1] == ch0).all() and (img[:, :, 2] == ch0).all()):
                up = np.repeat(np.repeat(img, f, axis=0), f, axis=1)
                out.append((imaging.encode_image(up), up.shape[0], up.shape[1]))
                continue
            out.append(
                (imaging.encode_image_gray_scaled(np.ascontiguousarray(ch0), f),
                 img.shape[0] * f, img.shape[1] * f)
            )
        return out


register_rasterizer("stub_synth", StubSynthRasterizer)

RASTER_PAGES_SCHEMA = "doc_id string, offset int, media_ref string, png binary, height int, width int"


def rasterize_pdf_pages(pdfs: DataFrame, cfg: RasterizerConfig = RasterizerConfig()) -> DataFrame:
    """(doc_id, pdf binary) → one OCR-ready page row per PDF page, the
    fused stage's input contract (doc_id, offset, media_ref, png, h, w).

    Explicit repartition ahead of the Python stage: rasterize cost is
    per-row CPU, and AQE's byte-based coalescing would serialize the
    stage onto one partition for small byte volumes (see BENCH notes).
    """
    pdfs = spread(pdfs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from onnxtr_spark import imaging

        ras = get_rasterizer(cfg)
        enc = getattr(ras, "rasterize_encoded", None)
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["pdf"]):
                if enc is not None:
                    for p, (png, h, w) in enumerate(enc(bytes(blob))):
                        rows.append({
                            "doc_id": doc_id,
                            "offset": p,
                            "media_ref": f"{doc_id}-{p}",
                            "png": png,
                            "height": h,
                            "width": w,
                        })
                    continue
                for p, img in enumerate(ras.rasterize(bytes(blob))):
                    rows.append({
                        "doc_id": doc_id,
                        "offset": p,
                        "media_ref": f"{doc_id}-{p}",
                        "png": imaging.encode_image(img),
                        "height": img.shape[0],
                        "width": img.shape[1],
                    })
            yield pd.DataFrame(rows, columns=["doc_id", "offset", "media_ref", "png", "height", "width"])

    return pdfs.mapInPandas(run, schema=RASTER_PAGES_SCHEMA)
