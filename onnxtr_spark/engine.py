"""Inference-engine wrappers, one cached session per Python worker.

Mirrors the reference's Engine pattern (onnxtr/models/engine.py:102-140):
a session is constructed once and reused across batches; in Spark the
equivalent is a module-level singleton inside each Python worker process
(``spark.python.worker.reuse=true`` keeps workers alive across tasks), with
model artifacts shipped via ``SparkContext.addFile``/``--files``.

Because this sandbox has no onnxruntime, the two "models" are
deterministic stubs with the **same tensor contracts** as the reference's
ONNX graphs:

- ``DetectionEngine.run``: B×H×W×3 uint8 pages → B×H×W float32 prob map
  in [0,1] (reference FAST/DBNet: sigmoid(logits), detection/models/
  fast.py:83 + tests/common/test_models_detection.py:92-95).
- ``RecognitionEngine.run``: B×32×128×3 uint8 crops → B×T×C float32
  logits, C = len(vocab)+1 with blank last (reference CRNN,
  models/recognition/models/crnn.py:132-146).

Threading note for a real deployment: set ORT ``intra_op_num_threads=1``
per session (reference exposes this via EngineConfig, engine.py:51-79) so
executor cores are not oversubscribed — this is what protects the ≥0.8
N→4N scaling-efficiency bar.
"""

from __future__ import annotations

import os

import numpy as np

from onnxtr_spark import imaging
from onnxtr_spark.vocabs import DEFAULT_VOCAB

_SESSIONS: dict[str, object] = {}

# Optional model-cost emulation for scaling studies: the stub models are
# orders of magnitude cheaper than real CNNs (the reference's fast_base
# runs ~100s of ms/page on one CPU core, README.md:363), which makes a
# single shared-memory box DRAM-bound long before 32 cores. Setting
# SPARK_GRAFT_MODEL_ITERS=<n> adds n deterministic cache-resident
# vector iterations (~3 µs each, 32 KB working set) per page, restoring
# a production-like FLOPs/byte ratio so the scaling measurement reflects
# orchestration, not the stub's pathological lightness. The work is a
# FIXED iteration count — identical at every parallelism level — never
# time-calibrated (calibration under load would self-distort). Zero
# (default) = off; results are unaffected either way.
MODEL_ITERS = int(os.environ.get("SPARK_GRAFT_MODEL_ITERS", "0"))


def _busy_iters(iters: int) -> None:
    if iters <= 0:
        return
    x = np.arange(8192, dtype=np.float32)
    a, b = np.float32(0.999), np.float32(0.001)
    for _ in range(iters):
        x = x * a + b


class DetectionEngine:
    """Stub detection model: page batch → probability maps."""

    def run(self, batch: np.ndarray) -> np.ndarray:
        if batch.ndim != 4 or batch.shape[-1] not in (1, 3):
            raise ValueError(f"expected B×H×W×C (C=1|3), got {batch.shape}")
        self.simulate_model_cost(batch.shape[0])
        return (255 - batch[..., 0].astype(np.float32)) / 255.0

    @staticmethod
    def simulate_model_cost(n_pages: int) -> None:
        """Emulated per-page CNN cost (see MODEL_ITERS above); no-op by
        default. Called explicitly by the fused stage because the
        affine-folding optimization there bypasses ``run``."""
        _busy_iters(MODEL_ITERS * n_pages)


class OrientationEngine:
    """Stub page-orientation classifier (reference I5: MobileNetV3
    4-class over [0, -90, 180, 90], models/classification/models/
    mobilenet.py:26 + predictor/base.py:37-61). Returns the number of
    CCW np.rot90 turns per page (0..3); rectify with rot90(img, -k)."""

    def run_one(self, img: np.ndarray) -> int:
        return imaging.detect_orientation(img)


class RecognitionEngine:
    """Stub recognition model: crop batch → per-timestep logits."""

    def __init__(self, vocab: str = DEFAULT_VOCAB):
        self.vocab = vocab

    def run(self, batch: np.ndarray) -> np.ndarray:
        if batch.ndim != 4 or batch.shape[-1] not in (1, 3):
            raise ValueError(f"expected B×H×W×C (C=1|3), got {batch.shape}")
        n_classes = len(self.vocab) + 1
        logits = np.zeros((batch.shape[0], batch.shape[2], n_classes), dtype=np.float32)
        for i in range(batch.shape[0]):
            classes = imaging.columns_to_classes(batch[i], self.vocab)
            logits[i] = imaging.classes_to_logits(classes, n_classes)
        return logits


def get_detection_engine() -> DetectionEngine:
    """Per-worker cached detection session (reference engine.py:102-112)."""
    if "det" not in _SESSIONS:
        _SESSIONS["det"] = DetectionEngine()
    return _SESSIONS["det"]  # type: ignore[return-value]


def get_orientation_engine() -> OrientationEngine:
    """Per-worker cached orientation session."""
    if "orient" not in _SESSIONS:
        _SESSIONS["orient"] = OrientationEngine()
    return _SESSIONS["orient"]  # type: ignore[return-value]


def get_recognition_engine(vocab: str = DEFAULT_VOCAB) -> RecognitionEngine:
    """Per-worker cached recognition session. Keyed on the vocab string
    itself — two vocabs of equal length must not collide (the session is
    bound to the label->char map, not just the class count)."""
    key = f"reco:{vocab}"
    if key not in _SESSIONS:
        _SESSIONS[key] = RecognitionEngine(vocab)
    return _SESSIONS[key]  # type: ignore[return-value]
