"""P1-P4 preprocessing as a real float path (reference
models/preprocessor/base.py:28-115 + transforms/base.py:96-126 +
utils/geometry.py:128-164).

The fused/standalone stub stages keep the uint8 fast path (the stub
models are affine in pixel value, so normalization folds away); this
module is the production-contract path a real ONNX model needs —
resize → uint8->float32/255 cast → batch stack → (x - mean)/std
normalize → layout translate — so a real CNN drops into the stages
without stage changes (see engine.EngineConfig.input_contract).
"""

from __future__ import annotations

import math

import numpy as np

from onnxtr_spark.kernels.geometry import resize_preserve

MEAN_DEFAULT = (0.5, 0.5, 0.5)  # PreProcessor defaults, preprocessor/base.py:36-37
STD_DEFAULT = (1.0, 1.0, 1.0)


def shape_translate(data: np.ndarray, format: str) -> np.ndarray:
    """P4 layout projection (utils/geometry.py:128-164): translate
    between (B)CHW and (B)HWC by inspecting which axis holds channels."""
    if format == "HWC":
        if data.ndim != 3:
            raise ValueError("expected 3D array")
        return data if data.shape[2] in (1, 3) else np.moveaxis(data, 0, -1)
    if format == "CHW":
        if data.ndim != 3:
            raise ValueError("expected 3D array")
        return data if data.shape[0] in (1, 3) else np.moveaxis(data, -1, 0)
    if format == "BHWC":
        if data.ndim != 4:
            raise ValueError("expected 4D array")
        return data if data.shape[3] in (1, 3) else np.moveaxis(data, 1, -1)
    if format == "BCHW":
        if data.ndim != 4:
            raise ValueError("expected 4D array")
        return data if data.shape[1] in (1, 3) else np.moveaxis(data, -1, 1)
    return data  # unknown format: identity (reference behavior for 'XYZ')


def cast_scale(x: np.ndarray) -> np.ndarray:
    """P3 (preprocessor/base.py:72-73,99-100): uint8 -> float32 / 255."""
    return x.astype(np.float32) / 255.0 if x.dtype == np.uint8 else x


def normalize(x: np.ndarray, mean=MEAN_DEFAULT, std=STD_DEFAULT) -> np.ndarray:
    """P2 (transforms/base.py:96-126): per-channel (x - mean) / std on a
    channels-last float array."""
    if x.dtype != np.float32:
        raise TypeError("normalize expects float32 (cast_scale first)")
    return (x - np.asarray(mean, dtype=np.float32)) / np.asarray(std, dtype=np.float32)


def cast_normalize(x: np.ndarray, mean=MEAN_DEFAULT, std=STD_DEFAULT) -> np.ndarray:
    """``normalize(cast_scale(x))`` in ONE output buffer: the identical
    IEEE op sequence (/255 cast, broadcast -mean, broadcast /std)
    applied in place, so the values are bit-equal to the composed P2∘P3
    while the three intermediate full-frame allocations the composition
    pays (each a page-sized float32 tensor in the per-page model loop)
    disappear. Pinned equal by test_preprocess_registry."""
    if x.dtype == np.uint8:
        out = x.astype(np.float32)
        out /= np.float32(255.0)
    else:
        if x.dtype != np.float32:
            raise TypeError("cast_normalize expects uint8 or float32")
        out = x.copy()
    out -= np.asarray(mean, dtype=np.float32)
    out /= np.asarray(std, dtype=np.float32)
    return out


def batch_inputs(samples: list[np.ndarray], batch_size: int) -> list[np.ndarray]:
    """I1 (preprocessor/base.py:44-59): stack samples into fixed-size
    batches (last batch ragged)."""
    num_batches = int(math.ceil(len(samples) / batch_size))
    return [
        np.stack(samples[idx * batch_size : min((idx + 1) * batch_size, len(samples))], axis=0)
        for idx in range(num_batches)
    ]


def preprocess_samples(
    samples: list[np.ndarray],
    out_h: int,
    out_w: int,
    batch_size: int,
    mean=MEAN_DEFAULT,
    std=STD_DEFAULT,
    symmetric_pad: bool = True,
    output_format: str = "BHWC",
    pad_value: int = 0,
    preserve_aspect_ratio: bool = True,
) -> list[np.ndarray]:
    """The PreProcessor.__call__ list branch (preprocessor/base.py:
    61-113): per sample HWC translate -> P1 resize+pad -> P3 cast/255;
    then I1 batching and P2 normalize per batch; optional P4 layout for
    channels-first models. Returns a list of float32 batches."""
    # The reference's Resize zero-pads (transforms/base.py:59-71); a
    # real model is trained with that. The stub models interpret pixel
    # value directly (dark = text), so the stub stages pass
    # pad_value=255 (white) for bit-equivalence with the uint8 path.
    if preserve_aspect_ratio:
        resized = [
            cast_scale(resize_preserve(shape_translate(s, "HWC"), out_h, out_w, symmetric_pad, pad_value))
            for s in samples
        ]
    else:
        from onnxtr_spark.kernels.geometry import resize_stretch

        # Resize(preserve_aspect_ratio=False): anisotropic stretch, no
        # padding at all (transforms/base.py:41-50)
        resized = [
            cast_scale(resize_stretch(shape_translate(s, "HWC"), out_h, out_w)) for s in samples
        ]
    batches = [normalize(b, mean, std) for b in batch_inputs(resized, batch_size)]
    if output_format != "BHWC":
        batches = [shape_translate(b, output_format) for b in batches]
    return batches
