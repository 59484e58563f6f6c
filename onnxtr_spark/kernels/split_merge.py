"""Wide-crop split and prediction merge kernels.

Re-derives the reference's skew-mitigation for very wide word crops:

- ``split_crops`` / ``_split_horizontally`` — reference:
  onnxtr/models/recognition/predictor/_utils.py:16-116. Crops with
  aspect ratio > ``critical_ar`` (8, models/recognition/predictor/base.py:38)
  are sliced into overlapping windows of width ``h * target_ar`` (6) with
  ``overlap_ratio`` (0.5) overlap; the crop_map records how to reassemble.
- ``merge_strings`` / ``merge_multi_strings`` — onnxtr/models/recognition/
  utils.py:12-93: Hamming-distance best-overlap merge (rapidfuzz Hamming
  replaced by an equivalent equal-length mismatch count).
- ``remap_preds`` — recognition/predictor/_utils.py:119-145.

In Spark, splitting fans a wide crop out to several recognize rows
(posexplode of split windows) and the merge runs in the recognize stage
after grouping by crop id — the reference's own skew handling becomes row
fan-out, which is exactly what a shuffle-based engine wants.
"""

from __future__ import annotations

import math

import numpy as np

CRITICAL_AR = 8  # reference: models/recognition/predictor/base.py:38
OVERLAP_RATIO = 0.5  # reference: models/recognition/predictor/base.py:39
TARGET_AR = 6  # reference: models/recognition/predictor/base.py:40

CropMapEntry = int | tuple[int, int, float]


def _hamming(a: str, b: str) -> int:
    """Hamming distance between equal-length strings (rapidfuzz.Hamming
    with processor=None, reference models/recognition/utils.py:7,38)."""
    if len(a) != len(b):
        raise ValueError("hamming distance requires equal-length strings")
    return sum(x != y for x, y in zip(a, b))


def _split_horizontally(
    image: np.ndarray, split_width: int, overlap_width: int, channels_last: bool = True
) -> tuple[list[np.ndarray], float]:
    """Slice an image into overlapping horizontal windows.

    Mirrors recognition/predictor/_utils.py:73-116: fixed-width windows,
    step = split_width - overlap_width, last window snapped to the right
    edge; returns the windows and the actual overlap ratio of the last one.
    """
    image_width = image.shape[1] if channels_last else image.shape[-1]
    if image_width <= split_width:
        return [image], 0.0

    step = split_width - overlap_width
    starts = list(range(0, image_width - split_width + 1, step))
    if starts[-1] + split_width < image_width:
        starts.append(image_width - split_width)

    if channels_last:
        splits = [image[:, s : s + split_width, :] for s in starts]
    else:
        splits = [image[:, :, s : s + split_width] for s in starts]

    last_overlap = 0
    if len(starts) > 1:
        last_overlap = (starts[-2] + split_width) - starts[-1]
    return splits, (last_overlap / split_width if split_width else 0.0)


def split_crops(
    crops: list[np.ndarray],
    max_ratio: float = CRITICAL_AR,
    target_ratio: int = TARGET_AR,
    split_overlap_ratio: float = OVERLAP_RATIO,
    channels_last: bool = True,
) -> tuple[list[np.ndarray], list[CropMapEntry], bool]:
    """Split crops whose aspect ratio exceeds ``max_ratio``.

    Mirrors recognition/predictor/_utils.py:16-70 including the empty-split
    fallback and the (start, end, last_overlap) crop_map encoding.
    """
    if split_overlap_ratio <= 0.0 or split_overlap_ratio >= 1.0:
        raise ValueError(f"Valid range for split_overlap_ratio is (0.0, 1.0), but is: {split_overlap_ratio}")

    remap_required = False
    new_crops: list[np.ndarray] = []
    crop_map: list[CropMapEntry] = []

    for crop in crops:
        h, w = crop.shape[:2] if channels_last else crop.shape[-2:]
        aspect_ratio = w / h

        if aspect_ratio > max_ratio:
            split_width = max(1, math.ceil(h * target_ratio))
            overlap_width = max(0, math.floor(split_width * split_overlap_ratio))
            splits, last_overlap = _split_horizontally(crop, split_width, overlap_width, channels_last)
            splits = [s for s in splits if all(dim > 0 for dim in s.shape)]
            if splits:
                crop_map.append((len(new_crops), len(new_crops) + len(splits), last_overlap))
                new_crops.extend(splits)
                remap_required = True
            else:
                crop_map.append(len(new_crops))
                new_crops.append(crop)
        else:
            crop_map.append(len(new_crops))
            new_crops.append(crop)

    return new_crops, crop_map, remap_required


def merge_strings(a: str, b: str, overlap_ratio: float) -> str:
    """Merge two char sequences maximizing overlap alignment.

    Exact re-derivation of onnxtr/models/recognition/utils.py:12-66:
    crop the possibly-cut-off boundary chars, score every overlap length
    by Hamming distance, prefer unique zero-distance matches, fall back to
    the expected-overlap heuristic.
    """
    seq_len = min(len(a), len(b))
    if seq_len <= 1:
        return a + b

    a_crop, b_crop = a[:-1], b[1:]
    max_overlap = min(len(a_crop), len(b_crop))

    scores = [_hamming(a_crop[-i:], b_crop[:i]) for i in range(1, max_overlap + 1)]
    zero_matches = [i for i, score in enumerate(scores) if score == 0]
    expected_overlap = round(len(b) * overlap_ratio) - 3

    if len(zero_matches) == 1:
        i = zero_matches[0]
        return a_crop + b_crop[i + 1 :]
    elif len(zero_matches) > 1:
        best_i = min(zero_matches, key=lambda x: abs(x - expected_overlap))
        return a_crop + b_crop[best_i + 1 :]

    if expected_overlap < -1:
        return a + b
    elif expected_overlap < 0:
        return a_crop + b_crop

    combined_scores = [score + abs(i - expected_overlap) for i, score in enumerate(scores)]
    best_i = combined_scores.index(min(combined_scores))
    return a_crop + b_crop[best_i + 1 :]


def merge_multi_strings(seq_list: list[str], overlap_ratio: float, last_overlap_ratio: float) -> str:
    """Left-fold ``merge_strings`` over consecutive split predictions
    (reference models/recognition/utils.py:69-93)."""
    if not seq_list:
        return ""
    result = seq_list[0]
    for i in range(1, len(seq_list)):
        ratio = last_overlap_ratio if i == len(seq_list) - 1 else overlap_ratio
        result = merge_strings(result, seq_list[i], ratio)
    return result


def remap_preds(
    preds: list[tuple[str, float]],
    crop_map: list[CropMapEntry],
    overlap_ratio: float,
) -> list[tuple[str, float]]:
    """Reassemble per-split predictions into per-original-crop predictions
    (reference recognition/predictor/_utils.py:119-145; confidence is the
    plain average over splits)."""
    remapped = []
    for item in crop_map:
        if isinstance(item, int):
            remapped.append(preds[item])
        else:
            start_idx, end_idx, last_overlap = item
            text_parts, confidences = zip(*preds[start_idx:end_idx])
            merged_text = merge_multi_strings(list(text_parts), overlap_ratio, last_overlap)
            merged_conf = sum(confidences) / len(confidences)
            remapped.append((merged_text, merged_conf))
    return remapped
