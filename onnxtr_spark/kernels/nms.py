"""Non-maximum suppression (F6), the cv2.dnn.NMSBoxes analog used by the
reference's artefact postprocess (contrib/artefacts.py:98).

Greedy NMS over [xmin, ymin, xmax, ymax] boxes: sort by score
descending (ties broken by lower index — cv2's stable ordering), keep
the best, suppress any remaining box whose IoU with a kept box exceeds
``iou_threshold``; boxes under ``score_threshold`` are dropped first.

Fidelity note: cv2.dnn.NMSBoxes documents its input as (x, y, w, h)
rects while the reference feeds it [xmin, ymin, xmax, ymax]
(contrib/artefacts.py:88-98) — i.e. cv2 silently treats xmax/ymax as
width/height there. We implement the INTENDED xyxy semantics; for the
disjoint artefact layouts this engine emits, both interpretations keep
the same boxes (true boxes never overlap; shifted duplicates overlap
their original under either reading).
"""

from __future__ import annotations

import numpy as np


def nms_boxes(
    boxes: np.ndarray,
    scores: np.ndarray,
    score_threshold: float,
    iou_threshold: float,
) -> list[int]:
    """Indices of kept boxes, in descending-score order (cv2 contract)."""
    if boxes.shape[0] == 0:
        return []
    boxes = np.asarray(boxes, dtype=np.float64)
    scores = np.asarray(scores, dtype=np.float64)
    cand = [i for i in np.argsort(-scores, kind="stable") if scores[i] >= score_threshold]
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    kept: list[int] = []
    for i in cand:
        ok = True
        for j in kept:
            x0 = max(boxes[i, 0], boxes[j, 0])
            y0 = max(boxes[i, 1], boxes[j, 1])
            x1 = min(boxes[i, 2], boxes[j, 2])
            y1 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, x1 - x0) * max(0.0, y1 - y0)
            union = areas[i] + areas[j] - inter
            if union > 0 and inter / union > iou_threshold:
                ok = False
                break
        if ok:
            kept.append(int(i))
    return kept
