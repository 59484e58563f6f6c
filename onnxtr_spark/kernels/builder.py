"""Document-builder geometry kernels (reading order, line resolution).

Re-derives the exact math of the reference's DocumentBuilder
(reference: onnxtr/models/builder.py:42-146) for straight pages:

- ``sort_boxes``      — builder.py:42-63: sort key
  ``xmin + 2*ymax / median(heights)``, argsort.
- ``resolve_sub_lines`` — builder.py:65-101: within a line sorted by xmin,
  break when ``xmin_i - xmax_prev >= paragraph_break`` (default 0.035).
- ``resolve_lines``   — builder.py:103-146: sequential scan over sorted
  boxes; a new line starts when the box's y-center deviates from the
  running line-mean y-center by >= median_height / 2.

These are deliberately per-page sequential algorithms (the running mean in
``resolve_lines`` is order-dependent and cannot be a window function); in
Spark they run inside a grouped ``applyInPandas`` over (doc_id, page) —
bounded cardinality per group, embarrassingly parallel across pages.

Rotated-box handling (builder.py:55-62) is out of scope for v1
(``assume_straight_pages=True`` default path, models/zoo.py:19-27).
"""

from __future__ import annotations

import numpy as np

PARAGRAPH_BREAK = 0.035  # reference: models/builder.py:34


def sort_boxes(boxes: np.ndarray) -> np.ndarray:
    """Return indices ordering straight boxes top-to-bottom, left-to-right.

    boxes: (N, 4) relative [xmin, ymin, xmax, ymax].
    Key: ``xmin + 2 * ymax / median(heights)`` (builder.py:63).
    """
    heights = boxes[:, 3] - boxes[:, 1]
    return (boxes[:, 0] + 2 * boxes[:, 3] / np.median(heights)).argsort()


def resolve_sub_lines(
    boxes: np.ndarray, word_idcs: list[int], paragraph_break: float = PARAGRAPH_BREAK
) -> list[list[int]]:
    """Split one visual line into sub-lines at horizontal gaps >= paragraph_break.

    Mirrors builder.py:65-101 exactly, including the sort by xmin within
    the line and the "distance measured from previous box's xmax" rule.
    """
    lines: list[list[int]] = []
    word_idcs = [word_idcs[idx] for idx in boxes[word_idcs, 0].argsort().tolist()]

    if len(word_idcs) < 2:
        lines.append(word_idcs)
        return lines

    sub_line = [word_idcs[0]]
    for i in word_idcs[1:]:
        prev_box = boxes[sub_line[-1]]
        dist = boxes[i, 0] - prev_box[2]
        if dist >= paragraph_break:
            lines.append(sub_line)
            sub_line = []
        sub_line.append(i)
    lines.append(sub_line)
    return lines


def resolve_lines(boxes: np.ndarray, paragraph_break: float = PARAGRAPH_BREAK) -> list[list[int]]:
    """Group straight boxes into reading-order lines (builder.py:103-146).

    Returns a nested list of original box indices, line by line.
    """
    idxs = sort_boxes(boxes)
    y_med = np.median(boxes[:, 3] - boxes[:, 1])
    # per-box y centers once, vectorized: mean(axis=1) over the two
    # columns is the same float op sequence (and dtype) as the per-row
    # boxes[idx][[1, 3]].mean() the scan used to repeat
    y_centers = boxes[:, [1, 3]].mean(axis=1)

    lines: list[list[int]] = []
    words: list[int] = [idxs[0]]
    y_center_sum = y_centers[idxs[0]]

    for idx in idxs[1:]:
        y_dist = abs(y_centers[idx] - y_center_sum / len(words))
        if y_dist >= y_med / 2:
            lines.extend(resolve_sub_lines(boxes, words, paragraph_break))
            words = []
            y_center_sum = 0
        words.append(idx)
        y_center_sum += y_centers[idx]

    if words:
        lines.extend(resolve_sub_lines(boxes, words, paragraph_break))
    return lines


def resolve_blocks(boxes: np.ndarray, lines: list[list[int]], t: float = 0.1) -> list[list[list[int]]]:
    """Group lines into blocks (reference builder.py:148-212, straight path).

    The reference clusters 6 geometric features of each line's enclosing
    bbox with ``scipy.cluster.hierarchy.fclusterdata(t=0.1, depth=4,
    criterion='distance', metric='euclidean')`` — single-linkage flat
    clusters at distance threshold t, which are exactly the connected
    components of the graph with edges where pairwise euclidean distance
    <= t. Blocks keep the reference's ordering: first-occurrence order of
    each cluster, lines in original order within a block (the dict
    grouping at builder.py:201-207).
    """
    # enclosing bbox per line (resolve_enclosing_bbox, utils/geometry.py:167-…)
    bl = np.array(
        [
            [
                boxes[line, 0].min(),
                boxes[line, 1].min(),
                boxes[line, 2].max(),
                boxes[line, 3].max(),
            ]
            for line in lines
        ],
        dtype=np.float64,
    )
    # 6 features (builder.py:186-197, straight branch)
    feats = np.stack(
        (
            (bl[:, 0] + bl[:, 3]) / 2,
            (bl[:, 1] + bl[:, 2]) / 2,
            (bl[:, 0] + bl[:, 2]) / 2,
            (bl[:, 1] + bl[:, 3]) / 2,
            bl[:, 0],
            bl[:, 1],
        ),
        axis=-1,
    )
    n = feats.shape[0]
    d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    adj = d2 <= t * t

    parent = list(range(n))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if adj[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)

    groups: dict[int, list[int]] = {}
    for li in range(n):
        groups.setdefault(find(li), []).append(li)
    return [[lines[idx] for idx in group] for group in groups.values()]


def word_order(boxes: np.ndarray, paragraph_break: float = PARAGRAPH_BREAK) -> tuple[np.ndarray, np.ndarray]:
    """Flatten ``resolve_lines`` into per-word (rank, line_id) arrays.

    Returns (rank, line_id), both shaped (N,), aligned with the input box
    order: ``rank[i]`` is the 0-based reading-order position of box i and
    ``line_id[i]`` its 0-based line index. This is the Spark-friendly
    output consumed by the build stage's ``collect_list`` assembly.
    """
    n = boxes.shape[0]
    rank = np.empty(n, dtype=np.int64)
    line_id = np.empty(n, dtype=np.int64)
    pos = 0
    for li, line in enumerate(resolve_lines(boxes, paragraph_break)):
        for idx in line:
            rank[idx] = pos
            line_id[idx] = li
            pos += 1
    return rank, line_id


def word_order_blocks(
    boxes: np.ndarray, paragraph_break: float = PARAGRAPH_BREAK, block_t: float = 0.1
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Like ``word_order`` but with B4 block clustering: reading order is
    block -> line -> word (blocks reorder lines exactly as the
    reference's export does when resolve_blocks=True, builder.py:210).
    Returns (rank, line_id, block_id)."""
    n = boxes.shape[0]
    rank = np.empty(n, dtype=np.int64)
    line_id = np.empty(n, dtype=np.int64)
    block_id = np.empty(n, dtype=np.int64)
    lines = resolve_lines(boxes, paragraph_break)
    pos = 0
    li_global = 0
    for bi, block in enumerate(resolve_blocks(boxes, lines, block_t)):
        for line in block:
            for idx in line:
                rank[idx] = pos
                line_id[idx] = li_global
                block_id[idx] = bi
                pos += 1
            li_global += 1
    return rank, line_id, block_id
