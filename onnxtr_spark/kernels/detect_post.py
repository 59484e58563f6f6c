"""Detection post-processing: probability map -> relative word boxes.

Re-derives the reference's GeneralDetectionPostProcessor straight-page
path (onnxtr/models/detection/postprocessor/base.py:20-139 and
onnxtr/models/detection/core.py:33-90) without cv2/pyclipper:

- D1 binarize: ``prob_map >= bin_thresh`` (core.py:89; FAST defaults
  bin=0.1, box=0.1 — models/detection/models/fast.py:57-58).
- D2 morphological open, 3x3 ones kernel (core.py:86, kernel core.py:28).
  cv2 border semantics: erosion treats out-of-image as foreground,
  dilation as background.
- D3 connected components: the reference uses
  ``cv2.findContours(RETR_EXTERNAL)`` (postprocessor/base.py:103); we use
  two-pass union-find labeling — for straight pages only the component's
  bounding rectangle is consumed downstream, which is identical.
- small-component filter: contour coordinate span (max-min) < 2 dropped
  (postprocessor/base.py:106), i.e. pixel extent < 3.
- D4 box score: mean prob over the (clipped) bounding rect
  (core.py:46-52); drop below box_thresh (postprocessor/base.py:116).
- D5 unclip expansion: the reference offsets the polygon outward by
  ``distance = area * unclip_ratio / length`` with pyclipper round joins
  and takes the bounding rect (postprocessor/base.py:38-81,
  unclip_ratio=1.5 at :36). For an axis-aligned rectangle, the round-join
  offset's bounding rect is exactly the rectangle grown by ``distance``
  on each side — computed analytically here. cv2.boundingRect returns
  integer x, y, w, h (floor/ceil), matched via int truncation of the
  grown rect.
- D6 relative coords + clip to [0,1] (postprocessor/base.py:126-128,137).
- P8 padding removal for aspect-preserving resize
  (onnxtr/models/detection/_utils/base.py:12-62), symmetric and
  asymmetric, straight path.
"""

from __future__ import annotations

import numpy as np

BIN_THRESH = 0.1  # reference: models/detection/models/fast.py:57
BOX_THRESH = 0.1  # reference: models/detection/models/fast.py:58
UNCLIP_RATIO = 1.5  # reference: models/detection/postprocessor/base.py:36


def binary_open_3x3(bitmap: np.ndarray) -> np.ndarray:
    """3x3 morphological opening of a binary (0/1 uint8) map.

    Matches cv2.morphologyEx(MORPH_OPEN, ones((3,3))) on binary input:
    erosion pads with foreground (border pixels survive), dilation pads
    with background.
    """
    h, w = bitmap.shape
    return np.unpackbits(_open_3x3_packed(bitmap), axis=1)[:, :w]


def _open_3x3_packed(bitmap: np.ndarray) -> np.ndarray:
    """``binary_open_3x3`` in packed-bit form (pad bits beyond ``w``
    CLEARED, so ``_label_runs_packed`` can consume it directly without
    the unpack/repack roundtrip)."""
    h, w = bitmap.shape
    # Bit-packed separable 3x3 (the ones-kernel factorizes into
    # rows×cols): the map lives as h×(w/8) bytes (~32 KB for 512²), so
    # the 12 shift/AND/OR passes touch 8× less memory than byte-per-
    # pixel — this kernel is DRAM-bound at high core counts.
    bits = np.packbits(bitmap if bitmap.dtype == np.bool_ else bitmap.astype(bool), axis=1)  # big-endian: col 0 = bit 7

    def sh_hi(a: np.ndarray, border: int) -> np.ndarray:
        """Pattern shifted one column toward higher col index."""
        out = a >> 1
        out[:, 1:] |= (a[:, :-1] & 1) << 7
        if border:
            out[:, 0] |= 0x80
        return out

    def sh_lo(a: np.ndarray, border: int) -> np.ndarray:
        """Pattern shifted one column toward lower col index."""
        out = (a << 1).astype(np.uint8)
        out[:, :-1] |= a[:, 1:] >> 7
        if border:
            out[:, -1] |= 0x01
        return out

    # Column padding bits beyond w must act as foreground for erosion
    # (cv2 border semantics); packbits already zero-fills them.
    pad_bits = (-w) % 8
    if pad_bits:
        edge = np.uint8(((1 << pad_bits) - 1))
        bits_er = bits.copy()
        bits_er[:, -1] |= edge
    else:
        bits_er = bits

    er = bits_er & sh_hi(bits_er, 1) & sh_lo(bits_er, 1)
    er = er & np.vstack([np.full((1, er.shape[1]), 0xFF, np.uint8), er[:-1]]) \
             & np.vstack([er[1:], np.full((1, er.shape[1]), 0xFF, np.uint8)])
    if pad_bits:
        er[:, -1] &= np.uint8(0xFF ^ edge)  # pad cols must not survive into dilation
    di = er | sh_hi(er, 0) | sh_lo(er, 0)
    di = di | np.vstack([np.zeros((1, di.shape[1]), np.uint8), di[:-1]]) \
            | np.vstack([di[1:], np.zeros((1, di.shape[1]), np.uint8)])
    if pad_bits:
        di[:, -1] &= np.uint8(0xFF ^ edge)  # dilation spills into pad cols: clear
    return di


def label_runs(bitmap: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """8-connected component labeling over row runs, fully vectorized.

    Returns (ys, xs, xe, lab): one entry per horizontal run in raster
    order (runs = [xs, xe) on row ys), with ``lab`` the run index of the
    component's topmost-leftmost run — i.e. components are identified by
    the minimum run index they contain, so ascending unique label order
    equals the raster order of each component's first run (the exact
    deterministic contract the old union-find loop had).

    Vectorization: run extraction is one diff over the padded map; the
    8-connectivity edges between a run and the previous row's runs are
    found with two searchsorted calls over composite (row, x) keys (the
    overlapping runs of the previous row form a contiguous index range
    because runs within a row are disjoint and sorted); the component
    labels are resolved by min-label propagation with pointer jumping
    (O(log diameter) vectorized rounds) instead of a per-run Python
    union-find loop — same fixpoint (min run index per component).
    """
    h, w = bitmap.shape
    # Packed-bit run extraction: transitions are found on the h×(w/8)
    # byte map instead of diffing the h×(w+2) int8 map — ~6× less
    # memory traffic for the two full-map scans (start bits are
    # ``b & ~prev``, end bits ``prev & ~b``, prev = the column-left
    # pattern, exactly the padded-diff's +1/−1 events). A zero byte
    # column is appended so a run ending at column w has a bit to land
    # on; packbits' zero pad bits handle the non-multiple-of-8 case.
    # Within a row, runs alternate start < end < start …, so the two
    # raster-ordered nonzero scans yield aligned (xs, xe) pairs — the
    # same arrays the diff produced.
    bits = np.packbits(bitmap if bitmap.dtype == np.bool_ else bitmap.astype(bool), axis=1)  # col 0 = bit 7
    return _label_runs_packed(bits, h, w)


def _label_runs_packed(
    bits: np.ndarray, h: int, w: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """``label_runs`` over an already-packed bit map (pad bits beyond
    ``w`` must be clear — ``_open_3x3_packed`` guarantees it)."""
    bits = np.concatenate([bits, np.zeros((h, 1), dtype=np.uint8)], axis=1)
    prev = bits >> 1
    prev[:, 1:] |= (bits[:, :-1] & 1) << 7
    start_p = bits & ~prev
    end_p = prev & ~bits

    def _positions(packed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        ry, rb = np.nonzero(packed)
        if len(ry) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z
        exp = np.unpackbits(packed[ry, rb][:, None], axis=1)
        si, bitpos = np.nonzero(exp)
        return ry[si].astype(np.int64), rb[si].astype(np.int64) * 8 + bitpos

    ys, xs = _positions(start_p)
    ys_e, xe = _positions(end_p)
    n = len(ys)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z

    # 8-connectivity edges to the previous row: prev run overlaps iff
    # pxs <= xe and pxe >= xs (the +/-1 extension on integer runs). With
    # composite keys k = y * K + x (K > any x) the matching prev-row runs
    # are exactly the contiguous searchsorted range — runs of earlier
    # rows sort strictly below, runs of later rows strictly above.
    K = w + 2
    k_start = ys * K + xs
    k_end = ys * K + xe
    lo = np.searchsorted(k_end, (ys - 1) * K + xs, side="left")
    hi = np.searchsorted(k_start, (ys - 1) * K + xe, side="right")
    cnt = np.maximum(hi - lo, 0)
    total = int(cnt.sum())
    lab = np.arange(n, dtype=np.int64)
    if total:
        ea = np.repeat(lab, cnt)
        off = np.cumsum(cnt) - cnt
        eb = np.arange(total, dtype=np.int64) - np.repeat(off, cnt) + np.repeat(lo, cnt)
        while True:
            m = np.minimum(lab[ea], lab[eb])
            nxt = lab.copy()
            np.minimum.at(nxt, ea, m)
            np.minimum.at(nxt, eb, m)
            nxt = np.minimum(nxt, nxt[nxt])  # pointer jump
            if np.array_equal(nxt, lab):
                break
            lab = nxt
    return ys.astype(np.int64), xs.astype(np.int64), xe.astype(np.int64), lab


def connected_components(bitmap: np.ndarray) -> list[tuple[int, int, int, int]]:
    """8-connected components of a binary map -> bounding rects (x, y, w, h).

    Vectorized run labeling (``label_runs``); rects are returned in
    raster order of the component's topmost-leftmost run (deterministic,
    identical to the previous union-find implementation).
    """
    return _rects_from_runs(*label_runs(bitmap))


def _components_packed(binmap: np.ndarray, morph_open: bool) -> list[tuple[int, int, int, int]]:
    """``connected_components`` of (optionally opened) ``binmap``
    through the packed-bit pipeline — the opened bit map goes straight
    into run labeling without the unpack/repack roundtrip."""
    if morph_open:
        h, w = binmap.shape
        return _rects_from_runs(*_label_runs_packed(_open_3x3_packed(binmap), h, w))
    return _rects_from_runs(*label_runs(binmap))


def _rects_from_runs(
    ys: np.ndarray, xs: np.ndarray, xe: np.ndarray, lab: np.ndarray
) -> list[tuple[int, int, int, int]]:
    if len(ys) == 0:
        return []
    roots, inv = np.unique(lab, return_inverse=True)  # ascending = raster order
    k = len(roots)
    x0 = np.full(k, np.iinfo(np.int64).max)
    y0 = np.full(k, np.iinfo(np.int64).max)
    x1 = np.zeros(k, dtype=np.int64)
    y1 = np.zeros(k, dtype=np.int64)
    np.minimum.at(x0, inv, xs)
    np.minimum.at(y0, inv, ys)
    np.maximum.at(x1, inv, xe)
    np.maximum.at(y1, inv, ys + 1)
    return list(zip((x0).tolist(), (y0).tolist(), (x1 - x0).tolist(), (y1 - y0).tolist()))


def box_score(pred: np.ndarray, xmin: float, ymin: float, xmax: float, ymax: float) -> float:
    """Mean probability over the clipped integer bounding rect
    (reference core.py:46-52, straight path)."""
    import math

    h, w = pred.shape[:2]
    x0 = min(max(math.floor(xmin), 0), w - 1)
    x1 = min(max(math.ceil(xmax), 0), w - 1)
    y0 = min(max(math.floor(ymin), 0), h - 1)
    y1 = min(max(math.ceil(ymax), 0), h - 1)
    return float(pred[y0 : y1 + 1, x0 : x1 + 1].mean())


def unclip_rect(x: int, y: int, w: int, h: int, unclip_ratio: float = UNCLIP_RATIO) -> tuple[int, int, int, int]:
    """Analytic unclip of an axis-aligned rect (reference
    postprocessor/base.py:38-81 for the straight path): grow by
    ``distance = area * ratio / perimeter`` on each side, then integer
    bounding rect (floor origin, ceil extent — cv2.boundingRect on the
    offset polygon's float points)."""
    import math

    area = float(w * h)
    length = 2.0 * (w + h)
    if length == 0:
        return x, y, w, h
    d = area * unclip_ratio / length
    # math.floor/ceil are the identical IEEE operations np.floor/np.ceil
    # perform, without the per-box ufunc dispatch (hot: once per box)
    x0 = math.floor(x - d)
    y0 = math.floor(y - d)
    x1 = math.ceil(x + w + d)
    y1 = math.ceil(y + h + d)
    return x0, y0, x1 - x0, y1 - y0


def bitmap_to_boxes(
    pred: np.ndarray,
    bitmap: np.ndarray,
    box_thresh: float = BOX_THRESH,
    unclip_ratio: float = UNCLIP_RATIO,
) -> np.ndarray:
    """Binary map -> (N, 5) array of [xmin, ymin, xmax, ymax, score],
    relative coords clipped to [0,1] (reference postprocessor/base.py:83-139,
    straight path)."""
    height, width = bitmap.shape[:2]
    return _boxes_from_components(
        pred, connected_components(bitmap), height, width, box_thresh, unclip_ratio
    )


def _boxes_from_components(
    pred: np.ndarray,
    comps: list[tuple[int, int, int, int]],
    height: int,
    width: int,
    box_thresh: float,
    unclip_ratio: float,
) -> np.ndarray:
    boxes: list[list[float]] = []
    for x, y, w, h in comps:
        # Small-extent filter (postprocessor/base.py:106): the reference
        # drops contours whose coordinate span (max - min) < 2 in either
        # axis; pixel-count extent = span + 1, so drop w < 3 or h < 3.
        if w < 3 or h < 3:
            continue
        score = box_score(pred, x, y, x + w, y + h)
        if score < box_thresh:
            continue
        ex, ey, ew, eh = unclip_rect(x, y, w, h, unclip_ratio)
        xmin, ymin = ex / width, ey / height
        xmax, ymax = (ex + ew) / width, (ey + eh) / height
        boxes.append([xmin, ymin, xmax, ymax, score])
    if not boxes:
        return np.zeros((0, 5), dtype=pred.dtype)
    return np.clip(np.asarray(boxes, dtype=pred.dtype), 0, 1)


def remove_padding(
    boxes: np.ndarray,
    page_h: int,
    page_w: int,
    preserve_aspect_ratio: bool = True,
    symmetric_pad: bool = True,
) -> np.ndarray:
    """Invert aspect-ratio padding on relative straight boxes (N, 5).

    Exact re-derivation of onnxtr/models/detection/_utils/base.py:12-62
    (straight-page branches); the score column is untouched.
    """
    if not preserve_aspect_ratio or boxes.shape[0] == 0:
        return boxes
    out = boxes.copy()
    if page_h > page_w:
        if symmetric_pad:
            out[:, [0, 2]] = (out[:, [0, 2]] - 0.5) * page_h / page_w + 0.5
        else:
            out[:, [0, 2]] *= page_h / page_w
    elif page_w > page_h:
        if symmetric_pad:
            out[:, [1, 3]] = (out[:, [1, 3]] - 0.5) * page_w / page_h + 0.5
        else:
            out[:, [1, 3]] *= page_w / page_h
    out[:, :4] = np.clip(out[:, :4], 0, 1)
    return out


def postprocess_prob_map(
    prob_map: np.ndarray,
    bin_thresh: float = BIN_THRESH,
    box_thresh: float = BOX_THRESH,
    unclip_ratio: float = UNCLIP_RATIO,
    morph_open: bool = True,
) -> np.ndarray:
    """Full D1-D6 chain for one page's (H, W) probability map."""
    binmap = prob_map >= bin_thresh
    height, width = binmap.shape[:2]
    return _boxes_from_components(
        prob_map, _components_packed(binmap, morph_open), height, width, box_thresh, unclip_ratio
    )


def postprocess_pixel_map(
    px_map: np.ndarray,
    bin_thresh: float = BIN_THRESH,
    box_thresh: float = BOX_THRESH,
    unclip_ratio: float = UNCLIP_RATIO,
    morph_open: bool = True,
) -> np.ndarray:
    """D1-D6 folded through an affine prob model, directly on the uint8
    map (prob = (255 - px)/255, engine.py DetectionEngine).

    The stub model is linear in pixel value, so D1's threshold and D4's
    rect-mean commute through it: ``prob >= t  <=>  px <= 255 - 255t``
    and ``mean(prob) = (255 - mean(px))/255``. This skips materializing
    the HxW float32 map entirely — whole-stage-codegen-style fusion
    across the model boundary; a real CNN can't be folded, in which case
    the caller materializes prob and uses ``postprocess_prob_map``.
    Box geometry is bit-identical; only the objectness score can differ
    in the last float ulps (float64 rect mean vs float32 map mean).
    """
    pix_thresh = float(np.floor(255.0 - 255.0 * bin_thresh))
    binmap = px_map <= pix_thresh

    height, width = binmap.shape[:2]
    boxes: list[list[float]] = []
    for x, y, w, h in _components_packed(binmap, morph_open):
        if w < 3 or h < 3:  # contour-span < 2 (see bitmap_to_boxes)
            continue
        # x, y, w, h are exact ints from the labeling: floor/ceil are
        # identities and the clip is two int comparisons
        x0 = min(max(x, 0), width - 1)
        x1 = min(max(x + w, 0), width - 1)
        y0 = min(max(y, 0), height - 1)
        y1 = min(max(y + h, 0), height - 1)
        score = (255.0 - float(px_map[y0 : y1 + 1, x0 : x1 + 1].mean())) / 255.0
        if score < box_thresh:
            continue
        ex, ey, ew, eh = unclip_rect(x, y, w, h, unclip_ratio)
        boxes.append([ex / width, ey / height, (ex + ew) / width, (ey + eh) / height, score])
    if not boxes:
        return np.zeros((0, 5), dtype=np.float32)
    return np.clip(np.asarray(boxes, dtype=np.float32), 0, 1)
