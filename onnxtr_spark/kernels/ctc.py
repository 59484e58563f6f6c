"""CTC greedy (best-path) decoding.

Re-derives the reference's CRNN postprocessor
(onnxtr/models/recognition/models/crnn.py:55-101):

- per-timestep argmax over classes,
- collapse of consecutive repeats,
- removal of the blank label (index = len(vocab)),
- word confidence = min over timesteps of the max softmax probability.

Vectorized NumPy (shift-compare collapse) instead of itertools.groupby —
same result, batch-friendly inside the recognize ``mapInPandas`` stage.
"""

from __future__ import annotations

import numpy as np


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Numerically-stable softmax (scipy.special.softmax equivalent,
    reference crnn.py:79)."""
    shifted = x - x.max(axis=axis, keepdims=True)
    e = np.exp(shifted)
    return e / e.sum(axis=axis, keepdims=True)


def decode_sequence(sequence: list[int], vocab: str) -> str:
    """Map label indices to characters (reference crnn.py:58-59)."""
    return "".join(vocab[int(c)] for c in sequence)


def attention_decode(
    logits: np.ndarray, vocab: str, conf_reduction: str = "mean"
) -> list[tuple[str, float]]:
    """Attention-style positional decode (C2): argmax per position,
    truncate at <eos> (index len(vocab)).

    Mirrors the reference's ViTSTR/PARSeq postprocessors
    (models/recognition/models/vitstr.py:95-109, parseq.py:86-100):
    confidence = mean of per-char top probability over the decoded
    length (+eos); SAR/MASTER use min instead (sar.py:87-99) —
    selectable via ``conf_reduction``.
    """
    eos = len(vocab)
    m = logits.max(axis=-1, keepdims=True)
    s = np.exp(logits - m).sum(axis=-1)
    probs = 1.0 / s  # per-step top softmax prob (see ctc_best_path note)
    best = np.argmax(logits, axis=-1)

    out = []
    reduce = np.mean if conf_reduction == "mean" else np.min
    for seq, p in zip(best, probs):
        stops = np.flatnonzero(seq == eos)
        end = int(stops[0]) if stops.size else len(seq)
        word = decode_sequence(seq[:end].tolist(), vocab)
        conf = float(reduce(p[: end + 1])) if end + 1 <= len(p) else float(reduce(p))
        out.append((word, conf))
    return out


def ctc_best_path(logits: np.ndarray, vocab: str, blank: int | None = None) -> list[tuple[str, float]]:
    """Best-path decode of a (N, T, C) logits batch.

    Confidence: ``softmax(logits).max(-1).min(1)`` — smallest per-step
    top-probability across the sequence (reference crnn.py:78-79).
    Collapse: drop consecutive duplicates, then drop blanks
    (reference crnn.py:82-86).
    """
    if blank is None:
        blank = len(vocab)

    # Per-step top softmax probability without materializing the full
    # softmax: max(softmax(l)) = exp(m - m) / sum(exp(l - m)) = 1 / s.
    # Identical float ops to softmax(...).max(-1) (same shift, same sum,
    # same single division) at ~1/3 the memory traffic — this kernel is
    # DRAM-bound at high core counts.
    m = logits.max(axis=-1, keepdims=True)
    s = np.exp(logits - m).sum(axis=-1)  # (N, T)
    probs = (1.0 / s).min(axis=1)
    best = np.argmax(logits, axis=-1)  # (N, T)

    words = []
    for seq in best:
        keep = np.ones(len(seq), dtype=bool)
        keep[1:] = seq[1:] != seq[:-1]  # collapse repeats
        collapsed = seq[keep]
        collapsed = collapsed[collapsed != blank]  # drop blank
        words.append(decode_sequence(collapsed.tolist(), vocab))

    return list(zip(words, probs.astype(float).tolist()))
