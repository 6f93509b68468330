"""Confusion networks + partial top-k (G6/O6 analogs).

From-scratch reimplementations of the reference's hypothesis-merging
utilities: confusion-network ("sausage") construction by aligning N
weighted hypotheses to a pivot
(/root/reference/pero_ocr/decoding/confusion_networks.py:13-74) and the
argpartition-based top-k (/root/reference/pero_ocr/decoding/multisort.py:4-15).
Row-local: used to merge multiple extraction candidates for one document
(e.g. alternative parses of a malformed page), never across documents.
"""

from __future__ import annotations

import math

import numpy as np

from pero_ocr_ray.kernels.align import levenshtein_alignment


def top_k(scores: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k largest entries, ordered desc (ties: lower index)."""
    scores = np.asarray(scores)
    k = min(k, scores.shape[-1])
    part = np.argpartition(-scores, k - 1, axis=-1)[..., :k]
    # stable ordering inside the partition: by (-score, index)
    order = np.lexsort((part, -np.take_along_axis(scores, part, -1)), axis=-1)
    return np.take_along_axis(part, order, -1)


def add_hypothesis(cn: list[dict[str | None, float]], hyp: list[str],
                   weight: float) -> list[dict[str | None, float]]:
    """Align ``hyp`` (token list) to the confusion network and add its
    weight. ``None`` is the epsilon (skip) token."""
    if not cn:
        return [{tok: weight} for tok in hyp]
    pivot = [max(slot.items(), key=lambda kv: (kv[1], str(kv[0])))[0] or ""
             for slot in cn]
    pairs = levenshtein_alignment(pivot, hyp)
    out: list[dict[str | None, float]] = []
    ci = 0
    for p_tok, h_tok in pairs:
        if p_tok is not None:
            slot = dict(cn[ci])
            ci += 1
            slot[h_tok] = slot.get(h_tok, 0.0) + weight
            out.append(slot)
        else:  # insertion relative to pivot: new slot with epsilon mass
            slot = {None: sum(cn[0].values()) if cn else 0.0}
            slot[h_tok] = slot.get(h_tok, 0.0) + weight
            out.append(slot)
    return out


def build_confusion_network(hypotheses: list[tuple[list[str], float]],
                            ) -> list[dict[str | None, float]]:
    """Merge (tokens, weight) hypotheses into a normalized sausage."""
    cn: list[dict[str | None, float]] = []
    for tokens, weight in hypotheses:
        cn = add_hypothesis(cn, tokens, weight)
    for slot in cn:
        total = sum(slot.values())
        if total > 0:
            for k in list(slot):
                slot[k] /= total
    return cn


def best_path(cn: list[dict[str | None, float]]) -> list[str]:
    """Highest-probability token per slot, epsilon slots dropped."""
    out = []
    for slot in cn:
        tok = max(slot.items(), key=lambda kv: (kv[1], str(kv[0])))[0]
        if tok is not None:
            out.append(tok)
    return out


def greedy_collapse(labels, blank=None) -> list:
    """CTC-style greedy collapse (M15/M16 analog,
    /root/reference/pero_ocr/char_confidences.py:4-26): drop repeats, then
    drop blanks — the per-frame argmax -> symbol sequence reduction."""
    out = []
    prev = object()
    for lab in labels:
        if lab != prev:
            if lab != blank:
                out.append(lab)
            prev = lab
    return out


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Numerically-stable softmax (M17 analog, ocr_engine/softmax.py:4-46)."""
    x = np.asarray(x, dtype=np.float64)
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def log_softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    m = x.max(axis=axis, keepdims=True)
    return x - m - np.log(np.exp(x - m).sum(axis=axis, keepdims=True))


def logaddexp(a: float, b: float) -> float:
    """Prefix-mass merge helper (D3 analog, decoders.py:138-155)."""
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))
