"""Exact fixed-point k-means and greedy semantic dedup (SemDeDup).

Why fixed-point: distributed centroid updates sum float coordinates
across shuffle partials in nondeterministic order — run-to-run ulp drift
that flips boundary assignments and breaks the repo's byte-identity
invariant. Quantizing every embedding to int64 (``x * 2^20``, round half
up) makes EVERY k-means quantity exact integer arithmetic:

* squared L2 distances: |values| <= 0.5 (unit-norm corpus) so a
  coordinate is < 2^20, a diff < 2^21, its square < 2^42, a 64-dim sum
  < 2^48 — exact in int64;
* centroid update = floor(int sum / count) — order-independent;
* assignment argmin ties break to the smaller cluster index.

The sequential oracle (tools/make_golden_fixtures.py) replays these SAME
functions in one process; distributed == sequential by construction, not
by float luck.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus, then
within each cluster greedily drop any vector cosine-similar (>= thr) to
an already-kept earlier (smaller-id) vector. Cosines are computed from
the EXACT integer dot products (float only in the final divide, same op
order in both engines).
"""

from __future__ import annotations

import numpy as np

SCALE = 1 << 20


def quantize(x: np.ndarray) -> np.ndarray:
    """float matrix -> int64 fixed point (round half up, sign-symmetric
    inputs here are embeddings in [-1, 1])."""
    return np.floor(np.asarray(x, dtype=np.float64) * SCALE + 0.5).astype(
        np.int64)


def assign_q(xq: np.ndarray, cq: np.ndarray) -> tuple[np.ndarray,
                                                      np.ndarray]:
    """-> (labels, dist2): exact argmin_j |x - c_j|^2 over int64; ties go
    to the smaller cluster index (strict < update)."""
    n = xq.shape[0]
    best = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    lab = np.zeros(n, dtype=np.int64)
    for j in range(cq.shape[0]):
        d = xq - cq[j]
        dist = np.einsum("ij,ij->i", d, d)
        m = dist < best
        lab[m] = j
        best[m] = dist[m]
    return lab, best


def partial_sums_q(xq: np.ndarray, labels: np.ndarray,
                   k: int) -> tuple[np.ndarray, np.ndarray]:
    """-> (counts[k], sums[k, d]) int64 — the mergeable combiner payload."""
    counts = np.bincount(labels, minlength=k).astype(np.int64)
    sums = np.zeros((k, xq.shape[1]), dtype=np.int64)
    np.add.at(sums, labels, xq)
    return counts, sums


def centroids_from_sums(sums: np.ndarray, counts: np.ndarray,
                        prev: np.ndarray) -> np.ndarray:
    """floor-div integer mean; an empty cluster keeps its previous
    centroid (deterministic, no reseeding RNG)."""
    out = prev.copy()
    nz = counts > 0
    out[nz] = sums[nz] // counts[nz, None]
    return out


def kmeans_fit_q(xq: np.ndarray, ids: np.ndarray, k: int,
                 iters: int) -> np.ndarray:
    """Sequential reference: init = embeddings of the k smallest ids
    (ascending), then ``iters`` exact Lloyd steps. Returns int64
    centroids [k, d]."""
    order = np.argsort(ids, kind="stable")[:k]
    cq = xq[order].copy()
    for _ in range(iters):
        labels, _ = assign_q(xq, cq)
        counts, sums = partial_sums_q(xq, labels, k)
        cq = centroids_from_sums(sums, counts, cq)
    return cq


def semdedup_group(ids: np.ndarray, xq: np.ndarray,
                   threshold_e6: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy within-cluster dedup over id-ascending rows: a vector is
    dropped iff its cosine (in integer micro-units from exact int dots)
    with an already-KEPT earlier vector reaches ``threshold_e6``;
    ``dropped_by`` is the smallest such keeper id (or -1 if kept).

    Returns (kept bool[n], dropped_by int64[n]); caller pre-sorts by id.
    """
    n = len(ids)
    dots = xq @ xq.T                              # exact int64
    norms = np.sqrt(np.diag(dots).astype(np.float64))
    cos_e6 = np.floor(dots / np.outer(norms, norms) * 1e6).astype(np.int64)
    kept = np.zeros(n, dtype=bool)
    dropped_by = np.full(n, -1, dtype=np.int64)
    kept_idx = np.empty(n, dtype=np.int64)
    nk = 0
    for i in range(n):
        if nk:
            m = np.nonzero(cos_e6[i, kept_idx[:nk]] >= threshold_e6)[0]
            if m.size:
                # keepers ascend by id, so the first hit is the smallest
                dropped_by[i] = ids[kept_idx[m[0]]]
                continue
        kept[i] = True
        kept_idx[nk] = i
        nk += 1
    return kept, dropped_by
