"""fastText-style hashed linear document classifier (inference path).

The standard quality-classifier selection step in web-corpus pipelines
(GPT-3's WebText logistic classifier, CCNet/fastText language+quality
heads, FineWeb-Edu's scorer): a trained linear model over hashed
bag-of-words features scores every document, and a threshold on the
mean-per-token score keeps or drops it. This module implements the
inference shape those pipelines run at corpus scale:

* the MODEL is a bounded dense weight vector (``n_buckets`` int64 micro
  units) — broadcast ONCE via ``ray.put`` and read per actor, never
  re-shipped per batch;
* features are hashed unigrams: ``bucket = md5_high64(token) %
  n_buckets`` (the repo-wide md5-high-64 convention, so the DuckDB
  oracle recomputes the exact same buckets);
* scoring is ONE streaming ``map_batches`` actor pool — zero shuffle,
  embarrassingly parallel at 100 TB; per batch only the UNIQUE tokens
  are hashed (``pd.factorize``), then the doc score is a vectorized
  ``bincount`` over int64 weights — exact and order-independent;
* the keep decision is the integer cross-multiplication
  ``score * 1000 >= thr_milli * n_tokens`` (mean-score threshold without
  floats).

The default model is a deterministic pseudo-trained head:
``weight[b] = md5_high64(str(b)) % 2001 - 1000`` (micro units in
[-1000, 1000]) — the SQL mirror derives the identical table in one CTE,
so the gate verifies the full hashing + lookup + aggregation path. A
real trained head drops in as any int64 array of length ``n_buckets``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from pero_ocr_ray.kernels.textstats import SHINGLE_RE

N_BUCKETS = 1024
WEIGHT_MOD = 2001          # weights span [-1000, 1000] micro units
WEIGHT_SHIFT = 1000
DEFAULT_THR_MILLI = 0      # keep iff mean token weight >= 0


def _md5_high64(values) -> np.ndarray:
    """md5-high-64 per string, uint64 (repo hash convention)."""
    return np.fromiter(
        (int(hashlib.md5(v.encode("utf-8")).hexdigest()[:16], 16)
         for v in values), dtype=np.uint64, count=len(values))


def hashed_weights(n_buckets: int = N_BUCKETS) -> np.ndarray:
    """Deterministic pseudo-trained weight vector: ``md5_high64(str(b))
    % WEIGHT_MOD - WEIGHT_SHIFT`` per bucket, int64. Bounded (= model
    size), process-stable, and exactly reproducible in SQL."""
    h = _md5_high64([str(b) for b in range(n_buckets)])
    return (h % np.uint64(WEIGHT_MOD)).astype(np.int64) - WEIGHT_SHIFT


def classify_docs(ds: rd.Dataset, weights: np.ndarray | None = None,
                  n_buckets: int = N_BUCKETS,
                  thr_milli: int = DEFAULT_THR_MILLI,
                  concurrency: int = 2,
                  carry_cols: tuple[str, ...] = ()) -> rd.Dataset:
    """(doc_id, text) -> (doc_id, n_tokens, clf_score, keep_doc
    [, *carry_cols]).

    ``clf_score`` = sum over tokens of ``weights[md5_high64(token) %
    n_buckets]`` (int64, exact); ``keep_doc`` = 1 iff ``clf_score * 1000
    >= thr_milli * n_tokens``. Token-less docs score 0 and are kept iff
    ``thr_milli <= 0`` (0 >= thr*0 is the same rule; both engines agree).
    ``carry_cols`` ride through unchanged (output is 1:1 with input rows)
    so downstream host/domain aggregations need no doc_id join.
    """
    w = hashed_weights(n_buckets) if weights is None else \
        np.asarray(weights, np.int64)
    if len(w) != n_buckets:
        raise ValueError("weights length must equal n_buckets")
    ref = ray.put(w)  # broadcast once; each actor reads from the store

    class Score:
        def __init__(self):
            self.w = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            doc_ids = df["doc_id"].astype("int64").to_numpy()
            toks = df["text"].str.lower().str.findall(SHINGLE_RE)
            counts = toks.str.len().fillna(0).astype("int64").to_numpy()
            flat = np.concatenate([np.asarray(t, object) for t in toks]) \
                if len(toks) else np.array([], object)
            if len(flat):
                codes, uniq = pd.factorize(flat)
                bucket = (_md5_high64(uniq)
                          % np.uint64(n_buckets)).astype(np.int64)
                tok_w = self.w[bucket][codes]
                doc_idx = np.repeat(np.arange(len(df)), counts)
                score = np.bincount(doc_idx, weights=tok_w,
                                    minlength=len(df)).astype(np.int64)
            else:
                score = np.zeros(len(df), np.int64)
            keep = (score * 1000 >= thr_milli * counts).astype("int64")
            out = {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(counts, pa.int64()),
                "clf_score": pa.array(score, pa.int64()),
                "keep_doc": pa.array(keep, pa.int64()),
            }
            for c in carry_cols:
                out[c] = pa.array(df[c])
            return pa.table(out)

    return ds.map_batches(Score, batch_format="pandas",
                          concurrency=concurrency)
