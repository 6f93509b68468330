"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169), the hashed-n-gram importance-weight formulation.

Given a small in-domain TARGET set and the raw corpus, DSIR scores every
document by the log-likelihood ratio of two hashed bag-of-words models:

    w_b = log p_target(b) - log p_raw(b)        (per hash bucket b)
    score(doc) = sum over tokens of w_{bucket(token)}

and keeps the documents most target-like. This module implements the
inference shape exactly and engine-reproducibly:

* buckets are ``md5_high64(token) % n_buckets`` (repo convention — the
  SQL mirror recomputes identical buckets);
* both models use add-one smoothing over ``n_buckets`` categories and
  each per-bucket log-prob is quantized to MICRO-NATS (``floor(ln(.)
  * 1e6)``, the unigram-LM convention) BEFORE the subtraction, so the
  weight table is int64 and document scores are exact integer sums —
  order-independent and identical in numpy and DuckDB;
* pass 1 is the combiner histogram: per-batch (bucket, n_all, n_target)
  partials -> one bounded ``groupby(bucket)`` (``n_buckets`` rows of
  metadata; the only ``take_all``); the weight vector broadcasts via
  ``ray.put``;
* pass 2 is ONE streaming actor-pool scoring pass (the classifier
  machinery: factorize unique tokens, bincount int64 weights).

The target set here is designated by a column predicate
(``source == target_source``) so the whole computation stays one
two-pass stream over the corpus; a standalone target corpus drops in by
unioning it in with a marker column.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from pero_ocr_ray.functions.classifier import _md5_high64
from pero_ocr_ray.kernels.textstats import SHINGLE_RE

N_BUCKETS = 4096


def dsir_scores(docs: rd.Dataset, target_source: str = "src0",
                n_buckets: int = N_BUCKETS,
                concurrency: int = 2) -> rd.Dataset:
    """(doc_id, text, source) -> (doc_id, n_tokens, dsir_score_e6,
    keep_doc): importance score in micro-nats; ``keep_doc = 1`` iff the
    doc is at least as target-like as raw (score >= 0). Token-less docs
    score 0 and are kept."""

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(SHINGLE_RE)
        is_tgt = (df["source"] == target_source).to_numpy()
        lens = toks.str.len().fillna(0).astype("int64").to_numpy()
        flat = np.concatenate([np.asarray(t, object) for t in toks]) \
            if len(toks) else np.array([], object)
        if not len(flat):
            return pd.DataFrame({"b": pd.Series([], dtype="int64"),
                                 "na": pd.Series([], dtype="int64"),
                                 "nt": pd.Series([], dtype="int64")})
        codes, uniq = pd.factorize(flat)
        buckets = (_md5_high64(uniq) % np.uint64(n_buckets)) \
            .astype(np.int64)[codes]
        tgt_rep = np.repeat(is_tgt, lens)
        g = (pd.DataFrame({"b": buckets, "t": tgt_rep.astype("int64")})
             .groupby("b", as_index=False)
             .agg(na=("t", "size"), nt=("t", "sum")))
        return g

    hist = (docs.map_batches(count_partial, batch_format="pandas")
            .groupby("b").aggregate(Sum("na", alias_name="na"),
                                    Sum("nt", alias_name="nt")))
    rows = hist.take_all()  # bounded: <= n_buckets metadata rows

    ta = float(sum(int(r["na"]) for r in rows)) + float(n_buckets)
    tt = float(sum(int(r["nt"]) for r in rows)) + float(n_buckets)
    w = np.full(n_buckets,
                int(math.floor(math.log(1.0 / tt) * 1e6))
                - int(math.floor(math.log(1.0 / ta) * 1e6)),
                dtype=np.int64)  # never-seen buckets (never looked up)
    for r in rows:
        b = int(r["b"])
        w[b] = (int(math.floor(math.log((int(r["nt"]) + 1) / tt) * 1e6))
                - int(math.floor(math.log((int(r["na"]) + 1) / ta)
                                 * 1e6)))
    ref = ray.put(w)

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
            return pa.table({
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(counts, pa.int64()),
                "dsir_score_e6": pa.array(score, pa.int64()),
                "keep_doc": pa.array((score >= 0).astype("int64"),
                                     pa.int64()),
            })

    return docs.map_batches(Score, batch_format="pandas",
                            concurrency=concurrency)
