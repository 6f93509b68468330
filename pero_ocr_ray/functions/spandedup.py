"""Exact duplicated-window detection — the fixed-width MapReduce variant
of suffix-array substring dedup (Lee et al., arXiv:2107.06499 §4.1: their
ExactSubstr finds >=50-token repeats with a suffix array; the distributed
approximation used at crawl scale slides a fixed w-token window and marks
windows whose exact text recurs anywhere in the corpus).

Two phases, both hash-shaped so nothing rides a shuffle but digests:

1. explode every document into (window-hash, doc_id) rows. The window
   hash is VECTORIZED (round-5, the ~1 Python ``hashlib.md5`` call per
   corpus token dominated the v4 chain): tokens are factorized per batch
   and hashed once per DISTINCT token (``pd.util.hash_array`` — fixed-key
   siphash, process-stable), then each window digest is a positional
   polynomial over its w token hashes in wrapping uint64 arithmetic with
   a splitmix64 finalizer — all numpy, ~6x the md5 loop on a 1 MB doc.
   The window hash is engine-INTERNAL (a grouping key): the SQL oracle
   keeps the md5-high-64 convention on its own side, and the two engines
   compare only the per-doc COUNTS, which agree up to hash collisions
   (~2^-64-scale on either side, the same class the md5 form had). The
   window stream is token-scale, same as the suffix array's input; it is
   materialized ONCE and consumed by both phases.
2. corpus-wide duplicate set = per-batch partial counts + one
   ``groupby(hash).Sum`` (combiner algebra — a window repeated a million
   times crosses the shuffle as one partial per block), filtered to
   count >= 2;
3. membership join windows x dup-set on a hash bucket (the sparse-safe
   union+groupby shape), emitting per-doc PARTIALS (n_windows,
   n_dup_windows) per bucket, then one tiny per-doc Sum.

Output keeps only documents with at least one window (>= w tokens), like
the SQL mirror's inner join.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

from pero_ocr_ray.kernels.textstats import SHINGLE_RE
from pero_ocr_ray.util import shuffle_partitions

_PART_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_win", pa.int64()), ("n_dup", pa.int64()),
])

# polynomial base + splitmix64 finalizer constants (wrapping uint64)
_POLY_B = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_S30, _S27, _S31 = np.uint64(30), np.uint64(27), np.uint64(31)


def _window_hashes(tok_hashes: np.ndarray, w: int) -> np.ndarray:
    """uint64 token hashes -> uint64 digest per w-token window (positional
    polynomial + splitmix64 finalize; pure numpy, order-sensitive)."""
    n = len(tok_hashes) - w + 1
    wh = np.zeros(n, np.uint64)
    for j in range(w):
        wh = wh * _POLY_B + tok_hashes[j:j + n]
    wh ^= wh >> _S30
    wh *= _MIX1
    wh ^= wh >> _S27
    wh *= _MIX2
    wh ^= wh >> _S31
    return wh


def _bucket_of(whash_i64: np.ndarray, num_buckets: int) -> np.ndarray:
    """int64-view window hash -> bucket id (internal grouping rule)."""
    return (whash_i64.view(np.uint64) % np.uint64(num_buckets)) \
        .astype(np.int64)


def _window_rows(docs: rd.Dataset, w: int,
                 num_buckets: int) -> rd.Dataset:
    """documents -> (whash, doc_id, __b) one row per w-token window."""
    def fn(df: pd.DataFrame) -> pa.Table:
        texts = df["text"].fillna("")
        dids = df["doc_id"].astype("int64").to_numpy()
        toks_per_doc = [SHINGLE_RE.findall(t.lower()) for t in texts]
        all_toks = list(chain.from_iterable(toks_per_doc))
        empty = pa.table({"whash": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "__b": pa.array([], pa.int64())})
        if not all_toks:
            return empty
        # one factorize per batch: each DISTINCT token is hashed once
        codes, uniq = pd.factorize(np.asarray(all_toks, dtype=object))
        th_all = pd.util.hash_array(uniq.astype(object))[codes]
        whs, ids = [], []
        pos = 0
        for did, toks in zip(dids, toks_per_doc):
            m = len(toks)
            seq = th_all[pos:pos + m]
            pos += m
            if m < w:
                continue
            wh = _window_hashes(seq, w)
            whs.append(wh.view(np.int64))
            ids.append(np.full(len(wh), did, np.int64))
        if not whs:
            return empty
        whash = np.concatenate(whs)
        return pa.table({
            "whash": pa.array(whash, pa.int64()),
            "doc_id": pa.array(np.concatenate(ids), pa.int64()),
            "__b": pa.array(_bucket_of(whash, num_buckets), pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pandas")


def dup_window_stats(docs: rd.Dataset, w: int = 8,
                     num_buckets: int = 1024,
                     include_empty: bool = False) -> rd.Dataset:
    """-> (doc_id, n_windows, n_dup_windows): per document, how many of
    its w-token windows recur (exact text) anywhere in the corpus.

    ``include_empty=True`` also emits (doc_id, 0, 0) for documents shorter
    than ``w`` tokens (zero partials unioned into the final Sum) — so a
    downstream keep-filter covers EVERY doc and its id set is never
    sparse (the composition-safe semi-join shape)."""
    windows = _window_rows(docs, w, num_buckets).materialize()

    def count_partial(t: pa.Table) -> pa.Table:
        # zero-copy Arrow group_by: (whash, count) partials per block
        g = (t.select(["whash"]).group_by("whash")
             .aggregate([([], "count_all")]))
        return pa.table({
            "whash": g.column("whash"),
            "n_partial": g.column("count_all"),
        })

    def dup_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        f = t.filter(pc.greater_equal(t.column("n"), 2))
        wh = f.column("whash").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "whash": pa.array(wh, pa.int64()),
            "doc_id": pa.array(np.full(len(wh), -1, np.int64), pa.int64()),
            "__b": pa.array(_bucket_of(wh, num_buckets), pa.int64()),
        })

    dup = (windows.map_batches(count_partial, batch_format="pyarrow")
           .groupby("whash").aggregate(Sum("n_partial", alias_name="n"))
           .repartition(shuffle_partitions())
           .map_batches(dup_only, batch_format="pyarrow"))

    # membership: doc_id == -1 rows mark duplicated hashes; per bucket one
    # vectorized pandas pass emits per-doc partials
    def mark(g: pd.DataFrame) -> pa.Table:
        dup_set = set(g.loc[g["doc_id"] < 0, "whash"])
        win = g[g["doc_id"] >= 0]
        if len(win) == 0:
            return _PART_SCHEMA.empty_table()
        isdup = win["whash"].isin(dup_set)
        part = (pd.DataFrame({"doc_id": win["doc_id"],
                              "d": isdup.astype("int64")})
                .groupby("doc_id", as_index=False)
                .agg(n_win=("d", "size"), n_dup=("d", "sum")))
        return pa.table({
            "doc_id": pa.array(part["doc_id"].to_numpy("int64"),
                               pa.int64()),
            "n_win": pa.array(part["n_win"].to_numpy("int64"), pa.int64()),
            "n_dup": pa.array(part["n_dup"].to_numpy("int64"), pa.int64()),
        })

    parts = (windows.union(dup)
             .groupby("__b").map_groups(mark, batch_format="pandas"))

    if include_empty:
        def zeros(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            n = t.num_rows
            return pa.table({
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "n_win": pa.array([0] * n, pa.int64()),
                "n_dup": pa.array([0] * n, pa.int64()),
            })
        parts = parts.union(
            docs.select_columns(["doc_id"])
                .map_batches(zeros, batch_format="pyarrow"))

    agg = (parts.groupby("doc_id")
           .aggregate(Sum("n_win", alias_name="n_windows"),
                      Sum("n_dup", alias_name="n_dup_windows")))

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_windows": pc.cast(t.column("n_windows"), pa.int64()),
            "n_dup_windows": pc.cast(t.column("n_dup_windows"),
                                     pa.int64()),
        })

    return (agg.repartition(shuffle_partitions())
            .map_batches(finalize, batch_format="pyarrow"))
