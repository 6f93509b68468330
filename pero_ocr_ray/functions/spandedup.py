"""Exact duplicated-window detection — the fixed-width MapReduce variant
of suffix-array substring dedup (Lee et al., arXiv:2107.06499 §4.1: their
ExactSubstr finds >=50-token repeats with a suffix array; the distributed
approximation used at crawl scale slides a fixed w-token window and marks
windows whose exact text recurs anywhere in the corpus).

Two phases, both hash-shaped so nothing rides a shuffle but digests:

1. explode every document into (window-hash, doc_id) rows — the window
   hash is md5-high-64-hex of the w-token lowercase shingle text (repo
   convention). The window stream is token-scale, same as the suffix
   array's input; it is materialized ONCE and consumed by both phases.
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

import hashlib

import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

from pero_ocr_ray.kernels.textstats import SHINGLE_RE

_PART_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_win", pa.int64()), ("n_dup", pa.int64()),
])


def _window_rows(docs: rd.Dataset, w: int,
                 num_buckets: int) -> rd.Dataset:
    """documents -> (whash, doc_id, __b) one row per w-token window."""
    def fn(df: pd.DataFrame) -> pa.Table:
        hs, ids, bs = [], [], []
        for did, text in zip(df["doc_id"].astype("int64"),
                             df["text"].fillna("")):
            toks = SHINGLE_RE.findall(text.lower())
            for i in range(len(toks) - w + 1):
                h = hashlib.md5(" ".join(toks[i:i + w]).encode()
                                ).hexdigest()[:16]
                hs.append(h)
                ids.append(int(did))
                bs.append(int(h[:8], 16) % num_buckets)
        return pa.table({
            "whash": pa.array(hs, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "__b": pa.array(bs, pa.int64()),
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
        df = pd.DataFrame({"whash": t.column("whash").to_pylist()})
        g = df.groupby("whash", as_index=False).size()
        return pa.table({
            "whash": pa.array(g["whash"], pa.string()),
            "n_partial": pa.array(g["size"].to_numpy("int64"), pa.int64()),
        })

    def dup_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        f = t.filter(pc.greater_equal(t.column("n"), 2))
        bs = [int(h[:8], 16) % num_buckets
              for h in f.column("whash").to_pylist()]
        return pa.table({
            "whash": f.column("whash"),
            "doc_id": pa.array([-1] * f.num_rows, pa.int64()),
            "__b": pa.array(bs, pa.int64()),
        })

    dup = (windows.map_batches(count_partial, batch_format="pyarrow")
           .groupby("whash").aggregate(Sum("n_partial", alias_name="n"))
           .repartition(2)
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

    return agg.repartition(2).map_batches(finalize, batch_format="pyarrow")
