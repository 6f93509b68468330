"""Crawl snapshot diff: classify every url across two crawl snapshots.

Incremental recrawls are the steady state of a web corpus: each new
snapshot must be reconciled against the previous one so downstream
curation re-processes only what changed. :func:`snapshot_diff` classifies
every url as ``added`` / ``removed`` / ``changed`` / ``unchanged`` by
content hash.

Shape: each side maps to ``(url, content_hash, side)`` partials (the
hash rides instead of the payload, so the shuffle moves ~50 bytes/row
regardless of page size), the union groups by a url-hash bucket, and one
vectorized pandas pass per bucket classifies every url in it — the
sparse-safe union+groupby join (a native full-outer join aborts on
one-side-empty hash partitions at small inputs, CLAUDE.md). Assumes each
snapshot holds at most one row per url (run ``dedup_pages`` first
otherwise); with duplicates the smallest hash represents the side, kept
deterministic by an explicit sort.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

import ray.data as rd

_DIFF_SCHEMA = pa.schema([("url", pa.string()), ("status", pa.string())])


def _tag(ds: rd.Dataset, url_col: str, text_col: str, side: int,
         num_buckets: int) -> rd.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        urls = t.column(url_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        hs = [hashlib.md5((x or "").encode()).hexdigest() for x in texts]
        bs = [int.from_bytes(hashlib.md5((u or "").encode()).digest()[:4],
                             "big") % num_buckets for u in urls]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "h": pa.array(hs, pa.string()),
            "__side": pa.array([side] * len(urls), pa.int64()),
            "__b": pa.array(bs, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def snapshot_diff(old: rd.Dataset, new: rd.Dataset, url_col: str = "url",
                  text_col: str = "text",
                  num_buckets: int = 1024) -> rd.Dataset:
    """-> (url, status) for every url in either snapshot."""

    def classify(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["url", "h"], kind="mergesort")
        a = g[g["__side"] == 0].drop_duplicates("url").set_index("url")["h"]
        b = g[g["__side"] == 1].drop_duplicates("url").set_index("url")["h"]
        m = pd.DataFrame({"ha": a, "hb": b})  # outer-aligned on the index
        status = pd.Series("unchanged", index=m.index)
        status[m["ha"].isna()] = "added"
        status[m["hb"].isna()] = "removed"
        both = m["ha"].notna() & m["hb"].notna()
        status[both & (m["ha"] != m["hb"])] = "changed"
        if len(m) == 0:
            return _DIFF_SCHEMA.empty_table()
        return pa.table({
            "url": pa.array(m.index.to_list(), pa.string()),
            "status": pa.array(status.to_list(), pa.string()),
        })

    union = (_tag(old, url_col, text_col, 0, num_buckets)
             .union(_tag(new, url_col, text_col, 1, num_buckets)))
    return union.groupby("__b").map_groups(classify, batch_format="pandas")


def diff_counts(diff: rd.Dataset) -> rd.Dataset:
    """(url, status) -> (status, n_urls) roll-up (combiner partials)."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("status", as_index=False).size()
        return pa.table({
            "status": pa.array(g["status"], pa.string()),
            "n_partial": pa.array(g["size"].to_numpy("int64"), pa.int64()),
        })

    agg = (diff.map_batches(partial, batch_format="pandas")
           .groupby("status").aggregate(Sum("n_partial",
                                            alias_name="n_urls")))

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "status": t.column("status"),
            "n_urls": pc.cast(t.column("n_urls"), pa.int64()),
        })

    from pero_ocr_ray.util import shuffle_partitions
    return (agg.repartition(shuffle_partitions())
            .map_batches(finalize, batch_format="pyarrow"))
