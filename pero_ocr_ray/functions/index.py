"""Inverted token index construction (the search-index data product).

Builds, per distinct token: document frequency, total term frequency, the
top document (highest tf, ties to the smallest doc_id), and — for rare
tokens only — the full posting list.

Scale shape (Zipf-proof):

* per-token stats are pure combiner algebra: each batch emits one partial
  row per (token) with its in-batch doc count / tf sum / packed argmax,
  and ``groupby(token).aggregate(Sum, Sum, Max)`` merges partials — the
  token "the" (present in every document of a 100 TB corpus) crosses the
  shuffle as one row per source block, never as its posting list;
* the top document rides the SAME aggregate as a packed int64
  ``tf << 41 | (2^41-1 - doc_id)``: Max over the pack is (max tf, then min
  doc_id) — no second pass, no per-group sort;
* posting lists are materialized ONLY for tokens with
  ``doc_freq <= max_df`` (the classic stop-list cut): the (token, doc_id)
  pairs re-exploded in a second streaming pass hash-join against the rare
  set, so every posting group is bounded by ``max_df`` rows by
  construction. Frequent tokens keep stats but get an empty posting
  string — the honest answer at corpus scale (and what real engines do).

Determinism: postings ascend by doc_id; all tie-breaks are on doc_id;
tokens are the repo-wide ``[a-z0-9]+`` lowercase convention so the DuckDB
oracle rebuilds everything from scratch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from pero_ocr_ray.kernels.textstats import SHINGLE_RE

_DOC_BITS = 41          # doc_id < 2^41; tf < 2^22 fits the remaining bits
_DOC_MASK = (1 << _DOC_BITS) - 1


def _token_doc_pairs(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, text) -> (token, doc_id, tf): one row per distinct token
    per doc (vectorized pandas findall/explode + group count)."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(SHINGLE_RE)
        ex = pd.DataFrame({
            "token": toks.to_numpy(dtype=object),
            "doc_id": df["doc_id"].astype("int64").to_numpy(),
        }).explode("token", ignore_index=True).dropna(subset=["token"])
        g = (ex.groupby(["token", "doc_id"], as_index=False, sort=False)
             .size().rename(columns={"size": "tf"}))
        return pa.table({
            "token": pa.array(g["token"].to_numpy(dtype=object),
                              pa.string()),
            "doc_id": pa.array(g["doc_id"].to_numpy(dtype="int64"),
                               pa.int64()),
            "tf": pa.array(g["tf"].to_numpy(dtype="int64"), pa.int64()),
        })

    return ds.map_batches(pairs, batch_format="pandas")


def _token_stats(pairs: rd.Dataset) -> rd.Dataset:
    """-> (token, doc_freq, total_tf, top_doc): combiner partials + one
    aggregate. A doc's rows live in exactly one batch, so per-batch
    distinct-doc counts sum exactly."""
    from ray.data.aggregate import Max, Sum

    def partial(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        if tf.size and int(tf.max()) >= (1 << (63 - _DOC_BITS)):
            raise ValueError("tf overflows the packed argmax")
        packed = (tf << _DOC_BITS) | (_DOC_MASK - did)
        w = pa.table({"token": t.column("token"),
                      "df_p": pa.array(np.ones(len(t), dtype=np.int64)),
                      "tf_p": t.column("tf"),
                      "top_p": pa.array(packed, pa.int64())})
        g = (w.group_by("token")
             .aggregate([("df_p", "sum"), ("tf_p", "sum"),
                         ("top_p", "max")]))
        return pa.table({"token": g.column("token"),
                         "df_p": g.column("df_p_sum"),
                         "tf_p": g.column("tf_p_sum"),
                         "top_p": g.column("top_p_max")})

    agg = (pairs.map_batches(partial, batch_format="pyarrow")
           .groupby("token")
           .aggregate(Sum("df_p", alias_name="doc_freq"),
                      Sum("tf_p", alias_name="total_tf"),
                      Max("top_p", alias_name="top_packed")))

    schema = pa.schema([("token", pa.string()), ("doc_freq", pa.int64()),
                        ("total_tf", pa.int64()), ("top_doc", pa.int64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        packed = t.column("top_packed").to_numpy(zero_copy_only=False)
        return pa.table({
            "token": t.column("token"),
            "doc_freq": pc.cast(t.column("doc_freq"), pa.int64()),
            "total_tf": pc.cast(t.column("total_tf"), pa.int64()),
            "top_doc": pa.array(_DOC_MASK - (packed & _DOC_MASK),
                                pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def index_search(ds: rd.Dataset, terms: list[str]) -> rd.Dataset:
    """Conjunctive (AND) boolean retrieval: -> (doc_id, score) for
    documents containing EVERY query term, score = total tf across the
    terms. The term list is a tiny closure constant (a query, not a
    corpus artifact); only query-term pairs ever reach the shuffle, so
    cost is bounded by the terms' posting sizes — the standard
    term-at-a-time evaluation shape."""
    from ray.data.aggregate import Count, Sum

    want = sorted(set(terms))
    n_terms = len(want)

    def hits(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].str.lower().str.findall(SHINGLE_RE)
        ex = pd.DataFrame({
            "token": toks.to_numpy(dtype=object),
            "doc_id": df["doc_id"].astype("int64").to_numpy(),
        }).explode("token", ignore_index=True)
        ex = ex[ex["token"].isin(want)]
        # a doc is one row, so its (doc, term) tf rows are complete
        # within this batch — one partial row per matched term per doc
        g = (ex.groupby(["doc_id", "token"], as_index=False, sort=False)
             .size().rename(columns={"size": "tf"}))
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy("int64"), pa.int64()),
            "tf": pa.array(g["tf"].to_numpy("int64"), pa.int64()),
        })

    agg = (ds.map_batches(hits, batch_format="pandas")
           .groupby("doc_id")
           .aggregate(Count(), Sum("tf", alias_name="score")))

    def finish(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("count()"), n_terms)
        f = t.filter(m)
        return pa.table({
            "doc_id": f.column("doc_id"),
            "score": pc.cast(f.column("score"), pa.int64()),
        })

    from pero_ocr_ray.util import shuffle_partitions
    return (agg.repartition(shuffle_partitions())
            .map_batches(finish, batch_format="pyarrow"))


def inverted_index(ds: rd.Dataset, max_df: int = 32,
                   num_buckets: int = 1024) -> rd.Dataset:
    """-> (token, doc_freq, total_tf, top_doc, postings) — ``postings`` is
    the comma-joined ascending doc_id list for tokens with
    ``doc_freq <= max_df``, ``""`` otherwise."""
    from pero_ocr_ray.functions.join import hash_join
    from pero_ocr_ray.util import pin_empty_blocks

    stats_schema = pa.schema([
        ("token", pa.string()), ("doc_freq", pa.int64()),
        ("total_tf", pa.int64()), ("top_doc", pa.int64())])
    token_schema = pa.schema([("token", pa.string())])
    posts_schema = pa.schema([("token", pa.string()),
                              ("postings", pa.string())])

    # the (token, doc_id, tf) pairs feed both phases; checkpoint once
    # (same rationale as paragraph_dedup's exploded stream)
    pairs = _token_doc_pairs(ds).materialize()
    stats = pin_empty_blocks(_token_stats(pairs), stats_schema).materialize()

    rare = pin_empty_blocks(
        stats.filter(expr=f"doc_freq <= {max_df}")
        .select_columns(["token"]), token_schema)
    rare_pairs = hash_join(pairs, rare, on="token")

    def bucketize(t: pa.Table) -> pa.Table:
        toks = t.column("token").to_pylist()
        import hashlib
        b = np.fromiter(
            (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
             % num_buckets for s in toks),
            dtype=np.int64, count=len(toks))
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def posting_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        agg = g.groupby("token", sort=True)["doc_id"].agg(
            lambda s: ",".join(map(str, s)))
        return pa.table({
            "token": pa.array(agg.index.to_numpy(dtype=object),
                              pa.string()),
            "postings": pa.array(agg.to_numpy(dtype=object), pa.string()),
        })

    posts = pin_empty_blocks(
        rare_pairs.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(posting_bucket, batch_format="pandas"),
        posts_schema)

    joined = hash_join(stats, posts, on="token", join_type="left_outer")

    def fill(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("postings"), "postings",
            pc.coalesce(t.column("postings"), pa.scalar("")))

    return joined.map_batches(fill, batch_format="pyarrow")
