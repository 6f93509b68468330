"""Link-graph operators: out-link extraction, host-level edges, PageRank.

A crawl-scale corpus is a graph as much as a text collection — frontier
expansion, spam/host authority weighting and domain curation all consume
the link structure. Three operators, all deterministic:

* :func:`link_table` — single-pass anchor walk per page
  (``kernels/links.py``), one output row per (page, resolved target),
  first occurrence wins. Streaming map, no shuffle.
* :func:`host_edges` — collapse page-level links to weighted host-level
  edges ``(src_host, dst_host, weight)``: per-batch pandas partials, one
  tiny groupby Sum (the combiner shape — the shuffle moves per-pair
  partials, never raw links).
* :func:`pagerank_hosts` — EXACT integer fixed-point PageRank (damping
  85/100, micro-unit ranks) so distributed == sequential == SQL
  bit-for-bit, the same discipline as ``kernels/kmeans.py``: each
  iteration computes per-edge contributions ``(r_src * w) // W_src``
  (int64 floor division, order-independent) and sums them per dst, then
  ``r' = 150_000 + (85 * S) // 100``. Hosts with no in-edges hold the
  base rank; dangling hosts leak mass (the standard lossy variant — no
  global dangling-sum broadcast, which would add a driver sync per
  iteration for no test value). The ranks×edges join is the bucketed
  union+groupby shape (``cohorts.py::event_funnel``) — a native hash
  join aborts when a partition is one-side-empty (CLAUDE.md). The
  weighted edge table is computed and materialized ONCE (loop-invariant,
  bucket key precomputed); each iteration still re-sorts the
  ranks∪edges union by bucket — Ray Data cannot pin a partitioning
  across iterations, so per-iteration cost is one bucket shuffle of
  edges+ranks plus one (host, partial) aggregate.

Scale notes (100 TB): link extraction is embarrassingly parallel; edges
aggregate to |hosts|² at worst but real graphs are sparse — the edge
table is re-used across iterations via one ``materialize()``. A
pathological src host (one host linking everywhere) concentrates its
OUT-edges in one bucket; they are already (src,dst)-aggregated, so the
bucket holds at most its distinct-dst fan-out. int64 bounds: the
average case (total graph mass ~1e6·|hosts|, weights ≤1e6) keeps r·w
< 2^63 up to ~1e8 hosts, but a mega-hub concentrating total mass on a
near-maximal weight overflows far earlier — so the per-edge multiply is
CHECKED (raises OverflowError instead of numpy's silent wraparound;
rescale BASE_MICRO down one decade for such graphs).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

from pero_ocr_ray.functions.domains import HOST_RE_STR
from pero_ocr_ray.kernels.links import extract_links
from pero_ocr_ray.util import shuffle_partitions

BASE_MICRO = 1_000_000  # initial rank, micro-units
TELEPORT_MICRO = 150_000  # (1 - d) * BASE_MICRO with d = 85/100

_LINK_SCHEMA = pa.schema([
    ("src_url", pa.string()), ("out_idx", pa.int64()), ("href", pa.string()),
])


def link_table(pages: rd.Dataset) -> rd.Dataset:
    """pages (url, html) -> (src_url, out_idx, href) out-link rows."""
    from pero_ocr_ray.kernels.decode import decode_payload, payload_kind

    def fn(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        raws = t.column("html").to_pylist()
        src, idx, href = [], [], []
        for url, raw in zip(urls, raws):
            if payload_kind(raw or b"") != "html":
                continue  # link walk is an html-only concern (pdf: none)
            text, _, _ = decode_payload(raw or b"")
            for i, link in enumerate(extract_links(text, url)):
                src.append(url)
                idx.append(i)
                href.append(link)
        return pa.table({
            "src_url": pa.array(src, pa.string()),
            "out_idx": pa.array(idx, pa.int64()),
            "href": pa.array(href, pa.string()),
        })

    return pages.map_batches(fn, batch_format="pyarrow")


def anchor_text_counts(pages: rd.Dataset) -> rd.Dataset:
    """pages (url, html) -> (href, anchor_text, n): corpus-wide counts of
    every (target, anchor text) pair — the classic anchor-text ranking
    signal (one of the canonical MapReduce workloads). Combiner shape:
    per-batch pandas counts, one pair groupby; a hot target ("home")
    crosses the shuffle as one partial per block."""
    from ray.data.aggregate import Sum

    from pero_ocr_ray.kernels.decode import decode_payload, payload_kind
    from pero_ocr_ray.kernels.links import extract_anchor_texts

    def partial(t: pa.Table) -> pa.Table:
        hs, txts = [], []
        for url, raw in zip(t.column("url").to_pylist(),
                            t.column("html").to_pylist()):
            if payload_kind(raw or b"") != "html":
                continue
            text, _, _ = decode_payload(raw or b"")
            for href, atext in extract_anchor_texts(text, url):
                hs.append(href)
                txts.append(atext)
        g = (pd.DataFrame({"href": hs, "anchor_text": txts})
             .groupby(["href", "anchor_text"], as_index=False).size())
        return pa.table({
            "href": pa.array(g["href"], pa.string()),
            "anchor_text": pa.array(g["anchor_text"], pa.string()),
            "n_partial": pa.array(g["size"].to_numpy("int64"), pa.int64()),
        })

    agg = (pages.map_batches(partial, batch_format="pyarrow")
           .groupby(["href", "anchor_text"])
           .aggregate(Sum("n_partial", alias_name="n")))

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "href": t.column("href"),
            "anchor_text": t.column("anchor_text"),
            "n": pc.cast(t.column("n"), pa.int64()),
        })

    return (agg.repartition(shuffle_partitions())
            .map_batches(finalize, batch_format="pyarrow"))


def host_edges(links: rd.Dataset) -> rd.Dataset:
    """(src_url, href) links -> (src_host, dst_host, weight) host edges.

    Rows whose src or dst host doesn't parse are dropped (non-hierarchical
    targets never reach here; a hostless base url can't emit links)."""
    def partial(df: pd.DataFrame) -> pa.Table:
        s = df["src_url"].str.extract(HOST_RE_STR, expand=False)
        d = df["href"].str.extract(HOST_RE_STR, expand=False)
        g = (pd.DataFrame({"src_host": s, "dst_host": d})
             .dropna()
             .groupby(["src_host", "dst_host"], as_index=False).size())
        # explicit Arrow out: keeps the whole chain arrow-native (pandas
        # empties downstream otherwise emit null-schema blocks, CLAUDE.md)
        return pa.table({
            "src_host": pa.array(g["src_host"], pa.string()),
            "dst_host": pa.array(g["dst_host"], pa.string()),
            "n_partial": pa.array(g["size"].to_numpy("int64"), pa.int64()),
        })

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "src_host": t.column("src_host"),
            "dst_host": t.column("dst_host"),
            "weight": pc.cast(t.column("weight"), pa.int64()),
        })

    agg = (links.map_batches(partial, batch_format="pandas")
           .groupby(["src_host", "dst_host"])
           .aggregate(Sum("n_partial", alias_name="weight")))
    return (agg.repartition(shuffle_partitions())
            .map_batches(finalize, batch_format="pyarrow"))


def top_hosts_by_rank(ranks: rd.Dataset, k: int = 10) -> rd.Dataset:
    """(host, rank_micro) -> the k top-authority hosts — distributed
    top-k (batch-local head + one tiny final), never a full sort; ties
    break on host so the cut is total."""
    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (df[["host", "rank_micro"]]
                .sort_values(["rank_micro", "host"],
                             ascending=[False, True]).head(k))

    def final_topk(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["rank_micro", "host"],
                            ascending=[False, True]).head(k)
        return pa.table({
            "host": pa.array(df["host"], pa.string()),
            "rank_micro": pa.array(df["rank_micro"].to_numpy("int64"),
                                   pa.int64()),
        })

    return (ranks.map_batches(local_topk, batch_format="pandas")
            .repartition(1)
            .map_batches(final_topk, batch_format="pandas",
                         batch_size=None))


def _bucket_of(hosts: pd.Series, num_buckets: int) -> pd.Series:
    """Deterministic host -> bucket (crc32; grouping-only, never compared
    cross-engine)."""
    return hosts.map(lambda h: zlib.crc32(h.encode()) % num_buckets) \
        .astype("int64")


def pagerank_hosts(edges: rd.Dataset, n_iter: int = 5,
                   num_buckets: int = 256) -> rd.Dataset:
    """(src_host, dst_host, weight) -> (host, rank_micro) after ``n_iter``
    exact integer PageRank iterations over every host that appears."""

    # host universe: distinct src ∪ dst (per-batch partials, one groupby)
    def host_partial(t: pa.Table) -> pa.Table:
        hs = (t.column("src_host").to_pylist()
              + t.column("dst_host").to_pylist())
        return pa.table({"host": pa.array(sorted(set(hs)), pa.string())})

    from ray.data.aggregate import Count

    # repartition after every aggregate/map_groups before a map_batches:
    # sparse shuffle partitions emit empty blocks that map_batches forwards
    # UNTOUCHED (UDF skipped), poisoning downstream unions (CLAUDE.md)
    hosts = (edges.map_batches(host_partial, batch_format="pyarrow")
             .groupby("host").aggregate(Count())
             .select_columns(["host"])
             .repartition(shuffle_partitions())
             .materialize())

    # per-src total out-weight, attached to every edge row via ONE bucketed
    # union+groupby pass; the result is the loop-invariant edge table.
    def tag_edges(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.table({
            "key": pa.array(df["src_host"], pa.string()),
            "dst_host": pa.array(df["dst_host"], pa.string()),
            "weight": pa.array(df["weight"].astype("int64"), pa.int64()),
            "__side": pa.array([1] * len(df), pa.int64()),
            "__b": pa.array(_bucket_of(df["src_host"], num_buckets),
                            pa.int64()),
        })

    def wt_partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("src_host", as_index=False)["weight"].sum()
        return pa.table({
            "src_host": pa.array(g["src_host"], pa.string()),
            "w_partial": pa.array(g["weight"].to_numpy("int64"),
                                  pa.int64()),
        })

    wt = (edges.map_batches(wt_partial, batch_format="pandas")
          .groupby("src_host").aggregate(Sum("w_partial", alias_name="W")))

    def tag_wt(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.table({
            "key": pa.array(df["src_host"], pa.string()),
            "dst_host": pa.array([""] * len(df), pa.string()),
            "weight": pa.array(df["W"].astype("int64"), pa.int64()),
            "__side": pa.array([0] * len(df), pa.int64()),
            "__b": pa.array(_bucket_of(df["src_host"], num_buckets),
                            pa.int64()),
        })

    _EW_SCHEMA = pa.schema([
        ("src_host", pa.string()), ("dst_host", pa.string()),
        ("weight", pa.int64()), ("W", pa.int64()), ("__b", pa.int64()),
    ])

    def join_w(g: pd.DataFrame) -> pa.Table:
        w = g[g["__side"] == 0][["key", "weight"]] \
            .rename(columns={"weight": "W"})
        e = g[g["__side"] == 1][["key", "dst_host", "weight", "__b"]]
        m = e.merge(w, on="key")
        if len(m) == 0:
            return _EW_SCHEMA.empty_table()
        return pa.table({
            "src_host": pa.array(m["key"], pa.string()),
            "dst_host": pa.array(m["dst_host"], pa.string()),
            "weight": pa.array(m["weight"].astype("int64"), pa.int64()),
            "W": pa.array(m["W"].astype("int64"), pa.int64()),
            "__b": pa.array(m["__b"].astype("int64"), pa.int64()),
        })

    edges_w = (edges.map_batches(tag_edges, batch_format="pyarrow")
               .union(wt.repartition(shuffle_partitions())
                      .map_batches(tag_wt, batch_format="pyarrow"))
               .groupby("__b").map_groups(join_w, batch_format="pandas")
               .repartition(shuffle_partitions())
               .materialize())

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t.column("host"),
            "r": pa.array([BASE_MICRO] * t.num_rows, pa.int64()),
        })

    ranks = hosts.map_batches(init_ranks, batch_format="pyarrow") \
        .materialize()

    _C_SCHEMA = pa.schema([("host", pa.string()), ("s_partial", pa.int64())])

    def tag_ranks(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.table({
            "key": pa.array(df["host"], pa.string()),
            "dst_host": pa.array([""] * len(df), pa.string()),
            "weight": pa.array(df["r"].astype("int64"), pa.int64()),
            "W": pa.array([0] * len(df), pa.int64()),
            "__side": pa.array([0] * len(df), pa.int64()),
            "__b": pa.array(_bucket_of(df["host"], num_buckets), pa.int64()),
        })

    def tag_edges_w(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.table({
            "key": pa.array(df["src_host"], pa.string()),
            "dst_host": pa.array(df["dst_host"], pa.string()),
            "weight": pa.array(df["weight"].astype("int64"), pa.int64()),
            "W": pa.array(df["W"].astype("int64"), pa.int64()),
            "__side": pa.array([1] * len(df), pa.int64()),
            "__b": pa.array(df["__b"].astype("int64"), pa.int64()),
        })

    def contrib(g: pd.DataFrame) -> pa.Table:
        """Per bucket: ranks→edges merge, per-edge integer contribution,
        per-dst partial sum (the shuffle moves (dst, S) partials)."""
        r = g[g["__side"] == 0][["key", "weight"]] \
            .rename(columns={"weight": "r"})
        e = g[g["__side"] == 1][["key", "dst_host", "weight", "W"]]
        m = e.merge(r, on="key")
        if len(m) == 0:
            return _C_SCHEMA.empty_table()
        rv = m["r"].to_numpy("int64")
        wv = m["weight"].to_numpy("int64")
        # checked multiply: numpy int64 WRAPS on overflow while the SQL
        # replay (DuckDB BIGINT) raises — a mega-hub concentrating total
        # graph mass times a near-1e6 weight can exceed 2^63 well before
        # the ~1e8-host average-case bound, and the two engines would
        # silently diverge. Fail loudly instead (drop the micro-unit
        # scale one decade to proceed).
        lim = (2**63 - 1) // np.maximum(wv, 1)
        if (rv > lim).any():
            raise OverflowError(
                "pagerank contribution r*w exceeds int64; rescale ranks "
                "(BASE_MICRO) down one decade for this graph")
        c = rv * wv // m["W"].to_numpy("int64")
        part = (pd.DataFrame({"host": m["dst_host"], "c": c})
                .groupby("host", as_index=False)["c"].sum())
        return pa.table({
            "host": pa.array(part["host"], pa.string()),
            "s_partial": pa.array(part["c"].to_numpy("int64"), pa.int64()),
        })

    def zero_hosts(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t.column("host"),
            "s_partial": pa.array([0] * t.num_rows, pa.int64()),
        })

    def finalize(t: pa.Table) -> pa.Table:
        s = t.column("S").to_numpy(zero_copy_only=False).astype("int64")
        return pa.table({
            "host": t.column("host"),
            "r": pa.array(TELEPORT_MICRO + (85 * s) // 100, pa.int64()),
        })

    for _ in range(n_iter):
        union = (ranks.map_batches(tag_ranks, batch_format="pyarrow")
                 .union(edges_w.map_batches(tag_edges_w,
                                            batch_format="pyarrow")))
        contribs = (union.groupby("__b")
                    .map_groups(contrib, batch_format="pandas"))
        ranks = (contribs
                 .union(hosts.map_batches(zero_hosts,
                                          batch_format="pyarrow"))
                 .groupby("host")
                 .aggregate(Sum("s_partial", alias_name="S"))
                 .repartition(shuffle_partitions())
                 .map_batches(finalize, batch_format="pyarrow")
                 .materialize())

    def out(t: pa.Table) -> pa.Table:
        return pa.table({"host": t.column("host"),
                         "rank_micro": t.column("r")})

    return ranks.map_batches(out, batch_format="pyarrow")
