"""Relational pipelines over the TPC-H-ish tables.

Demonstrates the engine's wide-operation patterns at scale:
* partial aggregation inside ``map_batches`` before the groupby shuffle
  (combiner pattern — the shuffle moves per-key partials, not rows);
* broadcast joins: the small side is ``ray.put`` once and read per task —
  no all-to-all exchange (J5 analog, SURVEY §2.4);
* distributed top-k: batch-local top-k then a single tiny final stage.

Money sums are emitted as integer cents (CAST(ROUND(x*100) AS BIGINT)) so
results hash identically against the DuckDB oracle despite float summation
order differing between engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd
from ray.data.aggregate import Sum


def pricing_summary(lineitem: rd.Dataset, cutoff: str = "1998-09-02") -> rd.Dataset:
    """TPC-H Q1-style: per (returnflag, linestatus) sums/counts with partial
    aggregation before the shuffle. The partial is zero-copy Arrow
    (pyarrow.compute kernels + Arrow group_by): the block never converts to
    pandas on the hot path."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cutoff_dt = pd.Timestamp(cutoff).to_pydatetime()

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"),
                                   pa.scalar(cutoff_dt)))
        if t.num_rows == 0:
            return pa.table({"key": pa.array([], pa.string()),
                             "qty": pa.array([], pa.float64()),
                             "base": pa.array([], pa.float64()),
                             "disc_price": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        key = pc.binary_join_element_wise(t.column("l_returnflag"),
                                          t.column("l_linestatus"),
                                          pa.scalar("|"))
        disc = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        g = (pa.table({"key": key,
                       "qty": t.column("l_quantity"),
                       "base": t.column("l_extendedprice"),
                       "disc_price": disc})
             .group_by("key")
             .aggregate([("qty", "sum"), ("base", "sum"),
                         ("disc_price", "sum"), ("key", "count")]))
        return pa.table({"key": g.column("key"),
                         "qty": pc.cast(g.column("qty_sum"), pa.float64()),
                         "base": pc.cast(g.column("base_sum"), pa.float64()),
                         "disc_price": pc.cast(g.column("disc_price_sum"),
                                               pa.float64()),
                         "n": g.column("key_count")})

    agg = (lineitem.map_batches(partial, batch_format="pyarrow")
           .groupby("key").aggregate(Sum("qty", alias_name="qty"),
                                     Sum("base", alias_name="base"),
                                     Sum("disc_price", alias_name="disc_price"),
                                     Sum("n", alias_name="n")))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["key"].str.split("|", expand=True)
        return pd.DataFrame({
            "l_returnflag": parts[0],
            "l_linestatus": parts[1],
            "sum_qty": df["qty"].round().astype("int64"),
            "sum_base_cents": (df["base"] * 100).round().astype("int64"),
            "sum_disc_cents": (df["disc_price"] * 100).round().astype("int64"),
            "count_order": df["n"].astype("int64"),
        })

    return agg.map_batches(finalize, batch_format="pandas")


def top_orders_by_revenue(customer: rd.Dataset, orders: rd.Dataset,
                          lineitem: rd.Dataset, segment: str = "BUILDING",
                          cutoff: str = "1995-03-15", k: int = 10) -> rd.Dataset:
    """TPC-H Q3-style: top-k orders by revenue for one customer segment.

    Fully shuffle-based — nothing is ever materialized on the driver: the
    customer side is a constant fraction of ``customer`` (a fifth of the
    table), so it is map-filtered and shuffle hash-joined with the
    date-filtered orders on ``o_custkey``; the orders↔lineitem edge is a
    second hash join on ``o_orderkey`` against lineitem revenue
    pre-aggregated per orderkey (combiner: that shuffle moves per-key
    partials, not lineitem rows)."""
    from pero_ocr_ray.functions.join import hash_join

    cutoff_ts = pd.Timestamp(cutoff)

    def filter_cust(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["c_mktsegment"] == segment, ["c_custkey"]]

    def filter_orders(df: pd.DataFrame) -> pd.DataFrame:
        m = df["o_orderdate"] < cutoff_ts
        return df.loc[m, ["o_orderkey", "o_custkey", "o_orderdate"]]

    sel_orders = hash_join(
        orders.map_batches(filter_orders, batch_format="pandas"),
        customer.map_batches(filter_cust, batch_format="pandas"),
        on="o_custkey", right_on="c_custkey",
    ).select_columns(["o_orderkey", "o_orderdate"])

    def partial_rev(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[df["l_shipdate"] > cutoff_ts]
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        g = (df.assign(revenue=rev)
               .groupby("l_orderkey", as_index=False)["revenue"].sum())
        return g.rename(columns={"l_orderkey": "o_orderkey"})

    agg = (lineitem.map_batches(partial_rev, batch_format="pandas")
           .groupby("o_orderkey").aggregate(Sum("revenue", alias_name="revenue")))

    joined = hash_join(agg, sel_orders, on="o_orderkey")

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["revenue", "o_orderkey"],
                              ascending=[False, True]).head(k)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["revenue", "o_orderkey"],
                            ascending=[False, True]).head(k)
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "revenue_cents": (df["revenue"] * 100).round().astype("int64"),
            "o_orderdate": df["o_orderdate"].values,
        })

    return (joined.map_batches(local_topk, batch_format="pandas")
                  .repartition(1)
                  .map_batches(final_topk, batch_format="pandas", batch_size=None))


def suppliers_per_nation(supplier: rd.Dataset, nation: rd.Dataset) -> rd.Dataset:
    """Broadcast join supplier->nation, count per nation name."""
    nmap = {r["n_nationkey"]: r["n_name"] for r in nation.take_all()}
    nref = ray.put(nmap)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(nref)
        g = (df.assign(n_name=df["s_nationkey"].map(names))
               .groupby("n_name", as_index=False).size()
               .rename(columns={"size": "n_partial"}))
        return g

    agg = (supplier.map_batches(partial, batch_format="pandas")
           .groupby("n_name").aggregate(Sum("n_partial", alias_name="n_suppliers")))

    return agg.map_batches(
        lambda df: df.assign(n_suppliers=df["n_suppliers"].astype("int64")),
        batch_format="pandas")


def distinct_brands(part: rd.Dataset) -> rd.Dataset:
    """Distinct p_brand values, fully distributed: per-batch distinct
    (combiner — the shuffle moves at most |distinct| rows per batch, not
    the table), then a groupby keyed on the value keeps one row per key.
    Safe at any cardinality, unlike driver-side ``ds.unique``."""
    def batch_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df[["p_brand"]].drop_duplicates()

    return (part.map_batches(batch_distinct, batch_format="pandas")
                .groupby("p_brand")
                .map_groups(lambda g: g.head(1), batch_format="pandas")
                .sort("p_brand"))


def top_parts_by_price(part: rd.Dataset, k: int = 5) -> rd.Dataset:
    """Top-k parts by retail price — distributed top-k, NOT a full sort:
    batch-local top-k inside ``map_batches`` (each batch forwards at most
    k rows), then one tiny final selection. A ``sort().limit()`` would
    all-to-all shuffle the whole table to discard everything but k rows."""
    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (df[["p_partkey", "p_retailprice"]]
                .sort_values(["p_retailprice", "p_partkey"],
                             ascending=[False, True]).head(k))

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["p_retailprice", "p_partkey"],
                            ascending=[False, True]).head(k)
        return pd.DataFrame({
            "p_partkey": df["p_partkey"].astype("int64"),
            "price_cents": (df["p_retailprice"] * 100).round().astype("int64"),
        })

    return (part.map_batches(local_topk, batch_format="pandas")
                .repartition(1)
                .map_batches(final_topk, batch_format="pandas",
                             batch_size=None))


def _count_by(ds: rd.Dataset, col: str, out: str) -> rd.Dataset:
    """Distributed count per key: zero-copy Arrow group_by partial inside
    each block, then one tiny groupby over the partials."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([col]).group_by(col).aggregate([(col, "count")])
        return pa.table({col: g.column(col),
                         "n_partial": g.column(f"{col}_count")})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(col).aggregate(Sum("n_partial", alias_name=out)))
    return agg.map_batches(
        lambda df: df.assign(**{out: df[out].astype("int64")}),
        batch_format="pandas")


def customer_segment_counts(customer: rd.Dataset) -> rd.Dataset:
    return _count_by(customer, "c_mktsegment", "n_customers")


def token_quantiles_by_lang(documents: rd.Dataset) -> rd.Dataset:
    """Exact discrete quantiles of per-doc token counts, grouped by lang.

    Histogram shape, hot-key-safe: ``lang`` is low-cardinality and skewed
    (one group can be most of the corpus), so sorting a whole language's
    raw counts inside one group dies at scale. Instead each batch emits
    (lang, n_tokens) -> count partials (token counts are small ints, so
    per-lang histogram state is bounded by the largest document, not the
    corpus); a groupby sums the histograms; the exact ``quantile_disc``
    value is read off the merged cumulative counts. Semantics match DuckDB
    ``quantile_disc`` exactly (verified identical to the raw-sort form)."""
    import math
    from pero_ocr_ray.kernels.textstats import TOKEN_RE

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({
                "lang": df["lang"],
                "n_tokens": df["text"].str.count(TOKEN_RE).astype("int64"),
             })
             .groupby(["lang", "n_tokens"], as_index=False)
             .size().rename(columns={"size": "n_partial"}))
        g["key"] = g["lang"] + "|" + g["n_tokens"].astype(str)
        return g[["key", "n_partial"]]

    hist = (documents.map_batches(partial, batch_format="pandas")
            .groupby("key").aggregate(Sum("n_partial", alias_name="n_docs")))

    def split_key(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["key"].str.rsplit("|", n=1, expand=True)
        return pd.DataFrame({"lang": parts[0],
                             "n_tokens": parts[1].astype("int64"),
                             "n_docs": df["n_docs"].astype("int64")})

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("n_tokens")
        vals = g["n_tokens"].to_numpy()
        cum = np.cumsum(g["n_docs"].to_numpy())
        total = int(cum[-1])

        def qd(q: float) -> int:
            rank = max(1, math.ceil(q * total))  # 1-based discrete rank
            return int(vals[np.searchsorted(cum, rank)])

        return pd.DataFrame({
            "lang": [g["lang"].iloc[0]],
            "p25": pd.Series([qd(0.25)], dtype="int64"),
            "p50": pd.Series([qd(0.50)], dtype="int64"),
            "p90": pd.Series([qd(0.90)], dtype="int64"),
        })

    return (hist.map_batches(split_key, batch_format="pandas")
            .groupby("lang").map_groups(quantiles, batch_format="pandas"))


def lang_counts(documents: rd.Dataset) -> rd.Dataset:
    """Documents per lang (Arrow partial count then tiny groupby)."""
    return _count_by(documents, "lang", "n_docs")


def docs_above_lang_median(documents: rd.Dataset) -> rd.Dataset:
    """-> (doc_id, lang, n_tokens) for docs STRICTLY above their
    language's median token count — the derived-threshold filter pattern
    (compute a corpus statistic, then filter the stream by it).

    Two passes by construction: the per-lang median comes from the
    hot-key-safe histogram in :func:`token_quantiles_by_lang` (lang
    cardinality is tiny, so the medians table is driver-fetchable and
    broadcast via ``ray.put``), then one streaming filter applies it.
    Median semantics are DuckDB ``quantile_disc(x, 0.5)`` exactly."""
    import ray

    from pero_ocr_ray.kernels.textstats import TOKEN_RE

    meds = {r["lang"]: int(r["p50"])
            for r in token_quantiles_by_lang(documents).take_all()}
    ref = ray.put(meds)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        n = df["text"].str.count(TOKEN_RE).astype("int64")
        thresh = df["lang"].map(m)
        mask = n > thresh
        return pd.DataFrame({
            "doc_id": df.loc[mask, "doc_id"].astype("int64"),
            "lang": df.loc[mask, "lang"],
            "n_tokens": n[mask],
        })

    return documents.map_batches(keep, batch_format="pandas")
