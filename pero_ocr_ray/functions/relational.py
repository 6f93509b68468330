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
    aggregation before the shuffle."""
    cutoff_ts = pd.Timestamp(cutoff)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] <= cutoff_ts]
        if df.empty:
            return pd.DataFrame({"key": pd.Series([], dtype="object"),
                                 "qty": pd.Series([], dtype="float64"),
                                 "base": pd.Series([], dtype="float64"),
                                 "disc_price": pd.Series([], dtype="float64"),
                                 "n": pd.Series([], dtype="int64")})
        df = df.assign(key=df["l_returnflag"] + "|" + df["l_linestatus"],
                       disc_price=df["l_extendedprice"] * (1 - df["l_discount"]))
        g = df.groupby("key", as_index=False).agg(
            qty=("l_quantity", "sum"), base=("l_extendedprice", "sum"),
            disc_price=("disc_price", "sum"), n=("l_quantity", "size"))
        return g

    agg = (lineitem.map_batches(partial, batch_format="pandas")
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

    The customer side broadcasts (a segment's key set is genuinely small:
    an int array ``ray.put`` once, read inside each map task). The
    orders↔lineitem edge is a shuffle hash join on ``o_orderkey``: the
    date-filtered orders side is O(|orders|) — broadcasting it was a driver
    materialization that dies at scale — so lineitem revenue is first
    pre-aggregated per orderkey (combiner: the shuffle moves per-key
    partials), then joined with the filtered orders stream."""
    cutoff_ts = pd.Timestamp(cutoff)
    cust_ids = set(
        r["c_custkey"]
        for r in customer.map_batches(
            lambda df: df.loc[df["c_mktsegment"] == segment, ["c_custkey"]],
            batch_format="pandas").take_all())
    cust_ref = ray.put(np.array(sorted(cust_ids), dtype=np.int64))

    def filter_orders(df: pd.DataFrame) -> pd.DataFrame:
        ids = ray.get(cust_ref)
        m = (df["o_orderdate"] < cutoff_ts) & df["o_custkey"].isin(ids)
        return df.loc[m, ["o_orderkey", "o_orderdate"]]

    sel_orders = orders.map_batches(filter_orders, batch_format="pandas")

    def partial_rev(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[df["l_shipdate"] > cutoff_ts]
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        g = (df.assign(revenue=rev)
               .groupby("l_orderkey", as_index=False)["revenue"].sum())
        return g.rename(columns={"l_orderkey": "o_orderkey"})

    agg = (lineitem.map_batches(partial_rev, batch_format="pandas")
           .groupby("o_orderkey").aggregate(Sum("revenue", alias_name="revenue")))

    from pero_ocr_ray.functions.join import hash_join
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


def customer_segment_counts(customer: rd.Dataset) -> rd.Dataset:
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("c_mktsegment", as_index=False).size()
                  .rename(columns={"size": "n_partial"}))
    agg = (customer.map_batches(partial, batch_format="pandas")
           .groupby("c_mktsegment").aggregate(Sum("n_partial",
                                                  alias_name="n_customers")))
    return agg.map_batches(
        lambda df: df.assign(n_customers=df["n_customers"].astype("int64")),
        batch_format="pandas")


def _quantile_disc(sorted_vals: np.ndarray, q: float) -> int:
    """DuckDB quantile_disc semantics: sorted[ceil(q*n) - 1] (verified)."""
    import math
    n = len(sorted_vals)
    return int(sorted_vals[max(0, math.ceil(q * n) - 1)])


def token_quantiles_by_lang(documents: rd.Dataset) -> rd.Dataset:
    """Exact discrete quantiles of per-doc token counts, grouped by lang.

    The distributional-aggregate shape: a cheap vectorized feature map,
    then per-group exact quantiles inside ``map_groups`` (one shuffle keyed
    on lang). Semantics match DuckDB ``quantile_disc`` exactly."""
    from pero_ocr_ray.kernels.textstats import TOKEN_RE

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": df["lang"],
            "n_tokens": df["text"].str.count(TOKEN_RE).astype("int64"),
        })

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["n_tokens"].to_numpy())
        return pd.DataFrame({
            "lang": [g["lang"].iloc[0]],
            "p25": pd.Series([_quantile_disc(v, 0.25)], dtype="int64"),
            "p50": pd.Series([_quantile_disc(v, 0.50)], dtype="int64"),
            "p90": pd.Series([_quantile_disc(v, 0.90)], dtype="int64"),
        })

    return (documents.map_batches(feats, batch_format="pandas")
            .groupby("lang").map_groups(quantiles, batch_format="pandas"))


def lang_counts(documents: rd.Dataset) -> rd.Dataset:
    """Documents per lang (partial count then tiny groupby)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("lang", as_index=False).size()
                  .rename(columns={"size": "n_partial"}))

    agg = (documents.map_batches(partial, batch_format="pandas")
           .groupby("lang").aggregate(Sum("n_partial", alias_name="n_docs")))
    return agg.map_batches(
        lambda df: df.assign(n_docs=df["n_docs"].astype("int64")),
        batch_format="pandas")
