"""Joins: native hash join + explicit partitioned fallback.

Two implementations of the inner equi-join (J3 analog, SURVEY §2.4):

* :func:`hash_join` — Ray Data's native ``Dataset.join`` (hash-partitioned
  on the key, both sides shuffled into ``num_partitions`` aggregators).
* :func:`grouped_join` — the portable explicit pattern for engines/versions
  without a join operator: tag each side, align schemas, union, one
  ``groupby(key)`` shuffle, and a pandas merge within each key group.
  Partitioning assumption: all rows of one key fit in one group (salt hot
  keys into sub-buckets before calling when that's not true).
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd


def hash_join(left: rd.Dataset, right: rd.Dataset, on: str,
              right_on: str | None = None, num_partitions: int | None = None,
              join_type: str = "inner") -> rd.Dataset:
    """Native hash join. ``num_partitions`` defaults to the cluster CPU
    count (capped 2..64): each partition runs a HashShuffleAggregator
    actor, and over-provisioning aggregators beyond the CPUs deadlocks
    small clusters when composed with actor-pool stages (observed at 16
    partitions on 4 cpus). On a real multi-node cluster pass an explicit
    larger value sized to total cores."""
    if num_partitions is None:
        import ray
        cpus = (int(ray.cluster_resources().get("CPU", 4))
                if ray.is_initialized() else 4)
        num_partitions = max(2, min(64, cpus))
    return left.join(right, join_type=join_type, num_partitions=num_partitions,
                     on=(on,), right_on=(right_on or on,))


def asof_join(left: rd.Dataset, right: rd.Dataset, key: str, ts: str,
              right_cols: list[str] | None = None,
              suffix: str = "_right") -> rd.Dataset:
    """As-of join: each left row matches the latest right row with the same
    ``key`` and ``right.ts <= left.ts`` (backward search, the market-data /
    event-attribution semantics; DuckDB's ``ASOF JOIN`` equivalent).

    Shape: tag sides, align schemas, union, ONE hash shuffle on ``key``,
    then ``pd.merge_asof`` over the ts-sorted group — the composition the
    Dataset API can't express directly (SURVEY custom-operator rule (a)).
    Partitioning assumption: one key's rows fit in one group; salt hot keys
    upstream if not. Inner semantics: left rows with no prior right row are
    dropped (matches SQL ASOF JOIN)."""
    lcols = left.schema().names
    rcols = right_cols or [c for c in right.schema().names
                           if c not in (key, ts)]

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[lcols].copy()
        out["__side"] = 0
        for c in rcols:
            out[c + suffix] = None
        out[ts + suffix] = None
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({key: df[key]})
        out[ts] = df[ts]
        out["__side"] = 1
        for c in lcols:
            if c not in (key, ts):
                out[c] = None
        for c in rcols:
            out[c + suffix] = df[c]
        out[ts + suffix] = df[ts]
        return out[[*lcols, "__side",
                    *[c + suffix for c in rcols], ts + suffix]]

    unioned = (left.map_batches(tag_left, batch_format="pandas")
               .union(right.map_batches(tag_right, batch_format="pandas")))

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][[*lcols]].sort_values(ts, kind="mergesort")
        rsub = g[g["__side"] == 1]
        empty = pd.DataFrame({c: pd.Series([], dtype="object")
                              for c in [*lcols,
                                        *[c + suffix for c in rcols],
                                        ts + suffix]})
        if lg.empty or rsub.empty:
            return empty
        rg = pd.DataFrame({ts: rsub[ts + suffix]})
        for c in rcols:
            rg[c + suffix] = rsub[c + suffix].values
        rg[ts + suffix] = rsub[ts + suffix].values
        rg = rg.sort_values(ts, kind="mergesort")
        merged = pd.merge_asof(lg, rg, on=ts, direction="backward")
        merged = merged.dropna(subset=[ts + suffix])  # inner semantics
        return merged

    return unioned.groupby(key).map_groups(join_group, batch_format="pandas")


def grouped_join(left: rd.Dataset, right: rd.Dataset, on: str,
                 right_on: str | None = None) -> rd.Dataset:
    right_on = right_on or on
    lcols = left.schema().names
    rcols = [c for c in right.schema().names if c != right_on]

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__key"] = df[on]
        df["__side"] = 0
        for c in rcols:
            df[c] = None
        return df

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({c: df[c] for c in rcols})
        out["__key"] = df[right_on]
        out["__side"] = 1
        for c in lcols:
            out[c] = None
        return out[[*lcols, "__key", "__side", *rcols]]

    unioned = (left.map_batches(tag_left, batch_format="pandas")
               .union(right.map_batches(tag_right, batch_format="pandas")))

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][[*lcols]]
        rg = g[g["__side"] == 1][[*rcols]].assign(__k=g.loc[g["__side"] == 1, "__key"])
        if lg.empty or rg.empty:
            return pd.DataFrame({c: pd.Series([], dtype="object")
                                 for c in [*lcols, *rcols]})
        merged = lg.merge(rg, left_on=on, right_on="__k").drop(columns="__k")
        return merged

    return unioned.groupby("__key").map_groups(join_group, batch_format="pandas")
