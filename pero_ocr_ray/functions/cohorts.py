"""User-cohort analytics over the ``events`` stream: weekly retention
matrix and ordered funnel completion.

Both are the classic "per-user state" wide operations, expressed so the
shuffles move per-user PARTIALS, never raw events:

* **retention**: cohort = week of a user's first event = the user's MIN
  activity week (week(min ts) == min(week ts)), so the whole matrix
  derives from the distinct (user, week) pairs alone — per-batch distinct
  partials, one pair groupby, then a BUCKETED second groupby
  (``user_id % num_buckets``) where one vectorized pandas transform
  computes every user's cohort and offsets (no join, no per-user
  dispatch), and a final tiny (cohort, offset) Sum.
* **funnel**: step k's entry time is the per-user min ts of step-k events
  strictly after the user's step-(k-1) time — each stage is a hash join of
  ONLY that step's events against the (user, prev_ts) table (both sides
  shrink monotonically down the funnel), then a ``Min`` combiner. The
  per-user table is materialized (consumed twice: count + next join) and
  repartitioned before the join — sparse aggregate partitions emit
  null-schema empty blocks that abort the native join (CLAUDE.md); the
  funnel short-circuits once a step count hits zero.

Week convention: Arrow ``floor_temporal(unit="week")`` (Monday start)
matches DuckDB ``date_trunc('week', ...)``; offsets are exact integer
microsecond arithmetic on week-truncated stamps (never float days).
Timestamps normalize to ``timestamp[us]`` before any int64 cast (the
pandas-ns promotion gotcha, CLAUDE.md).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

_WEEK_US = 7 * 86400 * 1_000_000

_RET_SCHEMA = pa.schema([
    ("cohort_week", pa.timestamp("us")), ("week_offset", pa.int64()),
    ("n_users", pa.int64()),
])


def _week_us(ts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """ts -> int64 epoch-us of its Monday-start week truncation."""
    wk = pc.floor_temporal(ts, unit="week", week_starts_monday=True)
    return pc.cast(pc.cast(wk, pa.timestamp("us")), pa.int64())


def _per_user_min_us(ds: rd.Dataset, ts_expr) -> rd.Dataset:
    """-> (user_id, t_us): per-user minimum of ``ts_expr(table) -> int64
    array``. Per-batch Arrow min partial, one groupby Min."""
    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"user_id": t.column("user_id"),
                       "t_us": ts_expr(t)})
             .group_by("user_id").aggregate([("t_us", "min")]))
        return pa.table({"user_id": g.column("user_id"),
                         "t_us": g.column("t_us_min")})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("user_id").aggregate(Min("t_us", alias_name="t_us")))


def user_retention(events: rd.Dataset,
                   num_buckets: int = 1024) -> rd.Dataset:
    """-> (cohort_week, week_offset, n_users): how many users from each
    first-event-week cohort were active ``week_offset`` weeks later."""

    # distinct (user, activity week): per-batch distinct partial, one pair
    # groupby (Count is just the dedup vehicle) — the shuffle moves at
    # most one row per (user, week) per batch.
    def pair_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"user_id": t.column("user_id"),
                       "week_us": _week_us(t.column("ts"))})
             .group_by(["user_id", "week_us"]).aggregate([]))
        b = pc.cast(pc.bit_wise_and(g.column("user_id"),
                                    num_buckets - 1), pa.int64())
        return g.append_column("__b", b)

    pairs = (events.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["user_id", "week_us", "__b"]).aggregate(Count())
             .select_columns(["user_id", "week_us", "__b"]))

    # one vectorized pandas pass per BUCKET: each user's cohort is its min
    # week (transform), offsets are exact int64 µs; emit (cohort, offset)
    # partial counts. Explicit Arrow out (empty pandas -> null types).
    def bucket_fn(g: pd.DataFrame) -> pa.Table:
        w = g["week_us"].astype("int64")
        m = w.groupby(g["user_id"]).transform("min")
        part = (pd.DataFrame({"cohort_us": m,
                              "week_offset": (w - m) // _WEEK_US})
                .groupby(["cohort_us", "week_offset"], as_index=False)
                .size())
        return pa.table({
            "cohort_us": pa.array(part["cohort_us"].to_numpy("int64"),
                                  pa.int64()),
            "week_offset": pa.array(part["week_offset"].to_numpy("int64"),
                                    pa.int64()),
            "n_partial": pa.array(part["size"].to_numpy("int64"),
                                  pa.int64()),
        })

    agg = (pairs.groupby("__b")
           .map_groups(bucket_fn, batch_format="pandas")
           .groupby(["cohort_us", "week_offset"])
           .aggregate(Sum("n_partial", alias_name="n_users")))

    def finalize(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _RET_SCHEMA.empty_table()
        return pa.table({
            "cohort_week": pa.array(df["cohort_us"].to_numpy("int64"),
                                    pa.int64()).cast(pa.timestamp("us")),
            "week_offset": pa.array(df["week_offset"].to_numpy("int64"),
                                    pa.int64()),
            "n_users": pa.array(df["n_users"].to_numpy("int64"),
                                pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pandas")


def event_funnel(events: rd.Dataset,
                 steps: tuple[str, ...] = ("view", "click", "purchase")
                 ) -> rd.Dataset:
    """-> (step, n_users): users completing each ordered funnel prefix.

    Step 1 time = min ts of a ``steps[0]`` event; step k time = min ts of
    a ``steps[k-1]`` event STRICTLY after the user's step k-1 time. One
    output row per step, ``step`` labeled ``"{k}_{name}"`` so the row
    order is key-determined.
    """
    num_buckets = 256

    _SIDE_SCHEMA = pa.schema([("user_id", pa.int64()),
                              ("t_us", pa.int64()),
                              ("__side", pa.int64())])

    def tagged(reached: rd.Dataset) -> rd.Dataset:
        def fn(t: pa.Table) -> pa.Table:
            import numpy as np
            return pa.table({
                "user_id": t.column("user_id"),
                "t_us": t.column("t_us"),
                "__side": pa.array(np.zeros(t.num_rows, dtype="int64")),
            })
        return reached.map_batches(fn, batch_format="pyarrow")

    def advance(union: rd.Dataset) -> rd.Dataset:
        """(user, t, side) union -> (user_id, t_us): per user, the min
        side-1 time strictly after its side-0 time. Bucketed groupby +
        one vectorized pandas pass per bucket — no native join (a hash
        shuffle partition with zero rows on one side aborts Acero,
        CLAUDE.md), no per-user dispatch."""
        def add_bucket(t: pa.Table) -> pa.Table:
            b = pc.cast(pc.bit_wise_and(t.column("user_id"),
                                        num_buckets - 1), pa.int64())
            return t.append_column("__b", b)

        def bucket_fn(g: pd.DataFrame) -> pa.Table:
            prev = g[g["__side"] == 0][["user_id", "t_us"]]
            ev = g[g["__side"] == 1][["user_id", "t_us"]]
            m = ev.merge(prev, on="user_id", suffixes=("", "_prev"))
            m = m[m["t_us"] > m["t_us_prev"]]
            out = (m.groupby("user_id", as_index=False)["t_us"].min())
            return pa.table({
                "user_id": pa.array(out["user_id"].to_numpy("int64"),
                                    pa.int64()),
                "t_us": pa.array(out["t_us"].to_numpy("int64"),
                                 pa.int64()),
            })

        return (union.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("__b").map_groups(bucket_fn,
                                           batch_format="pandas"))

    def step_all(step: str) -> rd.Dataset:
        """All (user, ts) rows of ``step`` events, side 1. No batch-local
        min pre-reduction: min{ev > prev_t} needs the threshold, which is
        unknown batch-locally — a batch min <= prev_t would shadow a
        later same-batch event that qualifies. The shuffle still ships
        only THIS step's events, not the whole stream."""
        def fn(t: pa.Table) -> pa.Table:
            f = t.filter(pc.equal(t.column("event_type"), step))
            if f.num_rows == 0:
                return _SIDE_SCHEMA.empty_table()
            import numpy as np
            return pa.table({
                "user_id": pc.cast(f.column("user_id"), pa.int64()),
                "t_us": pc.cast(pc.cast(f.column("ts"),
                                        pa.timestamp("us")), pa.int64()),
                "__side": pa.array(np.ones(f.num_rows, dtype="int64")),
            })
        return events.map_batches(fn, batch_format="pyarrow")

    def first_step(t: pa.Table) -> pa.Array:
        return t.column("t_us")

    reached = _per_user_min_us(
        step_all(steps[0]).select_columns(["user_id", "t_us"]),
        first_step).materialize()
    counts = [reached.count()]

    for step in steps[1:]:
        if counts[-1] == 0:
            counts.append(0)
            continue
        union = tagged(reached).union(step_all(step))
        reached = advance(union).materialize()
        counts.append(reached.count())

    out = pa.table({
        "step": pa.array([f"{i + 1}_{s}" for i, s in enumerate(steps)],
                         pa.string()),
        "n_users": pa.array([int(c) for c in counts], pa.int64()),
    })
    return rd.from_arrow(out)
