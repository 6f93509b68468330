"""Windowed aggregation over the ``events`` stream table.

Ray Data has no event-time windows; tumbling windows are expressed as
partial aggregation inside ``map_batches`` (floor ts to the window start,
one partial row per (event_type, window) per batch) followed by one small
``groupby`` over the partials — the classic combiner pattern, so the
shuffle moves per-window partials, not raw events.
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd
from ray.data.aggregate import Sum


_ARROW_UNIT = {"h": "hour", "H": "hour", "min": "minute", "T": "minute",
               "d": "day", "D": "day", "s": "second"}


def _parse_freq(freq: str) -> tuple[int, str]:
    """pandas-style offset alias -> (multiple, arrow unit): 'h' -> (1,
    'hour'), '2h' -> (2, 'hour'), '30min' -> (30, 'minute') — the aliases
    the pandas-based implementation accepted keep working."""
    import re
    m = re.fullmatch(r"(\d*)\s*([A-Za-z]+)", freq.strip())
    if not m or m.group(2) not in _ARROW_UNIT:
        raise ValueError(f"unsupported window freq {freq!r}; use "
                         f"[N]{{{'/'.join(sorted(set(_ARROW_UNIT)))}}}")
    return int(m.group(1) or 1), _ARROW_UNIT[m.group(2)]


def tumbling_window_counts(ds: rd.Dataset, freq: str = "h") -> rd.Dataset:
    """-> (event_type, window_start, n_events) tumbling windows of `freq`.
    The partial is zero-copy Arrow: floor_temporal + Arrow group_by, no
    pandas conversion on the event stream."""
    import pyarrow as pa
    import pyarrow.compute as pc
    multiple, unit = _parse_freq(freq)

    def partial(t: pa.Table) -> pa.Table:
        # normalize to timestamp[us] before the int cast: pandas-sourced
        # blocks arrive as timestamp[ns] (the Timedelta-promotion gotcha)
        win_us = pc.cast(pc.cast(pc.floor_temporal(t.column("ts"),
                                                   multiple=multiple,
                                                   unit=unit),
                                 pa.timestamp("us")), pa.int64())
        key = pc.binary_join_element_wise(
            t.column("event_type"), pc.cast(win_us, pa.string()),
            pa.scalar("|"))
        g = pa.table({"key": key}).group_by("key").aggregate([("key", "count")])
        return pa.table({"key": g.column("key"),
                         "n_partial": g.column("key_count")})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("key").aggregate(Sum("n_partial", alias_name="n_events"))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["key"].str.rsplit("|", n=1, expand=True)
        return pd.DataFrame({
            "event_type": parts[0],
            "window_start": pd.to_datetime(parts[1].astype("int64"),
                                           unit="us").astype("datetime64[us]"),
            "n_events": df["n_events"].astype("int64"),
        })

    return agg.map_batches(finalize, batch_format="pandas")


def sliding_window_counts(ds: rd.Dataset, size_hours: int = 2,
                          step_hours: int = 1) -> rd.Dataset:
    """-> (event_type, window_start, n_events) sliding windows: each event
    lands in size/step consecutive step-aligned windows (exploded in the
    partial stage, so the shuffle still moves per-window partials)."""
    if size_hours % step_hours != 0:
        raise ValueError(
            f"size_hours ({size_hours}) must be a multiple of step_hours "
            f"({step_hours}): fractional window membership would be "
            f"silently dropped by the step-aligned explode")
    k = size_hours // step_hours

    import pyarrow as pa
    import pyarrow.compute as pc
    step_us = step_hours * 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        base_us = pc.cast(pc.cast(
            pc.floor_temporal(t.column("ts"), multiple=step_hours,
                              unit="hour"), pa.timestamp("us")), pa.int64())
        keys = []
        for i in range(k):  # explode: each event lands in k windows
            shifted = pc.subtract(base_us, pa.scalar(i * step_us, pa.int64()))
            keys.append(pc.binary_join_element_wise(
                t.column("event_type"), pc.cast(shifted, pa.string()),
                pa.scalar("|")))
        chunks = []
        for key_arr in keys:
            chunks.extend(key_arr.chunks
                          if isinstance(key_arr, pa.ChunkedArray)
                          else [key_arr])
        allk = (pa.chunked_array(chunks, pa.string()) if chunks
                else pa.array([], pa.string()))
        g = pa.table({"key": allk}).group_by("key").aggregate([("key", "count")])
        return pa.table({"key": g.column("key"),
                         "n_partial": g.column("key_count")})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("key").aggregate(Sum("n_partial",
                                                alias_name="n_events"))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["key"].str.rsplit("|", n=1, expand=True)
        return pd.DataFrame({
            "event_type": parts[0],
            "window_start": pd.to_datetime(parts[1].astype("int64"),
                                           unit="us").astype("datetime64[us]"),
            "n_events": df["n_events"].astype("int64"),
        })

    return agg.map_batches(finalize, batch_format="pandas")


def sessionize(ds: rd.Dataset, gap_minutes: int = 30) -> rd.Dataset:
    """-> (user_id, n_sessions): session counts with a `gap_minutes`
    inactivity threshold.

    The streaming-shaped operator (SURVEY §2.9): events are treated as an
    ordered, partitioned log — hash-shuffle on user_id, sort by ts inside
    each group, count gap crossings. Ordering assumption: per-user history
    fits one group (holds at any scale where a single user's events fit in
    memory; for hotter keys, sessionize per (user, day) and merge)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values()
        n = int((ts.diff() > gap).sum()) + 1
        return pd.DataFrame({"user_id": [int(g["user_id"].iloc[0])],
                             "n_sessions": [n]})

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def sessionize_bucketed(ds: rd.Dataset, gap_minutes: int = 30,
                        bucket_freq: str = "D") -> rd.Dataset:
    """Hot-key-safe sessionize, EXACTLY equal to :func:`sessionize`.

    The plain operator assumes one user's full history fits a group; a
    pathological user breaks that. Here the heavy shuffle keys on
    (user_id, time bucket) — bounded groups regardless of user heat — and
    a second tiny per-user pass merges sessions that span adjacent bucket
    boundaries (boundary gap <= threshold means the two edge sessions are
    one). Exactness requires bucket duration >= the gap (a session can
    then never skip over a non-empty bucket): asserted.

    Two shuffles instead of one, but the second moves one summary row per
    (user, bucket) — the escape hatch is cheap."""
    gap = pd.Timedelta(minutes=gap_minutes)
    assert pd.tseries.frequencies.to_offset(bucket_freq).nanos >= gap.value, \
        "bucket duration must be >= the session gap for exactness"

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            bucket=df["ts"].dt.floor(bucket_freq).astype("datetime64[us]"))

    def per_chunk(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values()
        n = int((ts.diff() > gap).sum()) + 1
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "bucket": [g["bucket"].iloc[0]],
            "n": pd.Series([n], dtype="int64"),
            "first_ts": [ts.iloc[0]],
            "last_ts": [ts.iloc[-1]],
        })

    chunks = (ds.map_batches(add_bucket, batch_format="pandas")
                .groupby(["user_id", "bucket"])
                .map_groups(per_chunk, batch_format="pandas"))

    def merge_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket")
        total = int(g["n"].sum())
        first = pd.to_datetime(g["first_ts"]).to_numpy()
        last = pd.to_datetime(g["last_ts"]).to_numpy()
        merges = int(((first[1:] - last[:-1]) <= gap.to_timedelta64()).sum())
        return pd.DataFrame({"user_id": [int(g["user_id"].iloc[0])],
                             "n_sessions": [total - merges]})

    return chunks.groupby("user_id").map_groups(merge_user,
                                                batch_format="pandas")
