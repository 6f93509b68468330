"""Proportional interleave: schedule exactness, spread property, invariance."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from pero_ocr_ray.functions.mixing import MIX_SCALE, interleave_positions


def _docs(sizes: dict[str, int]) -> pd.DataFrame:
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append({"doc_id": i, "source": src})
            i += 1
    return pd.DataFrame(rows)


def _run(df, **kw):
    out = interleave_positions(rd.from_pandas(df), **kw)
    return pa.table(out.take_batch(100_000, batch_format="pyarrow")) \
        .to_pandas().sort_values("pos").reset_index(drop=True)


def _brute(df, seed=42):
    h = df["doc_id"].map(lambda v: hashlib.md5(
        f"mix{seed}:{v}".encode()).hexdigest())
    d = df.assign(h=h)
    d["rk"] = d.sort_values(["h", "doc_id"]).groupby("source").cumcount() \
        .reindex(d.index)
    d["rk"] = d.sort_values(["source", "h", "doc_id"]) \
        .groupby("source").cumcount().reindex(
            d.sort_values(["source", "h", "doc_id"]).index) \
        .sort_index()
    ns = d.groupby("source")["doc_id"].transform("size")
    d["mix"] = (2 * d["rk"] + 1) * MIX_SCALE // ns
    d = d.sort_values(["mix", "source", "doc_id"], ignore_index=True)
    d["pos"] = np.arange(len(d))
    return d


def test_matches_brute_force():
    df = _docs({"web": 40, "books": 10, "code": 4})
    got = _run(df)
    want = _brute(df)
    m = got.merge(want[["doc_id", "rk", "pos"]], on="doc_id",
                  suffixes=("", "_w"))
    assert (m["rk"] == m["rk_w"]).all()
    assert (m["pos"] == m["pos_w"]).all()


def test_sources_spread_evenly():
    # 90/10 mix: every window of 10 consecutive positions has exactly
    # one 'rare' doc (midpoint schedule guarantees max gap < 2*N/n)
    df = _docs({"common": 90, "rare": 10})
    out = _run(df)
    rare_pos = out[out["source"] == "rare"]["pos"].to_numpy()
    gaps = np.diff(np.sort(rare_pos))
    assert gaps.max() <= 2 * 100 // 10  # no starved tail
    assert rare_pos.min() < 20 and rare_pos.max() > 80


def test_partitioning_invariance():
    df = _docs({"a": 33, "b": 17, "c": 5})
    one = _run(df)
    many = pa.table(
        interleave_positions(rd.from_pandas(df).repartition(9))
        .take_batch(100_000, batch_format="pyarrow")).to_pandas() \
        .sort_values("pos").reset_index(drop=True)
    assert one[["doc_id", "source", "rk", "pos"]].equals(
        many[["doc_id", "source", "rk", "pos"]])
