"""Deterministic sampling for training-data curation.

At 10^12 documents a curation pipeline down-samples per stratum (keep 100%
of rare languages, 5% of English boilerplate, ...). Randomness is banned by
the engine's determinism invariant, so sampling is HASH-based: a document
is kept iff the first 8 hex chars of md5(str(key)) taken mod 1000 fall
under the stratum's permille rate. That makes the sample:

* deterministic and reproducible across runs/workers/engines (the DuckDB
  oracle evaluates the identical expression);
* consistent — a document's fate never depends on partitioning, and
  raising a rate strictly grows the sample (nested samples);
* streaming — a pure per-row predicate inside ``map_batches``; no shuffle.
"""

from __future__ import annotations

import hashlib

import pandas as pd

import ray.data as rd


def hash_permille(value) -> int:
    """md5-high-32 of the value's decimal string, mod 1000 (uniform)."""
    return int(hashlib.md5(str(value).encode()).hexdigest()[:8], 16) % 1000


def stratified_sample(ds: rd.Dataset, rates_permille: dict[str, int],
                      default_permille: int = 1000,
                      key: str = "doc_id",
                      stratum: str = "lang") -> rd.Dataset:
    """Keep each row iff ``hash_permille(row[key]) <`` its stratum's
    permille rate (``rates_permille[stratum_value]``, else the default).
    Rates are integer permille so the keep predicate is exact in any
    engine (no float thresholds)."""
    for v in rates_permille.values():
        if not (0 <= int(v) <= 1000):
            raise ValueError("rates are integer permille in [0, 1000]")

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        pm = df[key].map(hash_permille)
        limit = (df[stratum].map(rates_permille)
                 .fillna(default_permille).astype("int64"))
        return df[pm < limit]

    return ds.map_batches(keep, batch_format="pandas")


def temperature_quotas(counts: dict[str, int]) -> dict[str, int]:
    """Per-stratum doc quotas for temperature-0.5 rebalancing:
    ``quota = floor(sqrt(n))``. Rare languages keep a far larger share
    than common ones (the multilingual-LM sampling rule of Conneau &
    Lample 2019 / mT5, alpha = 0.5), and the rounding is ENGINE-EXACT:
    IEEE-754 sqrt is correctly rounded, and for n < 2^52 the double
    nearest sqrt(n) never crosses an integer boundary, so
    ``floor(sqrt(CAST(n AS DOUBLE)))`` in DuckDB equals ``math.isqrt(n)``
    here for every real-world stratum size."""
    import math
    return {k: math.isqrt(int(n)) for k, n in counts.items()}


def temperature_sample(ds: rd.Dataset, key: str = "doc_id",
                       stratum: str = "lang") -> rd.Dataset:
    """-> the ``floor(sqrt(n_stratum))`` lowest-hash-ranked rows of each
    stratum: (key, stratum, rk) with ``rk`` the 1-based rank in the
    stratum's seeded order (md5-high-64 of the key, tie-break key).

    Scale shape (two passes, both cheap):
      1. stratum counts — partial count inside ``map_batches`` then a
         tiny ``groupby(stratum)`` (one row per language crosses the
         exchange); quotas derive driver-side from that bounded table.
      2. per-stratum top-``quota`` selection — batch-local head (each
         block forwards at most ``quota`` rows per stratum it contains),
         then one final head per stratum; the shuffle moves only
         candidate rows, ≤ quota × blocks, never the corpus.
    The selected SET is partitioning-independent: membership depends
    only on a row's own hash rank within its stratum.
    """
    import hashlib

    import numpy as np
    import pyarrow as pa

    import ray
    from ray.data.aggregate import Sum

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(stratum, as_index=False).agg(n=(key, "size"))
        return g

    counts_tbl = (ds.map_batches(count_partial, batch_format="pandas")
                  .groupby(stratum)
                  .aggregate(Sum("n", alias_name="n"))
                  .take_all())  # bounded: one row per stratum
    quotas = temperature_quotas({r[stratum]: r["n"] for r in counts_tbl})
    qref = ray.put(quotas)

    def rank_cols(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16)
             for v in df[key]), dtype=np.uint64, count=len(df))
        return pd.DataFrame({
            key: df[key].astype("int64"),
            stratum: df[stratum],
            "__h": h.view(np.int64),  # int64 view keeps Arrow-native sort
        })

    class LocalHead:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = rank_cols(df)
            lim = df[stratum].map(self.q).fillna(0).astype("int64")
            # uint64 order == int64-view order within each sign half;
            # sort on the original unsigned value to match SQL
            u = df["__h"].to_numpy().view(np.uint64)
            df = df.assign(__u=u)
            df = df.sort_values(["__u", key], kind="mergesort")
            rk = df.groupby(stratum).cumcount()
            return df[rk < lim.loc[df.index].to_numpy()] \
                .drop(columns=["__u"])

    def final_head(g: pd.DataFrame) -> pa.Table:
        q = quotas.get(g[stratum].iloc[0], 0)
        u = g["__h"].to_numpy().view(np.uint64)
        order = np.lexsort((g[key].to_numpy(), u))[:q]
        sel = g.iloc[order]
        return pa.table({
            key: pa.array(sel[key].to_numpy("int64"), pa.int64()),
            stratum: pa.array(sel[stratum].astype(str), pa.string()),
            "rk": pa.array(np.arange(1, len(sel) + 1, dtype="int64"),
                           pa.int64()),
        })

    cols = ds.select_columns([key, stratum])
    return (cols.map_batches(LocalHead, batch_format="pandas",
                             concurrency=2)
            .groupby(stratum).map_groups(final_head,
                                         batch_format="pandas"))


def quality_upsample(scored: rd.Dataset, hi_milli: int = 500,
                     hi_repeats: int = 2, seed: int = 42) -> rd.Dataset:
    """Quality-weighted epoch plan (FineWeb-Edu / DoReMi-style static
    upsampling): (doc_id, n_tokens, clf_score) -> one row per TRAINING
    COPY (doc_id, copy_idx, order_key).

    Tiering is the integer cross-multiplication on the mean token score
    (milli-units, no floats): docs with ``clf_score * 1000 >= hi_milli *
    n_tokens`` (and at least one token) emit ``hi_repeats`` copies; docs
    with ``clf_score >= 0`` emit one; the rest are dropped. ``order_key``
    = ``md5("epoch{seed}:{doc_id}:{copy_idx}")`` — the seeded-shuffle
    convention (functions/shuffle.py), so sorting by it interleaves the
    repeats pseudo-randomly through the stream; the operator itself is a
    pure streaming map (ZERO shuffle — the sort belongs to the consumer,
    and the gate hash is order-insensitive). One md5 per emitted copy
    (per-document, not per-token — same cost class as the shuffle key).
    """
    import numpy as np
    import pyarrow as pa

    def expand(df: pd.DataFrame) -> pa.Table:
        ids = df["doc_id"].to_numpy("int64")
        n = df["n_tokens"].to_numpy("int64")
        s = df["clf_score"].to_numpy("int64")
        hi = (s * 1000 >= hi_milli * n) & (n > 0)
        reps = np.where(hi, hi_repeats,
                        np.where(s >= 0, 1, 0)).astype(np.int64)
        out_ids = np.repeat(ids, reps)
        ends = np.cumsum(reps)
        copy_idx = (np.arange(int(ends[-1]) if len(ends) else 0,
                              dtype=np.int64)
                    - np.repeat(ends - reps, reps))
        keys = [hashlib.md5(f"epoch{seed}:{i}:{c}".encode()).hexdigest()
                for i, c in zip(out_ids, copy_idx)]
        return pa.table({
            "doc_id": pa.array(out_ids, pa.int64()),
            "copy_idx": pa.array(copy_idx, pa.int64()),
            "order_key": pa.array(keys, pa.string()),
        })

    return scored.map_batches(expand, batch_format="pandas")


def weighted_token_sample(docs: rd.Dataset, k: int = 200,
                          seed: int = 42) -> rd.Dataset:
    """Exact weighted sampling by token mass (with replacement):
    (doc_id, text) -> (doc_id, n_tokens, n_hits >= 1).

    The streaming-sampling classic, made deterministic: lay every
    document's tokens end-to-end in ascending-doc_id order (total mass
    W), draw ``k`` pseudo-random positions ``md5_high64(f"wsample{seed}:
    {i}") % W``, and credit each hit to the document whose token range
    covers it — a document's hit count is Binomial(k, w/W) in
    distribution but exactly reproducible (SQL replays the identical
    cumsum + position arithmetic; every value is int64).

    Scale shape: ONE sort freezes a globally ordered blocking (the
    budget.py scan pattern); pass 1 ships one (first_doc_id, block token
    sum) row per block to the driver — cluster-metadata scale — which
    turns them into prior offsets and W; the k positions are metadata
    (bounded), broadcast sorted; pass 2 is a streaming searchsorted per
    block. No corpus-scale state anywhere but the sort.
    """
    import numpy as np
    import pyarrow as pa
    import ray
    from pero_ocr_ray.kernels.textstats import TOKEN_RE

    def feat(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": df["text"].str.count(TOKEN_RE).astype("int64"),
        })

    sorted_ds = (docs.map_batches(feat, batch_format="pandas")
                 .sort("doc_id").materialize())

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_id": pa.array([], pa.int64()),
                             "toks": pa.array([], pa.int64())})
        return pa.table({
            "first_id": pa.array([t.column("doc_id")[0].as_py()],
                                 pa.int64()),
            "toks": pa.array(
                [int(t.column("n_tokens").to_numpy().sum())], pa.int64()),
        })

    summ = (sorted_ds.map_batches(block_summary, batch_format="pyarrow",
                                  batch_size=None)
            .to_pandas().sort_values("first_id", ignore_index=True))
    total = int(summ["toks"].sum()) if len(summ) else 0
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_tokens", pa.int64()),
                            ("n_hits", pa.int64())])
    if total == 0:
        return rd.from_arrow(out_schema.empty_table())
    prior = summ["toks"].cumsum() - summ["toks"]
    offsets = {int(f): int(p) for f, p in zip(summ["first_id"], prior)}
    positions = np.sort(np.array(
        [int(hashlib.md5(f"wsample{seed}:{i}".encode())
             .hexdigest()[:16], 16) % total for i in range(k)],
        dtype=np.int64))
    ref = ray.put((offsets, positions))

    def hits(t: pa.Table) -> pa.Table:
        offs, pos = ray.get(ref)
        if t.num_rows == 0:
            return out_schema.empty_table()
        ids = t.column("doc_id").to_numpy()
        toks = t.column("n_tokens").to_numpy()
        cum = offs[int(ids[0])] + np.cumsum(toks)
        hi = np.searchsorted(pos, cum, side="left")
        lo = np.searchsorted(pos, cum - toks, side="left")
        n = (hi - lo).astype(np.int64)
        m = n > 0
        return pa.table({"doc_id": pa.array(ids[m], pa.int64()),
                         "n_tokens": pa.array(toks[m], pa.int64()),
                         "n_hits": pa.array(n[m], pa.int64())})

    return sorted_ds.map_batches(hits, batch_format="pyarrow",
                                 batch_size=None)
