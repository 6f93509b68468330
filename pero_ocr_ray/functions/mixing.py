"""Proportional source interleaving — the training-stream mixing step.

Training loaders consume curated corpora as ONE stream in which every
source (crawl, books, code, ...) appears evenly spread at its corpus
proportion (T5's mixture rates, The Pile's weighted sampling) — not in
source-contiguous runs, which would make the tail of training see only
one distribution. This operator assigns each document a deterministic
global position with that property:

1. per-source seeded rank ``rk``: docs of a source are sub-ordered by
   ``md5("mix{seed}:" + id)`` (the ``functions/shuffle.py`` convention),
   so within-source order is pseudo-random but reproducible;
2. fixed-point mix key ``(2*rk + 1) * 2^20 // n_source`` — the midpoint
   rule places the k-th doc of a source at fraction (k+0.5)/n of the
   stream, EXACT integer arithmetic (no float schedule drift between
   engines; bound: n_source < 2^42 keeps the product under 2^63);
3. global order by (mix_key, source, id): one total sort, positions
   assigned by the same two-pass block scan ``functions/budget.py`` and
   ``functions/shuffle.py`` use (one summary row per block to the
   driver, broadcast offsets back).

Scale shape: two sorts (per-source rank, final order) — the same budget
as the seeded-global-shuffle + exact-NTILE chain, documented there; all
other passes are narrow. Driver traffic is cluster-metadata sized:
one count row per source, one summary row per block.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum

MIX_SCALE = 1 << 20  # fixed-point resolution of the schedule


def _md5_mix_key(ids, seed: int) -> list[str]:
    return [hashlib.md5(f"mix{seed}:{i}".encode()).hexdigest()
            for i in ids]


def interleave_positions(docs: rd.Dataset, seed: int = 42,
                         source_col: str = "source",
                         id_col: str = "doc_id") -> rd.Dataset:
    """-> (id_col, source_col, rk, pos): ``rk`` = seeded rank within the
    row's source, ``pos`` = 0-based position in the proportionally
    interleaved global stream. SQL mirror: two ``row_number()`` windows
    plus the integer midpoint key (``__ray_entry__`` `mixed_stream`)."""

    # pass A: bounded per-source counts (combiner -> tiny groupby)
    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(source_col, as_index=False).agg(n=(id_col, "size"))

    counts = {r[source_col]: int(r["n"]) for r in
              (docs.select_columns([id_col, source_col])
               .map_batches(count_partial, batch_format="pandas")
               .groupby(source_col).aggregate(Sum("n", alias_name="n"))
               .take_all())}
    cref = ray.put(counts)

    # pass B: per-source seeded rank via sort + block scan
    def add_key(t: pa.Table) -> pa.Table:
        return t.select([id_col, source_col]).append_column(
            "__k", pa.array(_md5_mix_key(t.column(id_col).to_pylist(),
                                         seed), pa.string()))

    by_src = (docs.map_batches(add_key, batch_format="pyarrow")
              .sort([source_col, "__k", id_col]).materialize())

    def src_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"b_src": pa.array([], pa.string()),
                             "b_k": pa.array([], pa.string()),
                             "b_id": pa.array([], pa.int64()),
                             "src": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = pd.DataFrame({"src": t.column(source_col).to_pandas()})
        g = df.groupby("src", sort=True).size()
        return pa.table({
            "b_src": pa.array([t.column(source_col)[0].as_py()] * len(g)),
            "b_k": pa.array([t.column("__k")[0].as_py()] * len(g)),
            "b_id": pa.array([int(t.column(id_col)[0].as_py())] * len(g),
                             pa.int64()),
            "src": pa.array(g.index.astype(str), pa.string()),
            "n": pa.array(g.to_numpy().astype("int64"), pa.int64()),
        })

    summ = (by_src.map_batches(src_summary, batch_format="pyarrow",
                               batch_size=None).to_pandas())
    if len(summ) == 0:
        empty = pa.schema([(id_col, pa.int64()),
                           (source_col, pa.string()),
                           ("rk", pa.int64()), ("pos", pa.int64())])
        return rd.from_arrow(empty.empty_table())
    summ = summ.sort_values(["b_src", "b_k", "b_id"], ignore_index=True)
    summ["prior"] = (summ.groupby("src")["n"].cumsum() - summ["n"])
    prior = {(r.b_src, r.b_k, int(r.b_id), r.src): int(r.prior)
             for r in summ.itertuples()}
    pref = ray.put(prior)

    def add_rank(t: pa.Table) -> pa.Table:
        pri = ray.get(pref)
        head = (t.column(source_col)[0].as_py(),
                t.column("__k")[0].as_py(),
                int(t.column(id_col)[0].as_py()))
        src = t.column(source_col).to_pandas()
        within = src.groupby(src, sort=False).cumcount().to_numpy()
        base = src.map(lambda s: pri[(head[0], head[1], head[2], s)]) \
            .to_numpy("int64")
        counts_b = ray.get(cref)
        ns = src.map(counts_b).to_numpy("int64")
        rk = base + within
        mix = (2 * rk + 1) * MIX_SCALE // ns
        return pa.table({
            id_col: t.column(id_col),
            source_col: t.column(source_col),
            "rk": pa.array(rk, pa.int64()),
            "__mix": pa.array(mix, pa.int64()),
        })

    ranked = by_src.map_batches(add_rank, batch_format="pyarrow",
                                batch_size=None)

    # pass C: final order + two-pass position scan. The repartition is
    # the repo's standing guard (CLAUDE.md): empty blocks SKIP add_rank
    # and would enter the sort with the stale pre-rank schema; block
    # contiguity no longer matters here (rk/__mix are per-row), so
    # consolidation is free. Sized to the cluster, not a constant.
    import ray as _ray
    cpus = int(_ray.cluster_resources().get("CPU", 4)) \
        if _ray.is_initialized() else 4
    ordered = (ranked.repartition(max(2, min(64, cpus)))
               .sort(["__mix", source_col, id_col]).materialize())

    def blk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"f_mix": pa.array([], pa.int64()),
                             "f_src": pa.array([], pa.string()),
                             "f_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "f_mix": pa.array([int(t.column("__mix")[0].as_py())],
                              pa.int64()),
            "f_src": pa.array([t.column(source_col)[0].as_py()]),
            "f_id": pa.array([int(t.column(id_col)[0].as_py())],
                             pa.int64()),
            "n": pa.array([t.num_rows], pa.int64()),
        })

    s2 = (ordered.map_batches(blk, batch_format="pyarrow",
                              batch_size=None).to_pandas())
    s2 = s2.sort_values(["f_mix", "f_src", "f_id"], ignore_index=True)
    off = {(int(m), s, int(i)): int(p) for m, s, i, p in
           zip(s2["f_mix"], s2["f_src"], s2["f_id"],
               s2["n"].cumsum() - s2["n"])}
    oref = ray.put(off)

    def pos(t: pa.Table) -> pa.Table:
        offs = ray.get(oref)
        base = offs[(int(t.column("__mix")[0].as_py()),
                     t.column(source_col)[0].as_py(),
                     int(t.column(id_col)[0].as_py()))]
        return t.drop_columns(["__mix"]).append_column(
            "pos", pa.array(base + np.arange(t.num_rows, dtype=np.int64),
                            pa.int64()))

    return ordered.map_batches(pos, batch_format="pyarrow",
                               batch_size=None)
