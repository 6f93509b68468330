"""Deterministic global shuffle — seeded corpus-wide training order.

Training-data pipelines end with a global shuffle so correlated documents
(same crawl shard, same site) don't appear consecutively in the training
stream. ``ray.data.Dataset.random_shuffle`` is nondeterministic across
runs/partitionings, which breaks both resumability and the byte-identity
gates — so this operator derives the permutation from content: sort by
``md5("shuffle{seed}:" + doc_id)`` (doc_id tie-break on the astronomically
unlikely digest collision), then assign the global position with the same
two-pass scan ``functions/budget.py`` uses: the sort freezes a globally
ordered blocking (materialized once), pass 1 ships one (first_key,
first_id, n_rows) summary row per block to the driver (cluster-metadata
scale), pass 2 adds the broadcast prior-count offset to a block-local
arange. SQL mirror: ``row_number() OVER (ORDER BY md5(...), doc_id) - 1``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def global_shuffle_positions(docs: rd.Dataset, seed: int = 42,
                             id_col: str = "doc_id") -> rd.Dataset:
    """-> input columns + ``pos``: the row's 0-based rank in the seeded
    pseudo-random total order over the whole corpus. Payload columns ride
    through the sort unchanged, so composing pipelines need no post-join."""

    def key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        ks = [hashlib.md5(f"shuffle{seed}:{i}".encode()).hexdigest()
              for i in ids]
        return t.append_column("__k", pa.array(ks, pa.string()))

    sorted_ds = (docs.map_batches(key, batch_format="pyarrow")
                 .sort(["__k", id_col]).materialize())

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_k": pa.array([], pa.string()),
                             "first_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "first_k": pa.array([t.column("__k")[0].as_py()], pa.string()),
            "first_id": pa.array([t.column(id_col)[0].as_py()], pa.int64()),
            "n": pa.array([t.num_rows], pa.int64()),
        })

    summ = (sorted_ds.map_batches(block_summary, batch_format="pyarrow",
                                  batch_size=None)
            .to_pandas())  # one row per block: scan metadata, tiny
    if len(summ) == 0:  # empty corpus: empty blocks skip the summary UDF
        sch = docs.schema()
        fields = (list(zip(sch.names, sch.types)) if sch
                  else [(id_col, pa.int64())])
        empty = pa.schema(fields + [("pos", pa.int64())])
        return rd.from_arrow(empty.empty_table())
    summ = summ.sort_values(["first_k", "first_id"], ignore_index=True)
    prior = summ["n"].cumsum() - summ["n"]
    offsets = {(k, int(i)): int(p) for k, i, p in
               zip(summ["first_k"], summ["first_id"], prior)}
    ref = ray.put(offsets)

    def pos(t: pa.Table) -> pa.Table:
        offs = ray.get(ref)
        base = offs[(t.column("__k")[0].as_py(),
                     int(t.column(id_col)[0].as_py()))]
        return t.drop_columns(["__k"]).append_column(
            "pos", pa.array(base + np.arange(t.num_rows, dtype=np.int64),
                            pa.int64()))

    return sorted_ds.map_batches(pos, batch_format="pyarrow",
                                 batch_size=None)
