"""Distributed exact k-means over the embeddings table + SemDeDup
semantic deduplication (kernels/kmeans.py holds the shared math; see its
header for why everything is int64 fixed-point).

Scale shape:

* the quantized corpus is materialized ONCE (it is consumed ``iters + 1``
  times; re-reading parquet per Lloyd step would multiply the read bill);
* init = embeddings of the k smallest vec_ids via a distributed min-k
  (batch-local head + one tiny final merge), never a full sort;
* each Lloyd step is one streaming pass: per-batch ``partial_sums_q``
  emits k combiner rows (counts + per-dimension int sums), one
  ``groupby(cluster)`` merges them, and only k rows reach the driver;
* assignment is a final embarrassingly-parallel pass;
* SemDeDup groups by cluster id — the cluster IS the blocking key (the
  paper's design: k should grow ~sqrt(N) so clusters stay bounded); a
  ``max_cluster`` cap (smallest-ids kept, extras marked ``capped`` and
  conservatively retained) guards the degenerate all-identical corpus,
  per the repo's deterministic hot-bucket rule (functions/dedup.py).

Reference analog: the per-page classifier pool shape
(/root/reference/pero_ocr/document_ocr/page_parser.py:302-335) — bounded
model state broadcast to every worker, per-record scoring streamed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from pero_ocr_ray.kernels import kmeans as K

_ASSIGN_SCHEMA = pa.schema([
    ("vec_id", pa.int64()), ("cluster_id", pa.int64()),
    ("dist2_q", pa.int64()),
])

_SEM_SCHEMA = pa.schema([
    ("vec_id", pa.int64()), ("cluster_id", pa.int64()),
    ("kept", pa.bool_()), ("dropped_by", pa.int64()),
    ("capped", pa.bool_()),
])


def _xq_of(df: pd.DataFrame) -> np.ndarray:
    return K.quantize(np.stack(
        [np.asarray(e, dtype=np.float64) for e in df["embedding"]]))


def _quantized(emb: rd.Dataset) -> rd.Dataset:
    """(vec_id, embedding list<float>) -> (vec_id, xq list<int64>)."""
    def fn(df: pd.DataFrame) -> pa.Table:
        xq = _xq_of(df)
        return pa.table({
            "vec_id": pa.array(df["vec_id"].to_numpy("int64"), pa.int64()),
            "xq": pa.array(list(xq), pa.list_(pa.int64())),
        })
    return emb.map_batches(fn, batch_format="pandas")


def _init_centroids(q: rd.Dataset, k: int) -> np.ndarray:
    """Embeddings of the k smallest vec_ids — distributed min-k."""
    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("vec_id").head(k)

    rows = (q.map_batches(local, batch_format="pandas")
             .repartition(1)
             .map_batches(local, batch_format="pandas", batch_size=None)
             .take_all())  # bounded: <= k rows
    rows.sort(key=lambda r: r["vec_id"])
    return np.stack([np.asarray(r["xq"], dtype=np.int64) for r in rows])


def kmeans_centroids(emb: rd.Dataset, k: int = 8,
                     iters: int = 4) -> tuple[np.ndarray, rd.Dataset]:
    """-> (int64 centroids [k, d], the materialized quantized corpus)."""
    q = _quantized(emb).materialize()
    cq = _init_centroids(q, k)

    sum_cols = None
    for _ in range(iters):
        ref = ray.put(cq)

        def partial(df: pd.DataFrame) -> pa.Table:
            c = ray.get(ref)
            xq = np.stack([np.asarray(e, dtype=np.int64)
                           for e in df["xq"]])
            labels, _ = K.assign_q(xq, c)
            counts, sums = K.partial_sums_q(xq, labels, c.shape[0])
            cols = {"cluster": pa.array(np.arange(c.shape[0],
                                                  dtype=np.int64)),
                    "n": pa.array(counts)}
            for d in range(sums.shape[1]):
                cols[f"s{d:03d}"] = pa.array(sums[:, d])
            return pa.table(cols)

        if sum_cols is None:
            sum_cols = [f"s{d:03d}" for d in range(cq.shape[1])]
        agg = (q.map_batches(partial, batch_format="pandas")
               .groupby("cluster")
               .aggregate(Sum("n", alias_name="n"),
                          *[Sum(c, alias_name=c) for c in sum_cols]))
        rows = agg.take_all()  # bounded: k rows
        counts = np.zeros(cq.shape[0], dtype=np.int64)
        sums = np.zeros_like(cq)
        for r in rows:
            j = int(r["cluster"])
            counts[j] = int(r["n"])
            sums[j] = [int(r[c]) for c in sum_cols]
        cq = K.centroids_from_sums(sums, counts, cq)
    return cq, q


def kmeans_clusters(emb: rd.Dataset, k: int = 8,
                    iters: int = 4) -> rd.Dataset:
    """-> (vec_id, cluster_id, dist2_q): exact Lloyd assignment after
    ``iters`` integer k-means steps."""
    cq, q = kmeans_centroids(emb, k, iters)
    ref = ray.put(cq)

    def assign(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _ASSIGN_SCHEMA.empty_table()
        xq = np.stack([np.asarray(e, dtype=np.int64) for e in df["xq"]])
        labels, dist2 = K.assign_q(xq, ray.get(ref))
        return pa.table({
            "vec_id": pa.array(df["vec_id"].to_numpy("int64"), pa.int64()),
            "cluster_id": pa.array(labels, pa.int64()),
            "dist2_q": pa.array(dist2, pa.int64()),
        })

    return q.map_batches(assign, batch_format="pandas")


def semantic_dedup(emb: rd.Dataset, k: int = 8, iters: int = 4,
                   threshold_e6: int = 950_000,
                   max_cluster: int = 4096) -> rd.Dataset:
    """SemDeDup -> (vec_id, cluster_id, kept, dropped_by, capped):
    greedy within-cluster cosine dedup after exact k-means. ``capped``
    rows exceeded ``max_cluster`` and were conservatively kept."""
    cq, q = kmeans_centroids(emb, k, iters)
    ref = ray.put(cq)

    def assign(df: pd.DataFrame) -> pa.Table:
        xq = np.stack([np.asarray(e, dtype=np.int64) for e in df["xq"]])
        labels, _ = K.assign_q(xq, ray.get(ref))
        return pa.table({
            "vec_id": pa.array(df["vec_id"].to_numpy("int64"), pa.int64()),
            "cluster_id": pa.array(labels, pa.int64()),
            "xq": df["xq"].to_list(),
        })

    assigned = q.map_batches(assign, batch_format="pandas")

    def group_fn(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("vec_id", kind="mergesort")
        head = g.head(max_cluster)
        ids = head["vec_id"].to_numpy("int64")
        xq = np.stack([np.asarray(e, dtype=np.int64) for e in head["xq"]])
        kept, dropped_by = K.semdedup_group(ids, xq, threshold_e6)
        n_over = len(g) - len(head)
        return pa.table({
            "vec_id": pa.array(np.concatenate(
                [ids, g["vec_id"].to_numpy("int64")[max_cluster:]]),
                pa.int64()),
            "cluster_id": pa.array(g["cluster_id"].to_numpy("int64"),
                                   pa.int64()),
            "kept": pa.array(np.concatenate(
                [kept, np.ones(n_over, dtype=bool)]), pa.bool_()),
            "dropped_by": pa.array(np.concatenate(
                [dropped_by, np.full(n_over, -1, dtype=np.int64)]),
                pa.int64()),
            "capped": pa.array(np.concatenate(
                [np.zeros(len(head), dtype=bool),
                 np.ones(n_over, dtype=bool)]), pa.bool_()),
        })

    return (assigned.groupby("cluster_id")
            .map_groups(group_fn, batch_format="pandas"))
