"""Similarity search over an ``embeddings`` table (vec_id, embedding, label).

Brute-force cosine top-k as the exact baseline: the (small) query matrix is
broadcast once via ``ray.put`` and read in each map task; every batch does
one float64 matmul against it and emits batch-local top-k candidates; a
final per-query group picks the global top-k. The corpus is streamed, never
materialized.

Scale path: LSH-bucketed variant — random-hyperplane signatures bucket the
corpus (one shuffle), queries probe only their bucket (+ optional
multiprobe), turning the scan into a partition-local search.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd


def _as_matrix(embeddings) -> np.ndarray:
    return np.array([np.asarray(e, dtype=np.float64) for e in embeddings])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_cosine(ds: rd.Dataset, queries: np.ndarray, query_ids: list[int],
               top_k: int = 10, exclude_self: bool = True) -> rd.Dataset:
    """-> (query_id, neighbor_id, rank) for the top_k cosine neighbors of
    each query vector. Ranks 1-based; ties broken by neighbor_id ascending
    (deterministic)."""
    qn = _normalize(_as_matrix(queries))
    q_ref = ray.put((qn, np.asarray(query_ids, dtype=np.int64)))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qm, qids = ray.get(q_ref)
        x = _normalize(_as_matrix(df["embedding"].tolist()))
        vec_ids = df["vec_id"].to_numpy(dtype=np.int64)
        sims = x @ qm.T  # (batch, nq)
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi in range(qm.shape[0]):
            col = sims[:, qi]
            mask = np.ones(len(vec_ids), dtype=bool)
            if exclude_self:
                mask &= vec_ids != qids[qi]
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            take = min(top_k, len(idx))
            # batch-local top-k candidates (exact; final stage re-ranks)
            part = idx[np.argpartition(-col[idx], take - 1)[:take]]
            out["query_id"].extend([int(qids[qi])] * len(part))
            out["neighbor_id"].extend(vec_ids[part].tolist())
            out["sim"].extend(col[part].tolist())
        return pd.DataFrame({k: pd.Series(v, dtype="float64" if k == "sim" else "int64")
                             for k, v in out.items()})

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"],
                              ascending=[False, True]).head(top_k)
        g = g.reset_index(drop=True)
        return pd.DataFrame({
            "query_id": g["query_id"].astype("int64"),
            "neighbor_id": g["neighbor_id"].astype("int64"),
            "rank": pd.Series(range(1, len(g) + 1), dtype="int64"),
        })

    cand = ds.map_batches(local_topk, batch_format="pandas")
    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def knn_self_queries(ds: rd.Dataset, n_queries: int = 5,
                     top_k: int = 10) -> rd.Dataset:
    """Convenience: use vec_id < n_queries rows of the corpus as queries."""
    import pyarrow.compute as _pc
    head = (ds.map_batches(lambda t: t.filter(_pc.less(t["vec_id"], n_queries)),
                           batch_format="pyarrow")
              .take_all())  # tiny: n_queries rows
    head.sort(key=lambda r: r["vec_id"])
    queries = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in head])
    qids = [int(r["vec_id"]) for r in head]
    return knn_cosine(ds, queries, qids, top_k=top_k)


# -- IVF variant (scale path) ----------------------------------------------


def _kmeans(sample: np.ndarray, k: int, iters: int = 10,
            seed: int = 11) -> np.ndarray:
    """Tiny deterministic k-means (seeded init, fixed iterations)."""
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=min(k, len(sample)),
                                  replace=False)]
    for _ in range(iters):
        assign = np.argmax(_normalize(sample) @ _normalize(centroids).T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_knn(ds: rd.Dataset, queries: np.ndarray, query_ids: list[int],
            top_k: int = 10, n_lists: int = 16, n_probe: int = 4,
            sample_size: int = 2048, exclude_self: bool = True) -> rd.Dataset:
    """Approximate top-k: IVF with a driver-trained coarse quantizer.

    Train centroids on a bounded sample (one small take), broadcast them,
    assign every corpus vector to its nearest list inside ``map_batches``,
    and score a batch row only when its list is among the query's ``n_probe``
    closest lists — the scan shrinks by ~n_probe/n_lists while recall stays
    high for clustered data. Exact same output schema as :func:`knn_cosine`.
    """
    sample_rows = ds.limit(sample_size).take_all()
    sample = _as_matrix([r["embedding"] for r in sample_rows])
    centroids = _normalize(_kmeans(sample, n_lists))
    qn = _normalize(_as_matrix(queries))
    probe = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    state = ray.put((qn, np.asarray(query_ids, dtype=np.int64),
                     centroids, probe))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qm, qids, cents, probes = ray.get(state)
        x = _normalize(_as_matrix(df["embedding"].tolist()))
        vec_ids = df["vec_id"].to_numpy(dtype=np.int64)
        lists = np.argmax(x @ cents.T, axis=1)
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi in range(qm.shape[0]):
            mask = np.isin(lists, probes[qi])
            if exclude_self:
                mask &= vec_ids != qids[qi]
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            col = x[idx] @ qm[qi]
            take = min(top_k, len(idx))
            # total order (sim desc, neighbor_id asc) for the batch-local
            # cut: argpartition breaks sim ties by position, so which of
            # two equal-sim candidates survived the cut depended on block
            # partitioning — the final merge uses this same order, making
            # per-batch top-k + merge partitioning-invariant (and equal to
            # a single-pass sequential run, which the golden fixture is)
            part = np.lexsort((vec_ids[idx], -col))[:take]
            out["query_id"].extend([int(qids[qi])] * take)
            out["neighbor_id"].extend(vec_ids[idx[part]].tolist())
            out["sim"].extend(col[part].tolist())
        return pd.DataFrame({k: pd.Series(v, dtype="float64" if k == "sim" else "int64")
                             for k, v in out.items()})

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"],
                              ascending=[False, True]).head(top_k)
        g = g.reset_index(drop=True)
        return pd.DataFrame({
            "query_id": g["query_id"].astype("int64"),
            "neighbor_id": g["neighbor_id"].astype("int64"),
            "rank": pd.Series(range(1, len(g) + 1), dtype="int64"),
        })

    cand = ds.map_batches(local_topk, batch_format="pandas")
    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")


# -- LSH-bucketed variant (scale path) -------------------------------------

_N_PLANES = 12
_PLANES_CACHE: dict[int, np.ndarray] = {}


def _planes(dim: int) -> np.ndarray:
    if dim not in _PLANES_CACHE:
        _PLANES_CACHE[dim] = np.random.RandomState(7).randn(_N_PLANES, dim)
    return _PLANES_CACHE[dim]


def _bucket_of(m: np.ndarray) -> np.ndarray:
    planes = _planes(m.shape[1])
    bits = (m @ planes.T) > 0
    return (bits @ (1 << np.arange(_N_PLANES))).astype(np.int64)


MAX_BUCKET = 512  # hot-bucket guard: the in-bucket verify is quadratic


def embedding_near_dup_pairs(ds: rd.Dataset, threshold: float = 0.95,
                             ) -> rd.Dataset:
    """Embedding-cosine near-dup: bucket by random-hyperplane signature
    (one shuffle), exact cosine verify within each bucket. Near-identical
    vectors collide with high probability; recall is tunable via _N_PLANES
    (fewer planes = bigger buckets = higher recall, more compute).

    Hot-bucket guard: the verify does an m@m.T inside each bucket, so a
    degenerate bucket (zero/constant embeddings all hashing identically)
    goes quadratic in memory AND compute. Buckets beyond ``MAX_BUCKET``
    rows are truncated to the MAX_BUCKET smallest vec_ids (deterministic —
    same pattern as ``dedup.MAX_BUCKET``); truncation is logged per the
    no-silent-caps rule. The survivors of a that-hot bucket are mutual
    near-dups, so downstream drop/cluster decisions still link them."""
    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_as_matrix(df["embedding"].tolist()))
        return pd.DataFrame({
            "bucket": _bucket_of(m),
            "vec_id": df["vec_id"].astype("int64"),
            "embedding": df["embedding"],
        })

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id")
        if len(g) < 2:
            return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                 "vec_b": pd.Series([], dtype="int64")})
        if len(g) > MAX_BUCKET:
            import logging
            logging.getLogger(__name__).warning(
                "embedding_near_dup bucket %s truncated %d -> %d rows "
                "(MAX_BUCKET hot-bucket cap; keeping smallest vec_ids)",
                g["bucket"].iloc[0], len(g), MAX_BUCKET)
            g = g.head(MAX_BUCKET)
        m = _normalize(_as_matrix(g["embedding"].tolist()))
        ids = g["vec_id"].to_numpy()
        sims = m @ m.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame({"vec_a": ids[ia].astype("int64"),
                             "vec_b": ids[ib].astype("int64")})

    return (ds.map_batches(bucketize, batch_format="pandas")
              .groupby("bucket").map_groups(verify, batch_format="pandas"))
