"""Exact fixed-point k-means + SemDeDup: kernel semantics and
distributed == sequential equality."""

import numpy as np
import ray.data as rd

from pero_ocr_ray.kernels import kmeans as K
from pero_ocr_ray.functions.clustering import kmeans_clusters, semantic_dedup
from pero_ocr_ray.util import dataset_to_table


def test_assign_tie_breaks_to_smaller_cluster():
    cq = K.quantize(np.array([[1.0, 0.0], [-1.0, 0.0]]))
    labels, dist2 = K.assign_q(K.quantize(np.array([[0.0, 0.0]])), cq)
    assert labels[0] == 0  # equidistant -> smaller index
    assert dist2[0] == K.SCALE ** 2


def test_empty_cluster_keeps_previous_centroid():
    prev = np.array([[5, 5], [7, 7]], dtype=np.int64)
    sums = np.array([[10, 10], [0, 0]], dtype=np.int64)
    counts = np.array([2, 0], dtype=np.int64)
    out = K.centroids_from_sums(sums, counts, prev)
    assert out.tolist() == [[5, 5], [7, 7]]


def test_semdedup_greedy_chain():
    # a ~ b and b ~ c, but a !~ c: b drops (by a), c is KEPT because its
    # only similar neighbor b was already dropped (greedy vs transitive).
    a = np.array([1.0, 0.0])
    b = np.array([np.cos(0.2), np.sin(0.2)])     # cos(a,b) ~ .980
    c = np.array([np.cos(0.4), np.sin(0.4)])     # cos(b,c) ~ .980, a,c .921
    xq = K.quantize(np.stack([a, b, c]))
    ids = np.array([10, 20, 30], dtype=np.int64)
    kept, dropped_by = K.semdedup_group(ids, xq, threshold_e6=950_000)
    assert kept.tolist() == [True, False, True]
    assert dropped_by.tolist() == [-1, 10, -1]


def _synthetic_emb(n=120, d=8, seed_free_spread=7):
    # deterministic, RNG-free: unit vectors fanned by index arithmetic
    rows = []
    for i in range(n):
        v = np.zeros(d)
        v[i % d] = 1.0
        v[(i * seed_free_spread) % d] += 0.5 * ((i % 3) - 1)
        v = v / np.linalg.norm(v)
        rows.append({"vec_id": i, "embedding": v.tolist()})
    return rows


def test_distributed_kmeans_equals_sequential():
    rows = _synthetic_emb()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    xq = K.quantize(np.stack([r["embedding"] for r in rows]))
    cq = K.kmeans_fit_q(xq, ids, k=4, iters=3)
    labels, dist2 = K.assign_q(xq, cq)

    out = (dataset_to_table(kmeans_clusters(
               rd.from_items(rows).repartition(5), k=4, iters=3))
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert out["cluster_id"].tolist() == labels.tolist()
    assert out["dist2_q"].tolist() == dist2.tolist()


def test_semantic_dedup_drops_duplicates_distributed():
    rows = _synthetic_emb(60)
    # plant near-duplicates of row 0 and row 1 with larger ids
    rows.append({"vec_id": 1000, "embedding": rows[0]["embedding"]})
    rows.append({"vec_id": 1001, "embedding": rows[1]["embedding"]})
    out = (dataset_to_table(semantic_dedup(
               rd.from_items(rows).repartition(4), k=4, iters=2))
           .to_pandas().set_index("vec_id"))
    assert not out.loc[1000, "kept"]
    assert out.loc[1000, "dropped_by"] == 0
    assert not out.loc[1001, "kept"]
    assert out.loc[1001, "dropped_by"] == 1
    assert not out["capped"].any()
    # every drop points at a kept smaller id in the same cluster
    d = out[~out["kept"]]
    for vid, row in d.iterrows():
        keeper = out.loc[row["dropped_by"]]
        assert keeper["kept"] and row["dropped_by"] < vid
        assert keeper["cluster_id"] == row["cluster_id"]


def test_semdedup_cap_marks_overflow():
    # constant vectors: one hot cluster; cap at 8 -> extras conservatively
    # kept + flagged
    rows = [{"vec_id": i, "embedding": [1.0, 0.0]} for i in range(20)]
    out = (dataset_to_table(semantic_dedup(
               rd.from_items(rows), k=2, iters=1, max_cluster=8))
           .to_pandas().sort_values("vec_id"))
    head = out.head(8)
    assert head["kept"].tolist() == [True] + [False] * 7
    tail = out.tail(12)
    assert tail["capped"].all() and tail["kept"].all()
