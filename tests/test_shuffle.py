"""Deterministic global shuffle: permutation, determinism, seed effect."""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data as rd

from pero_ocr_ray.functions.shuffle import global_shuffle_positions


def _ids(n: int) -> rd.Dataset:
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
    })).repartition(5)


def test_positions_are_a_permutation_matching_sequential_order():
    n = 97
    got = {r["doc_id"]: r["pos"]
           for r in global_shuffle_positions(_ids(n), seed=7).take_all()}
    order = sorted(range(n),
                   key=lambda i: (hashlib.md5(f"shuffle7:{i}".encode())
                                  .hexdigest(), i))
    want = {doc: pos for pos, doc in enumerate(order)}
    assert got == want


def test_partitioning_invariant_and_seed_changes_order():
    a = {r["doc_id"]: r["pos"] for r in
         global_shuffle_positions(_ids(50).repartition(2),
                                  seed=1).take_all()}
    b = {r["doc_id"]: r["pos"] for r in
         global_shuffle_positions(_ids(50).repartition(9),
                                  seed=1).take_all()}
    c = {r["doc_id"]: r["pos"] for r in
         global_shuffle_positions(_ids(50), seed=2).take_all()}
    assert a == b
    assert a != c
    assert sorted(c.values()) == list(range(50))
