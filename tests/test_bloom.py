"""Bloom url seen-set: no false negatives, exact bit replay, merge shape."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from pero_ocr_ray.functions.bloom import (
    build_seen_bitmap, probe_seen, url_positions, url_seen_probe,
)


def _ds(urls: list[str]) -> rd.Dataset:
    return rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())})
                         ).repartition(3)


def test_no_false_negatives_and_bit_exact_probe():
    corpus = [f"https://h{i % 5}.example/p/{i}" for i in range(200)]
    absent = [f"https://other{i}.example/q" for i in range(50)]
    bitmap = build_seen_bitmap(_ds(corpus), m_bits=1 << 16)
    got = {r["url"]: r["maybe_seen"]
           for r in probe_seen(_ds(corpus + absent), bitmap,
                               m_bits=1 << 16).take_all()}
    assert all(got[u] == 1 for u in corpus)  # guaranteed
    # exact replay: a probe is positive iff all its positions are in the
    # corpus position set (false positives included, deterministically)
    pos = set()
    for u in corpus:
        pos.update(url_positions(u, 1 << 16))
    for u in absent:
        want = int(all(p in pos for p in url_positions(u, 1 << 16)))
        assert got[u] == want


def test_composed_probe_and_partitioning_invariance():
    corpus = [f"https://c{i}.example/{i}" for i in range(60)]
    cands = corpus[:10] + [f"https://n{i}.example/" for i in range(10)]
    a = {r["url"]: r["maybe_seen"] for r in
         url_seen_probe(_ds(corpus), _ds(cands)).take_all()}
    b = {r["url"]: r["maybe_seen"] for r in
         url_seen_probe(_ds(corpus).repartition(7),
                        _ds(cands).repartition(2)).take_all()}
    assert a == b
    assert all(a[u] == 1 for u in corpus[:10])
