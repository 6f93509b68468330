"""Bloom-filter url seen-set — crawler frontier dedup at corpus scale.

A recrawl frontier asks "have we already fetched this url?" for billions
of candidates; shipping the full url set to every worker is impossible,
and an exact semi-join re-shuffles the candidate stream against the whole
crawl history. The classic answer is a Bloom filter: no false negatives,
tunable false positives, and — like the HLL sketch in ``kernels/hll.py``
— cheap to merge and broadcast.

Determinism (both engines replay the SAME bits, so even false positives
hash-match): position j of a url is the j-th 32-bit big-endian slice of
``md5(url)`` mod ``m`` (k <= 4 slices from one digest; the repo-wide md5
convention). The build is the bounded-histogram combiner shape: each
batch emits its DISTINCT bit positions (state <= m per batch, NOT
corpus-sized), one groupby dedups globally (<= m rows cross the
shuffle), and the driver packs <= m ints into a numpy bitmap that
broadcasts via ``ray.put``. The probe is a zero-shuffle streaming map.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

M_BITS_DEFAULT = 1 << 20
K_HASHES = 4


def url_positions(url: str, m_bits: int) -> list[int]:
    """The K_HASHES bit positions of one url (shared reference kernel)."""
    h = hashlib.md5((url or "").encode()).hexdigest()
    return [int(h[8 * j: 8 * j + 8], 16) % m_bits for j in range(K_HASHES)]


def build_seen_bitmap(corpus: rd.Dataset, url_col: str = "url",
                      m_bits: int = M_BITS_DEFAULT) -> np.ndarray:
    """corpus -> packed uint8 bitmap (m_bits/8 bytes) of its url set."""

    def partial(df: pd.DataFrame) -> pa.Table:
        seen: set[int] = set()
        for u in df[url_col]:
            seen.update(url_positions(u, m_bits))
        return pa.table({"p": pa.array(sorted(seen), pa.int64())})

    from ray.data.aggregate import Count
    dist = (corpus.map_batches(partial, batch_format="pandas")
            .groupby("p").aggregate(Count()))  # distinct pos: <= m rows

    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    for batch in dist.iter_batches(batch_format="pyarrow"):
        ps = batch.column("p").to_numpy(zero_copy_only=False)
        np.bitwise_or.at(bitmap, ps // 8,
                         np.left_shift(1, (ps % 8)).astype(np.uint8))
    return bitmap


def probe_seen(candidates: rd.Dataset, bitmap: np.ndarray,
               url_col: str = "url",
               m_bits: int = M_BITS_DEFAULT) -> rd.Dataset:
    """-> candidates + ``maybe_seen:int64`` (1 = all k bits set; never 0
    for a url that IS in the build corpus). Zero-shuffle map; the bitmap
    is broadcast once."""
    ref = ray.put(bitmap)

    def fn(t: pa.Table) -> pa.Table:
        bm = ray.get(ref)
        flags = []
        for u in t.column(url_col).to_pylist():
            ps = url_positions(u, m_bits)
            flags.append(int(all(bm[p // 8] & (1 << (p % 8)) for p in ps)))
        return t.append_column("maybe_seen", pa.array(flags, pa.int64()))

    return candidates.map_batches(fn, batch_format="pyarrow")


def url_seen_probe(corpus: rd.Dataset, candidates: rd.Dataset,
                   url_col: str = "url",
                   m_bits: int = M_BITS_DEFAULT) -> rd.Dataset:
    """Build over ``corpus``, probe ``candidates`` (the composed op)."""
    return probe_seen(candidates, build_seen_bitmap(corpus, url_col, m_bits),
                      url_col, m_bits)
