"""HyperLogLog sketch: mergeable approximate distinct counting.

The reference has no sketches (SURVEY §2.5); at 10^12 documents an exact
count-distinct is an all-to-all shuffle, so the engine ships a mergeable
sketch: one HLL per batch inside ``map_batches``, elementwise-max merge in a
tiny final step — the canonical partial+final shape with O(4 KB) shuffle
traffic total.

Deterministic: hashing is md5-high-64 (process-independent, and the same
``('0x' || substr(md5(v), 1, 16))::UBIGINT`` convention the other kernels
use so a DuckDB oracle can rebuild the registers from scratch), no
sampling. Standard 64-bit HLL with linear-counting small-range correction.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

P = 12                      # 2^12 registers = 4096 bytes per sketch
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def empty_sketch() -> np.ndarray:
    return np.zeros(M, dtype=np.uint8)


def _hash64(value: str | bytes) -> int:
    if isinstance(value, str):
        value = value.encode("utf-8")
    return int(hashlib.md5(value).hexdigest()[:16], 16)


def add(sketch: np.ndarray, value: str | bytes) -> None:
    h = _hash64(value)
    idx = h >> (64 - P)
    w = h & ((1 << (64 - P)) - 1)
    rank = (64 - P) - w.bit_length() + 1
    if rank > sketch[idx]:
        sketch[idx] = rank


def add_many(sketch: np.ndarray, values) -> np.ndarray:
    for v in values:
        add(sketch, v)
    return sketch


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(sketch: np.ndarray) -> int:
    est = _ALPHA * M * M / float(np.sum(np.exp2(-sketch.astype(np.float64))))
    if est <= 2.5 * M:
        zeros = int(np.count_nonzero(sketch == 0))
        if zeros:
            est = M * math.log(M / zeros)  # linear counting
    # floor, not round(): Python round() is banker's while the DuckDB
    # oracle's round() is half-away-from-zero, and the two sides also sum
    # the register series in different orders — floor on BOTH sides is the
    # repo's integer-emission convention for float-derived gate values
    return int(math.floor(est))


def serialize(sketch: np.ndarray) -> bytes:
    return sketch.tobytes()


def deserialize(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).copy()
