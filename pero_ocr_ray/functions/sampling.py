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
