"""Per-language token-budget cut — a distributed prefix sum (scan).

Data-mixing recipes cap each language/source at a token budget ("200 B
tokens of English, 50 B of code, ..."). The exact semantics are a running
total: keep documents in deterministic priority order (ascending doc_id)
while the language's cumulative token count stays within budget — SQL's
``SUM(...) OVER (PARTITION BY lang ORDER BY doc_id)``.

Ray Data has no scan operator, so this composes one from primitives:

1. ``sort(["lang", "doc_id"])`` range-partitions the corpus into globally
   ordered blocks, materialized ONCE so the two passes below see the SAME
   deterministic blocking;
2. pass 1 streams per-block *run summaries* — one row per (lang-run within
   a block): the run's first doc_id and token sum. That is at most
   blocks x languages-per-block rows, bounded by cluster metadata scale,
   so the driver can fetch it, order it, and turn it into per-run PRIOR
   offsets (the classic scan up-sweep);
3. pass 2 re-streams the same blocks: each run looks up its prior offset
   by its (lang, first doc_id) key — both deterministic because the
   blocking is frozen — adds a block-local cumsum, and keeps rows whose
   inclusive running total fits the budget.

No stage ever holds a language's rows in one place: the sort spreads them
across range partitions and the scan state that crosses the driver is one
row per block-run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from pero_ocr_ray.kernels.textstats import TOKEN_RE


def _runs(langs: np.ndarray) -> list[tuple[int, int]]:
    """[start, end) spans of equal-lang runs in a sorted lang array."""
    if langs.size == 0:
        return []
    changes = np.nonzero(langs[1:] != langs[:-1])[0] + 1
    starts = np.concatenate(([0], changes))
    ends = np.concatenate((changes, [langs.size]))
    return list(zip(starts.tolist(), ends.tolist()))


def token_budget_cut(docs: rd.Dataset,
                     budgets_tokens: dict[str, int] | None = None,
                     default_budget: int = 1_000_000_000) -> rd.Dataset:
    """-> (doc_id, lang, n_tokens): docs kept in ascending doc_id per lang
    while the INCLUSIVE running token total stays <= the lang's budget."""
    budgets = budgets_tokens or {}

    def feat(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "lang": df["lang"],
            "n_tokens": df["text"].str.count(TOKEN_RE).astype("int64"),
        })

    sorted_ds = (docs.map_batches(feat, batch_format="pandas")
                 .sort(["lang", "doc_id"]).materialize())

    def run_summaries(t: pa.Table) -> pa.Table:
        langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        toks = t.column("n_tokens").to_numpy(zero_copy_only=False)
        ls, fs, ss = [], [], []
        for a, b in _runs(langs):
            ls.append(langs[a])
            fs.append(int(ids[a]))
            ss.append(int(toks[a:b].sum()))
        return pa.table({"lang": pa.array(ls, pa.string()),
                         "first_doc_id": pa.array(fs, pa.int64()),
                         "run_sum": pa.array(ss, pa.int64())})

    summ = (sorted_ds.map_batches(run_summaries, batch_format="pyarrow",
                                  batch_size=None)
            .to_pandas())  # <= blocks x langs rows: scan metadata, tiny
    summ = summ.sort_values(["lang", "first_doc_id"], ignore_index=True)
    prior = (summ.groupby("lang", sort=False)["run_sum"]
             .cumsum() - summ["run_sum"])
    offsets = {(l, int(f)): int(p) for l, f, p in
               zip(summ["lang"], summ["first_doc_id"], prior)}
    ref = ray.put(offsets)

    def cut(t: pa.Table) -> pa.Table:
        offs = ray.get(ref)
        langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        toks = t.column("n_tokens").to_numpy(zero_copy_only=False)
        keep = np.zeros(len(langs), dtype=bool)
        for a, b in _runs(langs):
            lang = langs[a]
            cum = offs[(lang, int(ids[a]))] + np.cumsum(toks[a:b])
            keep[a:b] = cum <= budgets.get(lang, default_budget)
        return t.filter(pa.array(keep))

    return sorted_ds.map_batches(cut, batch_format="pyarrow",
                                 batch_size=None)
