"""Composed training-data curation pipeline.

The end-to-end shape a 100 TB LLM-data run takes, as ONE streaming Dataset
chain (each stage is the already-tested operator):

    documents
      └─ exact dedup (md5 groupby, keep min doc_id)            # shuffle 1
      └─ quality filter (vectorized token/stopword features)    # narrow
      └─ per-lang corpus stats (partial agg + tiny groupby)     # shuffle 2

Every step is SQL-expressible, so the whole composition is value-hash
checked against a single DuckDB query (the `training_corpus_stats`
oracle) — composition correctness, not just per-operator correctness.
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd
from ray.data.aggregate import Sum

from pero_ocr_ray.functions.dedup import exact_dedup
from pero_ocr_ray.kernels import textstats as K


def curate(documents: rd.Dataset, min_tokens: int = 20,
           max_stopword_ratio: float = 0.5) -> rd.Dataset:
    """documents (doc_id, text, lang) -> curated survivor rows."""
    deduped = exact_dedup(documents)

    def quality_filter(df: pd.DataFrame) -> pd.DataFrame:
        n_tokens = df["text"].str.count(K.TOKEN_RE)
        n_stop = df["text"].str.lower().str.count(K.STOPWORD_RE)
        keep = (n_tokens >= min_tokens) & \
               (n_stop <= max_stopword_ratio * n_tokens)
        out = df.loc[keep].copy()
        out["n_tokens"] = n_tokens[keep].astype("int64")
        return out

    return deduped.map_batches(quality_filter, batch_format="pandas")


def corpus_stats(curated: rd.Dataset) -> rd.Dataset:
    """-> (lang, n_docs, sum_tokens) per language over the curated set."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("lang", as_index=False)
               .agg(n_partial=("doc_id", "size"),
                    tok_partial=("n_tokens", "sum")))
        return g

    agg = (curated.map_batches(partial, batch_format="pandas")
           .groupby("lang").aggregate(Sum("n_partial", alias_name="n_docs"),
                                      Sum("tok_partial",
                                          alias_name="sum_tokens")))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": df["lang"],
            "n_docs": df["n_docs"].astype("int64"),
            "sum_tokens": df["sum_tokens"].astype("int64"),
        })

    return agg.map_batches(finalize, batch_format="pandas")


def training_corpus_stats(documents: rd.Dataset, min_tokens: int = 20,
                          max_stopword_ratio: float = 0.5) -> rd.Dataset:
    return corpus_stats(curate(documents, min_tokens, max_stopword_ratio))
