"""Text analysis over a ``documents`` table (doc_id, text, ...).

Vectorized pandas string kernels inside ``map_batches``; the language-ID
stage is an actor pool holding precompiled profiles (the reference's
warm-engine shape, /root/reference/pero_ocr/document_ocr/page_parser.py:302-335
LineFilter analog — a lightweight per-record classifier with loaded state).
"""

from __future__ import annotations

import hashlib

import pandas as pd

import ray.data as rd

from pero_ocr_ray.kernels import textstats as K


def token_counts(ds: rd.Dataset) -> rd.Dataset:
    """-> (doc_id, n_tokens). Vectorized regex count per batch."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": df["text"].str.count(K.TOKEN_RE).astype("int64"),
        })
    return ds.map_batches(fn, batch_format="pandas")


def quality_scores(ds: rd.Dataset) -> rd.Dataset:
    """-> integer quality features per doc (SQL-checkable)."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"]
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_chars": text.str.len().astype("int64"),
            "n_tokens": text.str.count(K.TOKEN_RE).astype("int64"),
            "n_stopwords": text.str.lower().str.count(K.STOPWORD_RE).astype("int64"),
            "n_punct": text.str.count(K.PUNCT_RE).astype("int64"),
        })
    return ds.map_batches(fn, batch_format="pandas")


class LangIdStage:
    """Actor-pool language identifier (profiles compiled once per actor)."""

    def __init__(self):
        self.profiles = {code: frozenset(words)
                         for code, words in K.LANG_PROFILES.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "lang_pred": [K.lang_id(t) for t in df["text"]],
        })


def lang_ids(ds: rd.Dataset, concurrency: int = 2) -> rd.Dataset:
    return ds.map_batches(LangIdStage, batch_format="pandas",
                          concurrency=concurrency)


def content_hashes(ds: rd.Dataset) -> rd.Dataset:
    """-> (doc_id, content_hash) md5 — matches DuckDB ``md5(text)``."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "content_hash": [hashlib.md5(t.encode("utf-8")).hexdigest()
                             for t in df["text"]],
        })
    return ds.map_batches(fn, batch_format="pandas")


def approx_distinct(ds: rd.Dataset, column: str,
                    tokenize: bool = False) -> dict:
    """HLL approximate distinct count of ``column`` (or of its whitespace
    tokens when ``tokenize``). One 4 KB sketch per batch, merged in a tiny
    driver-side fold — no shuffle of raw values at any scale."""
    from pero_ocr_ray.kernels import hll

    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        sk = hll.empty_sketch()
        if tokenize:
            for text in df[column]:
                hll.add_many(sk, K.TOKEN_RE.findall(text))
        else:
            hll.add_many(sk, (str(v) for v in df[column]))
        return pd.DataFrame({"sketch": [hll.serialize(sk)]})

    merged = hll.empty_sketch()
    sketches = ds.map_batches(sketch_batch, batch_format="pandas").take_all()
    for row in sketches:
        merged = hll.merge(merged, hll.deserialize(row["sketch"]))
    return {"estimate": hll.estimate(merged), "sketches_merged": len(sketches)}


def fingerprints(ds: rd.Dataset) -> rd.Dataset:
    """-> (doc_id, fingerprint) rolling-hash document fingerprint."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "fingerprint": [K.rolling_fingerprint(t) for t in df["text"]],
        })
    return ds.map_batches(fn, batch_format="pandas")
