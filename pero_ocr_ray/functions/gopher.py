"""Gopher-style document quality rules (Rae et al. 2021, "Scaling Language
Models: ... Gopher", appendix A1.1 — public paper).

Per-document integer quality features + a composite pass flag, the standard
webtext pre-filter a training-data pipeline runs before dedup/tokenize.
Pure streaming ``map_batches`` — zero shuffle, scales linearly with the
corpus.

Determinism / oracle contract: every feature is an integer count and every
rule is an integer cross-multiplication (no float ratios), so the DuckDB
mirror (`__ray_entry__.py` ``gopher_quality_filter``) hash-matches exactly.
The regex constants below are written in the RE2-compatible subset (ASCII
classes, no lookaround) and the SAME strings are interpolated into the SQL
— one rule list drives both engines, the ``urlnorm.py`` convention.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray.data as rd

from pero_ocr_ray.kernels import textstats as K

# Tokens: the repo-wide ASCII \S+ convention (kernels/textstats.py TOKEN_RE
# == RE2 '\S+'; RE2's \S is always ASCII). Shared strings, used verbatim in
# the SQL oracle:
ALPHA_RE_STR = r"[A-Za-z]"                       # word contains a letter
SYMBOL_RE_STR = r"#|\.\.\."                      # Gopher "symbols": # and ...
BULLET_RE_STR = r"(?m)^[ \t]*[-*•]"          # line starts with a bullet
ELLIPSIS_LINE_RE_STR = r"(?m)(?:\.\.\.|…)[ \t]*$"  # line ends with ...

# Rule bounds (Gopher A1.1). All enforced with integer arithmetic:
MIN_WORDS, MAX_WORDS = 50, 100_000               # 50 <= n_words <= 100k
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3, 10     # 3 <= mean word len <= 10
MAX_SYMBOL_PERMILLE = 100                        # symbol/word ratio < 0.1
MAX_BULLET_PERMILLE = 900                        # <= 90% bullet lines
MAX_ELLIPSIS_PERMILLE = 300                      # <= 30% ellipsis lines
MIN_ALPHA_PERMILLE = 800                         # >= 80% words have a letter
MIN_STOP_HITS = 2                                # >= 2 stopword hits

_ALPHA_RE = re.compile(ALPHA_RE_STR)
_SYMBOL_RE = re.compile(SYMBOL_RE_STR)
_BULLET_RE = re.compile(BULLET_RE_STR)
_ELLIPSIS_LINE_RE = re.compile(ELLIPSIS_LINE_RE_STR)


def _flags_frame(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) -> integer features + pass flag, vectorized."""
    text = df["text"].fillna("")
    toks = text.str.findall(K.TOKEN_RE)
    n_words = toks.str.len().astype("int64")
    word_chars = toks.str.join("").str.len().astype("int64")
    # words containing a letter: explode (keeps the row index), test, re-sum
    ex = toks.explode()
    has_alpha = ex.str.contains(_ALPHA_RE, na=False)
    n_alpha = (has_alpha.groupby(level=0).sum()
               .reindex(df.index, fill_value=0).astype("int64"))
    n_stop = text.str.lower().str.count(K.STOPWORD_RE).astype("int64")
    n_symbols = text.str.count(_SYMBOL_RE).astype("int64")
    n_lines = pd.Series(
        np.where(text.str.len().to_numpy() > 0,
                 text.str.count("\n").to_numpy() + 1, 0).astype("int64"),
        index=df.index)
    n_bullet = text.str.count(_BULLET_RE).astype("int64")
    n_ell_lines = text.str.count(_ELLIPSIS_LINE_RE).astype("int64")

    # all-integer rule evaluation (cross-multiplied ratios — float-free,
    # so the SQL mirror is exact, not last-ulp-equal)
    ok = ((n_words >= MIN_WORDS) & (n_words <= MAX_WORDS)
          & (MIN_MEAN_WORD_LEN * n_words <= word_chars)
          & (word_chars <= MAX_MEAN_WORD_LEN * n_words)
          & (1000 * n_symbols < MAX_SYMBOL_PERMILLE * n_words)
          & (1000 * n_bullet <= MAX_BULLET_PERMILLE * n_lines)
          & (1000 * n_ell_lines <= MAX_ELLIPSIS_PERMILLE * n_lines)
          & (1000 * n_alpha >= MIN_ALPHA_PERMILLE * n_words)
          & (n_stop >= MIN_STOP_HITS))
    return pd.DataFrame({
        "doc_id": df["doc_id"].astype("int64"),
        "n_words": n_words,
        "word_chars": word_chars,
        "n_alpha_words": n_alpha,
        "n_stop_hits": n_stop,
        "n_symbols": n_symbols,
        "n_lines": n_lines,
        "n_bullet_lines": n_bullet,
        "n_ellipsis_lines": n_ell_lines,
        "pass_gopher": ok.astype("int64"),
    })


def gopher_flags(ds: rd.Dataset) -> rd.Dataset:
    """documents (doc_id, text) -> per-doc Gopher features + ``pass_gopher``.

    Streaming narrow map; at 100 TB this is one pass with no exchange —
    the flag column feeds a plain ``filter`` in a curation chain.
    """
    return ds.map_batches(_flags_frame, batch_format="pandas")


def filter_agreement(ds: rd.Dataset) -> rd.Dataset:
    """-> (keep_doc, pass_gopher, n_docs): the 2x2 agreement matrix
    between the hashed linear classifier's keep decision and the Gopher
    rule verdict — the filter-calibration table every curation pipeline
    inspects before composing filters (high disagreement = one filter is
    doing work the other isn't). ONE fused streaming pass (Gopher flags
    computed per batch, then the classifier pool with the flag carried)
    plus a <=4-key combiner groupby; zero corpus-scale shuffle."""
    import pyarrow as pa
    from ray.data.aggregate import Sum
    from pero_ocr_ray.functions.classifier import classify_docs

    def add_pass(df: pd.DataFrame) -> pd.DataFrame:
        flags = _flags_frame(df)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64").to_numpy(),
            "text": df["text"].to_numpy(),
            "pass_gopher": flags["pass_gopher"].astype("int64").to_numpy(),
        })

    scored = classify_docs(ds.map_batches(add_pass, batch_format="pandas"),
                           carry_cols=("pass_gopher",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["keep_doc", "pass_gopher"], as_index=False)
             .size().rename(columns={"size": "n_partial"}))
        g["key"] = (g["keep_doc"].astype("int64") * 2
                    + g["pass_gopher"].astype("int64"))
        return g[["key", "n_partial"]]

    agg = (scored.map_batches(partial, batch_format="pandas")
           .groupby("key").aggregate(Sum("n_partial",
                                         alias_name="n_docs")))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        k = df["key"].astype("int64")
        return pd.DataFrame({
            "keep_doc": (k // 2).astype("int64"),
            "pass_gopher": (k % 2).astype("int64"),
            "n_docs": df["n_docs"].astype("int64"),
        })

    return agg.map_batches(finalize, batch_format="pandas")
