"""PII redaction and repetition-quality signals for corpus curation.

Two more of the standard web-corpus curation passes (the CCNet /
RedPajama / Gopher toolbox):

* :func:`redact_pii` — replace emails / phone numbers / IPv4 literals
  with typed placeholder tokens and count the replacements. The patterns
  are ASCII-only and lookaround-free so Python re and DuckDB's RE2
  evaluate them identically (the same never-mix rule the tokenizers
  follow); the oracle runs the very same regexp_replace chain.
* :func:`repetition_stats` — Gopher-style repetition signals per doc:
  duplicate-word fraction (1 - distinct/total) and top-bigram fraction
  (most frequent bigram's share). Both are emitted as exact
  integer-fixed-point permille-of-permille (x * 1e6 // total) so the
  hash gate never touches float rounding.

Both are narrow vectorized-ish map stages: no shuffle, stream-safe.
"""

from __future__ import annotations

import re

import pandas as pd

import ray.data as rd

from pero_ocr_ray.kernels.textstats import SHINGLE_RE

# shared verbatim with the SQL oracle (ASCII classes, no lookaround; the
# IP pattern deliberately skips \b — RE2's ASCII \b diverges from Python's
# Unicode \b next to non-ASCII word chars, and cross-engine identity
# matters more here than rejecting digit-adjacent matches)
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?[0-9][0-9() -]{6,}[0-9]"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
)
_COMPILED = [(name, re.compile(pat)) for name, pat in PII_PATTERNS]


def redact_text(text: str) -> tuple[str, dict[str, int]]:
    """-> (redacted text, counts per category). Categories apply in the
    fixed PII_PATTERNS order (emails first, so user@host never half-matches
    as a phone)."""
    counts = {}
    for name, rx in _COMPILED:
        text, n = rx.subn(f"<{name}>", text)
        counts[name] = n
    return text, counts


def redact_pii(ds: rd.Dataset) -> rd.Dataset:
    """-> (doc_id, text, n_emails, n_phones, n_ips) with PII replaced by
    typed placeholders."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        texts, ne, np_, ni = [], [], [], []
        for t in df["text"]:
            red, counts = redact_text(t or "")
            texts.append(red)
            ne.append(counts["email"])
            np_.append(counts["phone"])
            ni.append(counts["ip"])
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "text": texts,
            "n_emails": pd.Series(ne, dtype="int64"),
            "n_phones": pd.Series(np_, dtype="int64"),
            "n_ips": pd.Series(ni, dtype="int64"),
        })
    return ds.map_batches(fn, batch_format="pandas")


def repetition_signals(text: str) -> tuple[int, int]:
    """-> (dup_word_frac_e6, top_bigram_frac_e6) as exact integer
    fixed-point: value * 1_000_000 // denominator (0 for degenerate
    docs). Tokens are the shared lowercase-alnum runs."""
    toks = SHINGLE_RE.findall((text or "").lower())
    n = len(toks)
    if n == 0:
        return 0, 0
    dup_e6 = (n - len(set(toks))) * 1_000_000 // n
    if n < 2:
        return dup_e6, 0
    counts: dict[tuple[str, str], int] = {}
    for a, b in zip(toks, toks[1:]):
        counts[(a, b)] = counts.get((a, b), 0) + 1
    top_e6 = max(counts.values()) * 1_000_000 // (n - 1)
    return dup_e6, top_e6


def repetition_stats(ds: rd.Dataset) -> rd.Dataset:
    """-> (doc_id, dup_word_frac_e6, top_bigram_frac_e6)."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        dups, tops = [], []
        for t in df["text"]:
            d, b = repetition_signals(t)
            dups.append(d)
            tops.append(b)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "dup_word_frac_e6": pd.Series(dups, dtype="int64"),
            "top_bigram_frac_e6": pd.Series(tops, dtype="int64"),
        })
    return ds.map_batches(fn, batch_format="pandas")
