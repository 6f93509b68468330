"""Byte-pair-encoding subword kernel: trainer + canonical encoder.

Closes the round-4 "BPE-ish pretokens only" realism gap (VERDICT item 8):
``doc_subword_counts`` budgets by a GPT-2-style pretoken REGEX; real token
budgets come from a merges-table BPE tokenizer. This module provides

* :func:`train_bpe` — the classic Sennrich/GPT-2 trainer: repeatedly merge
  the most frequent adjacent symbol pair. Deterministic: ties break on the
  lexicographically SMALLEST pair, word iteration is sorted. Pure Python —
  corpus-scale training needs only a (word, count) table, which is a tiny
  combiner groupby upstream (words, not documents, drive the trainer).
* :func:`bpe_encode` — the canonical encoder (lowest-rank mergeable pair
  first, all its occurrences merged left-to-right non-overlapping — the
  GPT-2 ``bpe()`` loop, reimplemented from the published algorithm).
* :data:`FIXTURE_MERGES` — a merges table trained at import time on a
  fixed embedded word-count list (the synthetic corpus vocabulary), so the
  ``doc_bpe_counts`` gate query is parameter-free and its DuckDB oracle can
  inline the same table (data shared, logic independent — the urlnorm
  "one rule list drives kernel and SQL" pattern).

SQL-replayability theorem (why the oracle is exact): for any merges table
produced by BPE TRAINING, a pair's parts are created by strictly
lower-ranked merges — so when merges are applied EXHAUSTIVELY IN RANK
ORDER, every potential occurrence of pair k exists by the time k is
processed, and merging k only enables pairs of rank > k. Hence
rank-sequential exhaustive application == canonical lowest-rank-first
encoding for EVERY input word (property-tested in tests/test_bpe.py), and
the SQL side can replay encoding as an unrolled chain of string
``replace('<sp>a b<sp>', '<sp>ab<sp>')`` passes — no recursion needed.
Adjacent occurrences sharing a separator need extra passes (``'abab'``):
``_PASSES_SQL`` passes cover runs up to 2^passes repetitions.
"""

from __future__ import annotations

import functools

# exhaustive-replace passes the SQL replay unrolls per merge: pass p merges
# alternating occurrences, so runs of up to 2^p adjacent repeats converge;
# 8 covers any alnum pretoken up to 256 chars
_PASSES_SQL = 8


def train_bpe(word_counts: dict[str, int],
              n_merges: int) -> list[tuple[str, str]]:
    """(word -> count) -> ordered merges list (rank = position).

    Deterministic: pair selection is (count desc, pair asc); stops early
    when no pair occurs twice."""
    # symbol sequences per distinct word, weighted by count
    seqs: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in sorted(word_counts.items()) if w]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for seq, c in seqs:
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        ab = a + b
        for seq, _ in seqs:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == a and seq[i + 1] == b:
                    seq[i:i + 2] = [ab]
                else:
                    i += 1
    return merges


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Canonical BPE: repeatedly merge all occurrences of the
    lowest-ranked adjacent pair present (left-to-right non-overlapping)."""
    seq = list(word)
    while len(seq) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (seq[i], seq[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        ab = a + b
        out: list[str] = []
        i = 0
        while i < len(seq):
            if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def bpe_encode_sequential(word: str,
                          merges: list[tuple[str, str]]) -> list[str]:
    """Rank-sequential exhaustive application — the shape the SQL oracle
    replays. Equal to :func:`bpe_encode` for trained merges tables (see
    module docstring); exists so the equivalence is testable."""
    seq = list(word)
    for a, b in merges:
        ab = a + b
        out: list[str] = []
        i = 0
        while i < len(seq):
            if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def ranks_of(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(merges)}


# The synthetic documents' vocabulary (TESTDATA.md corpus word stock) with
# round counts — the embedded training set for the fixture tokenizer. The
# exact words matter less than the table being FIXED: both engines encode
# with the same resulting merges.
FIXTURE_WORD_COUNTS = {
    "table": 40, "value": 38, "index": 36, "filter": 34, "merge": 32,
    "query": 30, "shuffle": 28, "column": 26, "batch": 24, "stream": 22,
    "join": 20, "char": 18, "open": 16, "close": 14, "part": 12,
    "block": 10, "schema": 9, "actor": 8, "bucket": 7, "window": 6,
    "the": 50, "and": 45, "data": 44, "rows": 21, "key": 19,
}

N_FIXTURE_MERGES = 20


@functools.lru_cache(maxsize=1)
def fixture_merges() -> tuple[tuple[str, str], ...]:
    """The fixed merges table both engines share (trained once, cached)."""
    return tuple(train_bpe(FIXTURE_WORD_COUNTS, N_FIXTURE_MERGES))


@functools.lru_cache(maxsize=65536)
def _count_cached(word: str) -> int:
    ranks = ranks_of(list(fixture_merges()))
    return len(bpe_encode(word, ranks))


def bpe_token_count(word: str) -> int:
    """Subword count of one pretoken under the fixture tokenizer
    (memoized — Zipfian word streams hit the cache almost always)."""
    return _count_cached(word)
