"""Sequence alignment kernels: Levenshtein distance / alignment / CER-WER.

From-scratch numpy implementations with the same capabilities as the
reference's alignment utilities
(/root/reference/pero_ocr/sequence_alignment.py:4-161) and error summary
(/root/reference/pero_ocr/error_summary.py:101-163): edit distance, full
alignment path, and corpus-level character/word error-rate aggregation with
the classic partial+final shape (per-doc stats then weighted merge).
"""

from __future__ import annotations

import numpy as np


def levenshtein_distance(a, b) -> int:
    """Edit distance between two sequences (str or list).

    Fast paths: exact equality, and common prefix/suffix stripping — the
    DP is quadratic, and corpus comparison mostly sees near-identical
    documents (often megabytes), so the trim is what makes G3-style corpus
    CER tractable."""
    if a == b:
        return 0
    # strip common prefix / suffix
    i = 0
    n, m = len(a), len(b)
    while i < n and i < m and a[i] == b[i]:
        i += 1
    j = 0
    while j < n - i and j < m - i and a[n - 1 - j] == b[m - 1 - j]:
        j += 1
    a = a[i:n - j]
    b = b[i:m - j]
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    b_arr = np.array(list(b))
    prev = np.arange(len(b) + 1)
    for ch in a:
        cur = np.empty(len(b) + 1, dtype=np.int64)
        cur[0] = prev[0] + 1
        # substitution / deletion are vectorizable; the insertion term
        # (cur[j-1] + 1) is a running dependency -> forward fix-up pass
        np.minimum(prev[:-1] + (b_arr != ch), prev[1:] + 1, out=cur[1:])
        for j in range(1, len(cur)):
            if cur[j] > cur[j - 1] + 1:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return int(prev[-1])


def levenshtein_alignment(a: str, b: str) -> list[tuple[str | None, str | None]]:
    """Full alignment as (a_char|None, b_char|None) pairs (None = gap)."""
    n, m = len(a), len(b)
    dp = np.zeros((n + 1, m + 1), dtype=np.int64)
    dp[:, 0] = np.arange(n + 1)
    dp[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i, j] = min(dp[i - 1, j] + 1, dp[i, j - 1] + 1,
                           dp[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    path = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i, j] == dp[i - 1, j - 1] + (a[i - 1] != b[j - 1]):
            path.append((a[i - 1], b[j - 1]))
            i, j = i - 1, j - 1
        elif i > 0 and dp[i, j] == dp[i - 1, j] + 1:
            path.append((a[i - 1], None))
            i -= 1
        else:
            path.append((None, b[j - 1]))
            j -= 1
    return path[::-1]


def levenshtein_substring(needle, haystack) -> tuple[int, int]:
    """Best approximate occurrence of ``needle`` inside ``haystack``:
    -> (edit_distance, end_position). Substring variant of the reference's
    alignment suite (/root/reference/pero_ocr/sequence_alignment.py — the
    substring functions): deletions of haystack prefix/suffix are free."""
    if not needle:
        return 0, 0
    n, m = len(needle), len(haystack)
    h_arr = np.array(list(haystack)) if m else np.array([], dtype="<U1")
    prev = np.zeros(m + 1, dtype=np.int64)  # free prefix skip
    for i in range(n):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i + 1
        ch = needle[i]
        np.minimum(prev[:-1] + (h_arr != ch), prev[1:] + 1, out=cur[1:])
        for j in range(1, m + 1):
            if cur[j] > cur[j - 1] + 1:
                cur[j] = cur[j - 1] + 1
        prev = cur
    end = int(np.argmin(prev))
    return int(prev[end]), end


def find_best_overlap(head: str, tail: str, max_overlap: int = 256) -> int:
    """Chunk-merge primitive (A4 analog,
    /root/reference/pero_ocr/ocr_engine/line_ocr_engine.py:180-211): given
    the end of one processed chunk and the start of the next (which share an
    overlapping region), return how many chars of ``tail``'s start duplicate
    ``head``'s end — the cut point for a seamless merge."""
    window = min(max_overlap, len(head), len(tail))
    if window == 0:
        return 0
    head_end = head[-window:]
    # pass 1: longest EXACT suffix-prefix match (the common case when both
    # chunks came from the same source text)
    for olen in range(window, 0, -1):
        if head_end[-olen:] == tail[:olen]:
            return olen
    # pass 2: noisy overlap — minimize normalized edit cost, prefer longer
    best_len, best_ratio = 0, 1.0
    for olen in range(window, 3, -1):
        cost = levenshtein_distance(head_end[-olen:], tail[:olen])
        ratio = cost / olen
        if ratio < best_ratio - 1e-9:
            best_ratio, best_len = ratio, olen
    return best_len if best_ratio <= 0.25 else 0


def merge_chunks(chunks: list[str], max_overlap: int = 256) -> str:
    """Merge sequentially-processed overlapping chunks into one text."""
    if not chunks:
        return ""
    out = chunks[0]
    for nxt in chunks[1:]:
        cut = find_best_overlap(out, nxt, max_overlap)
        out += nxt[cut:]
    return out


def align_positions(hyp: str, ref: str) -> list[int]:
    """For each char of ``hyp``, the position of its aligned char in ``ref``
    (-1 for insertions) — the char-span alignment analog of the reference's
    ``align_text`` (/root/reference/pero_ocr/core/force_alignment.py:150-165),
    used to map extracted text back onto source offsets."""
    path = levenshtein_alignment(hyp, ref)
    out: list[int] = []
    ref_pos = 0
    for h_ch, r_ch in path:
        if h_ch is not None and r_ch is not None:
            out.append(ref_pos)
            ref_pos += 1
        elif h_ch is not None:  # insertion in hyp
            out.append(-1)
        else:  # deletion: consume ref only
            ref_pos += 1
    return out


def error_stats(hyp: str, ref: str) -> dict:
    """Per-document char+word error stats (partial record, mergeable)."""
    return {
        "char_errors": levenshtein_distance(hyp, ref),
        "ref_chars": len(ref),
        "word_errors": levenshtein_distance(hyp.split(), ref.split()),
        "ref_words": len(ref.split()),
        "n_docs": 1,
    }


def merge_error_stats(parts: list[dict]) -> dict:
    """Weighted merge of partial stats -> corpus CER/WER (G3 analog)."""
    tot = {"char_errors": 0, "ref_chars": 0, "word_errors": 0,
           "ref_words": 0, "n_docs": 0}
    for p in parts:
        for k in tot:
            tot[k] += p[k]
    tot["cer"] = tot["char_errors"] / tot["ref_chars"] if tot["ref_chars"] else 0.0
    tot["wer"] = tot["word_errors"] / tot["ref_words"] if tot["ref_words"] else 0.0
    return tot
