"""Text-analysis kernels: tokens, quality features, language ID,
fingerprints, shingles, MinHash, SimHash.

All hashing is process-independent (hashlib md5 / seeded numpy constants) —
never Python's salted ``hash`` — so results are identical across Ray workers
and the DuckDB/sequential oracles (determinism requirement).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

# Tokens = maximal runs of non-ASCII-whitespace. The explicit class (not
# \S) pins Python to the ASCII semantics DuckDB's RE2 always uses for \S —
# Python's Unicode \S would additionally break on U+00A0 etc., silently
# desynchronizing every token-count oracle on non-ASCII corpora.
TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")
WORD_RE = re.compile(r"[a-z]+")          # language-ID tokens (letters)
SHINGLE_RE = re.compile(r"[a-z0-9]+")    # shingle/simhash tokens (alnum)
PUNCT_RE = re.compile(r"[.,!?;:]")

# Same regex string is used verbatim in the DuckDB oracle SQL; re.ASCII
# pins Python's \b to RE2's ASCII word-boundary semantics (RE2 has no
# Unicode \b), so 'Müthe' counts identically in both engines.
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "for", "on", "with")
STOPWORD_RE = re.compile(r"\b(?:%s)\b" % "|".join(STOPWORDS), re.ASCII)

# tiny deterministic stopword profiles for the language-ID heuristic
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
    "es": {"el", "la", "los", "que", "y", "de", "en", "un", "una", "por"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"},
    "cs": {"je", "se", "na", "to", "že", "s", "z", "do", "pro", "jako"},
}


# BPE-ish pretokenizer (GPT-2-style: contraction suffixes, space-prefixed
# letter/digit/punct runs), restricted to constructs Python re and DuckDB's
# RE2 evaluate identically — ASCII classes (RE2's \s is ASCII, Python's is
# Unicode: never mix them in a shared pattern), no lookahead, leftmost-first
# alternation (both engines). The SAME string is used verbatim in the SQL
# oracle (apostrophes doubled for the literal).
SUBWORD_RE_STR = (r"'(?:s|t|re|ve|m|ll|d)"
                  r"| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9' \t\n\r\f\v]+")
SUBWORD_RE = re.compile(SUBWORD_RE_STR)


def token_count(text: str) -> int:
    return len(TOKEN_RE.findall(text))


def subword_count(text: str) -> int:
    """Number of BPE-ish subword pretokens (the token-budget estimator for
    training-data curation; whitespace tokens are :func:`token_count`)."""
    return len(SUBWORD_RE.findall(text))


def quality_features(text: str) -> dict:
    """Deterministic integer quality features for one document."""
    tokens = TOKEN_RE.findall(text)
    return {
        "n_chars": len(text),
        "n_tokens": len(tokens),
        "n_stopwords": len(STOPWORD_RE.findall(text.lower())),
        "n_punct": len(PUNCT_RE.findall(text)),
        "max_token_len": max((len(t) for t in tokens), default=0),
    }


def lang_id(text: str) -> str:
    """N-gram/stopword language heuristic -> ISO code or 'und'.

    Deterministic tie-break: highest score, then alphabetical code.
    """
    words = set(WORD_RE.findall(text.lower()))
    best, best_score = "und", 0
    for code in sorted(LANG_PROFILES):
        score = len(words & LANG_PROFILES[code])
        if score > best_score:
            best, best_score = code, score
    return best


def content_hash(text: str) -> str:
    """md5 hex of utf-8 text (exact-dup key; matches DuckDB ``md5(text)``)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


_FP_BASE = 1_000_003
_FP_MOD = (1 << 61) - 1


def rolling_fingerprint(text: str, window: int = 64) -> int:
    """Document fingerprint: min of polynomial rolling hashes over fixed-size
    char windows (winnowing-style). Stable across processes."""
    if len(text) < window:
        h = 0
        for ch in text:
            h = (h * _FP_BASE + ord(ch)) % _FP_MOD
        return h
    h = 0
    pw = pow(_FP_BASE, window - 1, _FP_MOD)
    best = _FP_MOD
    for i, ch in enumerate(text):
        h = (h * _FP_BASE + ord(ch)) % _FP_MOD
        if i >= window:
            h = (h - ord(text[i - window]) * pw * _FP_BASE) % _FP_MOD
        if i >= window - 1:
            best = min(best, h)
    return best


def word_shingles(text: str, k: int = 3) -> set[str]:
    """Distinct k-word shingles. Documents with fewer than ``k`` tokens have
    NO shingles (empty set) — matching the SQL trigram oracle, which emits
    nothing for <k-token docs. Near-dup operators therefore never pair
    degenerate short/empty docs (exact dedup covers identical ones)."""
    toks = SHINGLE_RE.findall(text.lower())
    if len(toks) < k:
        return set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def shingle_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact n-gram Jaccard similarity between two documents."""
    sa, sb = word_shingles(a, k), word_shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


# -- MinHash ---------------------------------------------------------------

NUM_PERM = 64
LSH_BANDS = 16
LSH_ROWS = NUM_PERM // LSH_BANDS
_MH_P = (1 << 61) - 1
_rs = np.random.RandomState(42)
_MH_A = _rs.randint(1, _MH_P, size=NUM_PERM, dtype=np.uint64)
_MH_B = _rs.randint(0, _MH_P, size=NUM_PERM, dtype=np.uint64)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """64-bit shingle hashes: first 16 hex chars of md5, read as uint64 —
    the same convention :func:`simhash64` uses, reproducible in ANSI SQL
    (``('0x' || substr(md5(s), 1, 16))::UBIGINT``) so the correctness
    oracle can recompute MinHash signatures from scratch. Empty for docs
    with no shingles (shorter than ``k`` tokens)."""
    sh = word_shingles(text, k)
    return np.array(
        sorted(int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)
               for s in sh),
        dtype=np.uint64)


def minhash_signature(text: str, k: int = 3) -> np.ndarray | None:
    """NUM_PERM-wide MinHash signature (uint64) of the doc's word shingles;
    ``None`` for docs with no shingles (they participate in no LSH bucket).

    Per-perm value: ``(a*x + b) mod p`` with uint64 WRAPPING on the products
    (numpy semantics); the SQL oracle mirrors the wrap explicitly with
    ``% 2^64`` in HUGEINT arithmetic."""
    x = _shingle_hashes(text, k)
    if x.size == 0:
        return None
    vals = (_MH_A[:, None] * x[None, :] + _MH_B[:, None]) % _MH_P
    return vals.min(axis=1)


def lsh_band_keys(sig: np.ndarray) -> list[str]:
    """Band the signature -> LSH_BANDS bucket keys 'band:digest'."""
    keys = []
    for b in range(LSH_BANDS):
        chunk = sig[b * LSH_ROWS:(b + 1) * LSH_ROWS]
        digest = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
        keys.append(f"{b}:{digest}")
    return keys


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


# -- SimHash ---------------------------------------------------------------

_BIT_IDX = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over lowercase word tokens (count-weighted).

    Per-token hash = first 16 hex chars of md5 read as uint64; component
    ``i`` of the signature is bit ``i`` of that hash ((h >> i) & 1). Both
    choices are reproducible in ANSI SQL (DuckDB:
    ``('0x' || substr(md5(w), 1, 16))::UBIGINT``), which is how the
    correctness oracle cross-checks the signatures end-to-end."""
    counts: dict[str, int] = {}
    for w in SHINGLE_RE.findall(text.lower()):
        counts[w] = counts.get(w, 0) + 1
    acc = np.zeros(64, dtype=np.int64)
    one = np.uint64(1)
    for w, c in counts.items():
        h = np.uint64(int(hashlib.md5(w.encode("utf-8")).hexdigest()[:16], 16))
        bits = ((h >> _BIT_IDX) & one).astype(np.int64)
        acc += (2 * bits - 1) * c
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
