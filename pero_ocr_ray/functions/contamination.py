"""Benchmark decontamination: n-gram overlap against an evaluation set.

A training-data engine must be able to answer "does this corpus leak the
benchmark?" before a training run (the eval-contamination check every
LLM-data pipeline performs). Operator shape:

* the benchmark side is SMALL by nature (eval suites are MBs, the corpus
  is TBs): its distinct word-shingle hash set is built once on the driver
  from a bounded input and broadcast with ``ray.put`` — read by every
  task, never re-shipped per batch and never a shuffle side;
* the corpus side streams: one ``map_batches`` computes, per document,
  the distinct-shingle overlap with the benchmark set via a vectorized
  ``np.isin`` on sorted uint64 hashes.

Shingles and hashes are the repo-wide conventions
(:func:`pero_ocr_ray.kernels.textstats.word_shingles` — lowercased
``[a-z0-9]+`` tokens, k-gram join by single spaces, EMPTY set for <k-token
docs — and md5-high-64 hashes), so the DuckDB oracle rebuilds the exact
counts from scratch on the n-gram STRINGS; hash membership equals string
membership up to md5 collisions (2^-64).

Fractions are emitted as exact integers (``n_hits * 1e6 // n_ngrams``) —
no cross-engine float compare (CLAUDE.md convention).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from pero_ocr_ray.kernels.textstats import _shingle_hashes


def _bench_hash_set(bench_texts, n: int) -> np.ndarray:
    """Distinct sorted shingle hashes of the benchmark texts."""
    parts = [_shingle_hashes(t or "", n) for t in bench_texts]
    if not parts:
        return np.array([], dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def ngram_contamination(docs: rd.Dataset, bench_texts: list[str],
                        n: int = 3) -> rd.Dataset:
    """-> (doc_id, n_ngrams, n_hits, contam_e6, is_contaminated) per doc.

    ``n_ngrams`` / ``n_hits`` count DISTINCT n-grams (set semantics, like
    the dedup suite); ``contam_e6 = n_hits * 1_000_000 // n_ngrams`` (0
    for shingle-less docs). ``bench_texts`` is a plain list: benchmarks
    are bounded — callers with a Dataset benchmark side should collect it
    explicitly so the boundedness is visible at the call site."""
    bench = _bench_hash_set(bench_texts, n)
    ref = ray.put(bench)

    def score(t: pa.Table) -> pa.Table:
        b = ray.get(ref)
        ids, n_g, n_h, frac, flag = [], [], [], [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            h = _shingle_hashes(text or "", n)  # sorted distinct
            hits = (int(np.isin(h, b, assume_unique=True).sum())
                    if len(h) and len(b) else 0)
            ids.append(did)
            n_g.append(len(h))
            n_h.append(hits)
            frac.append(hits * 1_000_000 // len(h) if len(h) else 0)
            flag.append(hits > 0)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_ngrams": pa.array(n_g, pa.int64()),
            "n_hits": pa.array(n_h, pa.int64()),
            "contam_e6": pa.array(frac, pa.int64()),
            "is_contaminated": pa.array(flag, pa.bool_()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def decontaminate(docs: rd.Dataset, bench_texts: list[str], n: int = 3,
                  max_contam_e6: int = 0) -> rd.Dataset:
    """Corpus rows whose benchmark n-gram overlap fraction is <=
    ``max_contam_e6`` (default: drop any doc sharing even one distinct
    n-gram). The threshold compares exact rationals
    (``hits * 1e6 <= max_contam_e6 * n_ngrams``) — a floored fraction
    would keep a million-shingle doc with one benchmark hit at the
    drop-any default. Streaming one-pass filter — the row survives with
    ALL its columns, so this composes into curation chains."""
    bench = _bench_hash_set(bench_texts, n)
    ref = ray.put(bench)

    def keep(t: pa.Table) -> pa.Table:
        b = ray.get(ref)
        mask = []
        for text in t.column("text").to_pylist():
            h = _shingle_hashes(text or "", n)
            hits = (int(np.isin(h, b, assume_unique=True).sum())
                    if len(h) and len(b) else 0)
            mask.append(hits * 1_000_000 <= max_contam_e6 * len(h))
        return t.filter(pa.array(mask, pa.bool_()))

    return docs.map_batches(keep, batch_format="pyarrow")


def decontaminate_spans(docs: rd.Dataset, bench_texts: list[str],
                        n: int = 3) -> rd.Dataset:
    """Surgical decontamination: REMOVE contaminated n-gram spans instead
    of dropping documents (the GPT-3-appendix approach — a doc touching a
    benchmark sentence loses the sentence, not its training value).

    -> (doc_id, n_tokens, n_removed, clean_text) for EVERY input doc:
    a token is removed iff it lies inside any n-gram window whose
    shingle is in the benchmark set; ``clean_text`` is the kept tokens
    joined by single spaces (the canonical shingle token stream —
    lowercased ``[a-z0-9]+``), so both engines rebuild the identical
    string. Benchmark docs fully cover themselves and come out empty.

    Same scale shape as :func:`ngram_contamination`: bounded benchmark
    shingle-hash set broadcast once, one streaming scoring pass, zero
    shuffle. Hash membership equals string membership up to md5
    collisions (2^-64; repo precedent).
    """
    import hashlib

    from pero_ocr_ray.kernels.textstats import SHINGLE_RE

    bench = _bench_hash_set(bench_texts, n)
    ref = ray.put(bench)

    def clean(t: pa.Table) -> pa.Table:
        b = ray.get(ref)
        ids, n_tok, n_rm, texts = [], [], [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            toks = SHINGLE_RE.findall((text or "").lower())
            m = len(toks)
            cover = np.zeros(m, dtype=bool)
            if m >= n and len(b):
                hs = np.fromiter(
                    (int(hashlib.md5(" ".join(toks[i:i + n])
                                     .encode()).hexdigest()[:16], 16)
                     for i in range(m - n + 1)),
                    dtype=np.uint64, count=m - n + 1)
                for s in np.nonzero(np.isin(hs, b))[0]:
                    cover[s:s + n] = True
            kept = [w for w, c in zip(toks, cover) if not c]
            ids.append(did)
            n_tok.append(m)
            n_rm.append(int(cover.sum()))
            texts.append(" ".join(kept))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_removed": pa.array(n_rm, pa.int64()),
            "clean_text": pa.array(texts, pa.string()),
        })

    return docs.map_batches(clean, batch_format="pyarrow")
