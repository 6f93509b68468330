"""CCNet-style perplexity bucketing: head / middle / tail per language.

CCNet (Wenzek et al., arXiv:1911.00359) splits each language's crawl by
language-model perplexity terciles and trains preferentially on the
"head". This operator reproduces that split exactly and deterministically:

1. score every document with the bounded unigram LM
   (``tfidf.doc_lm_score`` — broadcast score table, zero-shuffle pass),
   carrying ``lang`` so no doc_id join is needed;
2. rank documents inside each language by ``(lm_score_e6 DESC, doc_id)``
   — higher mean log-prob = lower perplexity = head;
3. bucket by the NTILE(3) rank formula ``((r-1)*3)//n`` so the split
   matches SQL NTILE tie-for-tie.

The per-language rank is a global order statistic, computed with the
two-pass frozen-blocking scan (``functions/budget.py``): sort
``(lang, -score, doc_id)`` range-partitions each language across blocks
(no language ever sits in one worker), pass 1 ships one summary row per
lang-run per block to the driver, pass 2 adds broadcast prior-count
offsets to block-local arange. Language totals are |langs| numbers —
driver-safe at any corpus size.

100 TB trade (documented, not taken): the exact-NTILE contract costs ONE
global sort of (lang, score) — at corpus scale an approximate split
(per-lang t-digest / bounded score histogram, since lm_score_e6 is a
bounded-precision integer, then a broadcast two-threshold filter) drops
the sort entirely at the price of tercile boundaries being off by the
histogram bin width. The exact form is kept here because the correctness
gate hashes against SQL NTILE tie-for-tie; a production run at 100 TB
should flip to the histogram split (the machinery already exists:
``relational.token_quantiles_by_lang`` computes exact discrete quantiles
from bounded histograms with zero global sort — the same shape applies
to ``lm_score_e6`` directly when exact SQL-tie parity is not required).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from pero_ocr_ray.functions.budget import _runs

_BUCKETS = np.array(["head", "middle", "tail"], dtype=object)


def perplexity_buckets(docs: rd.Dataset,
                       vocab_size: int = 4096) -> rd.Dataset:
    """documents (doc_id, text, lang) ->
    (doc_id, lang, lm_score_e6, bucket)."""
    from pero_ocr_ray.functions.tfidf import doc_lm_score

    scores = doc_lm_score(docs, vocab_size=vocab_size,
                          carry_cols=("lang",))

    def neg(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "doc_id": t.column("doc_id"),
            "lang": t.column("lang"),
            "lm_score_e6": t.column("lm_score_e6"),
            "__neg": pc.negate_checked(t.column("lm_score_e6")),
        })

    sorted_ds = (scores.map_batches(neg, batch_format="pyarrow")
                 .sort(["lang", "__neg", "doc_id"]).materialize())

    def run_summaries(t: pa.Table) -> pa.Table:
        langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        negs = t.column("__neg").to_numpy(zero_copy_only=False)
        ls, fn, fs, ns = [], [], [], []
        for a, b in _runs(langs):
            ls.append(langs[a])
            fn.append(int(negs[a]))
            fs.append(int(ids[a]))
            ns.append(int(b - a))
        return pa.table({"lang": pa.array(ls, pa.string()),
                         "first_neg": pa.array(fn, pa.int64()),
                         "first_doc_id": pa.array(fs, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    # runs order within a lang by their first (neg, doc_id) — the actual
    # sort key (NOT first_doc_id alone: a better-scoring run can start at
    # a larger doc_id). Offsets stay keyed by (lang, first_doc_id), which
    # is unique because doc_id is.
    summ = (sorted_ds.map_batches(run_summaries, batch_format="pyarrow",
                                  batch_size=None)
            .to_pandas())  # <= blocks x langs rows: scan metadata
    if len(summ) == 0:  # empty corpus (e.g. everything filtered upstream)
        empty = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                           ("lm_score_e6", pa.int64()),
                           ("bucket", pa.string())])
        return rd.from_arrow(empty.empty_table())
    summ = summ.sort_values(["lang", "first_neg", "first_doc_id"],
                            ignore_index=True)
    prior = (summ.groupby("lang", sort=False)["n"].cumsum() - summ["n"])
    totals = summ.groupby("lang")["n"].sum().to_dict()
    offsets = {(l, int(f)): int(p) for l, f, p in
               zip(summ["lang"], summ["first_doc_id"], prior)}
    ref = ray.put((offsets, totals))

    def bucket(t: pa.Table) -> pa.Table:
        offs, tot = ray.get(ref)
        langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        lab = np.empty(len(langs), dtype=object)
        for a, b in _runs(langs):
            lang = langs[a]
            r0 = offs[(lang, int(ids[a]))]  # 0-based rank of the run head
            ranks = r0 + np.arange(b - a, dtype=np.int64)
            lab[a:b] = _BUCKETS[(ranks * 3) // tot[lang]]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "lang": t.column("lang"),
            "lm_score_e6": t.column("lm_score_e6"),
            "bucket": pa.array(lab, pa.string()),
        })

    return sorted_ds.map_batches(bucket, batch_format="pyarrow",
                                 batch_size=None)


def perplexity_buckets_histogram(docs: rd.Dataset, vocab_size: int = 4096,
                                 bin_e6: int = 100_000) -> rd.Dataset:
    """The 100-TB shape the exact-NTILE trade (module docstring) points
    to, implemented: bin-threshold terciles with ZERO global sorts.

    Pass 1 reduces per-batch (lang, floor(score/bin)) partial counts to
    a bounded histogram — |langs| x (score range / bin) rows of pure
    metadata (driver-safe at any corpus size; the only take_all).
    Thresholds per lang: ``q1 = max bin b with C(b) >= ceil(n/3)`` where
    ``C(b)`` counts docs scoring in bins >= b, ``q2`` likewise at 2n/3.
    Pass 2 broadcasts {lang: (q1, q2)} and assigns ``head`` iff
    ``bin >= q1``, ``middle`` iff ``bin >= q2``, else ``tail`` — a pure
    streaming map. Deterministic and partitioning-invariant: boundary-bin
    mass lands one bucket up as a RULE, not a tie-break, so the SQL
    mirror (same histogram, same window cumsum, same max-filter) replays
    it exactly. Tercile sizes are approximate by at most the boundary
    bin's mass — the CCNet trade at scale. Scores are materialized
    between the passes (small fixed-width rows); a production run can
    instead persist them to parquet or recompute (scoring is a
    stateless broadcast-LM map).
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from pero_ocr_ray.functions.tfidf import doc_lm_score

    scores = doc_lm_score(docs, vocab_size=vocab_size,
                          carry_cols=("lang",)).materialize()

    def qpart(df: pd.DataFrame) -> pd.DataFrame:
        qs = df["lm_score_e6"].to_numpy("int64") // bin_e6  # floor div
        g = (pd.DataFrame({"lang": df["lang"], "qs": qs})
             .groupby(["lang", "qs"], as_index=False)
             .size().rename(columns={"size": "n_partial"}))
        g["key"] = g["lang"] + "|" + g["qs"].astype(str)
        return g[["key", "n_partial"]]

    hist = (scores.map_batches(qpart, batch_format="pandas")
            .groupby("key").aggregate(Sum("n_partial", alias_name="n")))
    rows = hist.take_all()  # bounded: langs x bins metadata rows

    per_lang: dict = {}
    for r in rows:
        lang, qs = r["key"].rsplit("|", 1)
        per_lang.setdefault(lang, []).append((int(qs), int(r["n"])))
    thresholds = {}
    for lang, bins in per_lang.items():
        bins.sort(key=lambda t: -t[0])  # descending score bin
        total = sum(n for _, n in bins)
        k1, k2 = (total + 2) // 3, (2 * total + 2) // 3
        cum, q1, q2 = 0, None, None
        for b, n in bins:
            cum += n
            if q1 is None and cum >= k1:
                q1 = b
            if q2 is None and cum >= k2:
                q2 = b
        thresholds[lang] = (q1, q2)
    ref = ray.put(thresholds)

    class Assign:
        def __init__(self):
            self.thr = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            qs = df["lm_score_e6"].to_numpy("int64") // bin_e6
            q1 = df["lang"].map(lambda l: self.thr[l][0]).to_numpy("int64")
            q2 = df["lang"].map(lambda l: self.thr[l][1]).to_numpy("int64")
            bucket = np.where(qs >= q1, "head",
                              np.where(qs >= q2, "middle", "tail"))
            return pa.table({
                "doc_id": pa.array(df["doc_id"].to_numpy("int64"),
                                   pa.int64()),
                "lang": pa.array(df["lang"].astype(str), pa.string()),
                "lm_score_e6": pa.array(
                    df["lm_score_e6"].to_numpy("int64"), pa.int64()),
                "bucket": pa.array(bucket.astype(object), pa.string()),
            })

    return scores.map_batches(Assign, batch_format="pandas",
                              concurrency=2)
