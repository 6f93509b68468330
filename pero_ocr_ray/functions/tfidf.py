"""Corpus-statistics scoring: TF-IDF keyword extraction and n-gram-LM
document scoring (the CCNet-style "score every page against a corpus
language model" curation signal; reference analog: the per-line confidence
scoring pass the reference runs over every transcription,
/root/reference/pero_ocr/document_ocr/page_parser.py:302-335 — a corpus-level
model applied per record).

Both operators share the repo-wide token convention (``SHINGLE_RE`` alnum
runs over lowercased text) and the integer fixed-point emission convention
(``floor(x * 1e6)`` int64 on BOTH engines) so the DuckDB oracles hash-match.

Scale shapes (100 TB rules):

* **TF-IDF**: the tf rows (one per distinct (doc, token)) are the inherent
  output size; document frequency is combiner algebra (per-batch distinct
  counts, ``groupby(token).Sum``) so "the" crosses the shuffle as one row
  per block; tf joins df with a partitioned hash join (vocabulary is
  unbounded at corpus scale — never broadcast); per-doc top-k runs on
  bucketed keys (``doc_id % num_buckets``) with one vectorized pandas
  sort+head per bucket, never one dispatch per doc.
* **LM score**: the model is a BOUNDED artifact — the top ``vocab_size``
  tokens by corpus frequency (deterministic ``(count desc, token)`` cut)
  with add-one smoothing and a single OOV probability. Training is one
  combiner groupby + a distributed top-k; the trained score table is
  broadcast once (``ray.put``) and scoring is a pure per-batch map — the
  100 TB scoring pass has ZERO shuffles.

Float discipline: each per-token log-probability is quantized to int64
micro-nats (``floor(ln(p) * 1e6)``) BEFORE any summation, so per-doc sums
are exact integer arithmetic — immune to the float-summation-order
divergence between engines (the HLL lesson, CLAUDE.md).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from pero_ocr_ray.kernels.textstats import SHINGLE_RE

_TOPK_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("token", pa.string()), ("tf", pa.int64()),
    ("df", pa.int64()), ("tfidf_e6", pa.int64()),
])


def _token_counts(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, text) -> (token, n): corpus-wide token frequencies via
    per-batch value_counts partials + one Sum groupby."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        counts = (df["text"].str.lower().str.findall(SHINGLE_RE)
                  .explode().dropna().value_counts())
        return pd.DataFrame({"token": counts.index.astype(str),
                             "n_partial": counts.values.astype("int64")})

    return (ds.map_batches(partial, batch_format="pandas")
              .groupby("token").aggregate(Sum("n_partial", alias_name="n")))


def doc_tfidf_topk(docs: rd.Dataset, k: int = 5,
                   num_buckets: int = 1024) -> rd.Dataset:
    """-> (doc_id, token, tf, df, tfidf_e6): per document, the ``k``
    highest-TF-IDF tokens.

    ``tfidf_e6 = floor(tf * ln(N / df) * 1e6)`` with ``N`` = total
    document count; ranking and the top-k cut use the INTEGER score with
    ``token`` ascending as the tie-break, so the selected rows are
    partition-order independent and identical to the SQL oracle's
    ``row_number() OVER (ORDER BY tfidf_e6 DESC, token)``.
    """
    from ray.data.aggregate import Sum
    from pero_ocr_ray.functions.index import _token_doc_pairs
    from pero_ocr_ray.functions.join import hash_join
    from pero_ocr_ray.util import agg_join_safe, pin_empty_blocks

    n_docs = float(docs.count())
    tf = _token_doc_pairs(docs)  # (token, doc_id, tf)

    # document frequency: tf rows are one-per-(doc, token), so a per-batch
    # count per token is a valid partial.
    def df_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"token": t.column("token")})
             .group_by("token").aggregate([([], "count_all")]))
        return pa.table({"token": g.column("token"),
                         "df_p": g.column("count_all")})

    # agg_join_safe: the aggregate output carries null-schema empty blocks
    # in sparse partitions; pin_empty_blocks can't repair them (map_batches
    # skips empty blocks) and the join shuffle aborts on them at high
    # partition counts — the round-4 32-CPU failure. The repartition merges
    # them away; its cost is bounded by the vocabulary size, tiny vs tf.
    df_ds = agg_join_safe(
        tf.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token").aggregate(Sum("df_p", alias_name="df")))

    tf_schema = pa.schema([("token", pa.string()), ("doc_id", pa.int64()),
                           ("tf", pa.int64())])
    joined = hash_join(pin_empty_blocks(tf, tf_schema), df_ds, on="token")

    def score(t: pa.Table) -> pa.Table:
        tfv = t.column("tf").to_numpy(zero_copy_only=False).astype("int64")
        dfv = t.column("df").to_numpy(zero_copy_only=False).astype("float64")
        # same association order as the SQL: (tf * ln(N/df)) * 1e6
        e6 = np.floor(tfv * np.log(n_docs / dfv) * 1e6).astype("int64")
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "token": t.column("token"),
            "tf": t.column("tf"),
            "df": pa.array(dfv.astype("int64"), pa.int64()),
            "tfidf_e6": pa.array(e6, pa.int64()),
            "__b": pa.array(did % num_buckets, pa.int64()),
        })

    scored = joined.map_batches(score, batch_format="pyarrow")

    def bucket_topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["doc_id", "tfidf_e6", "token"],
                          ascending=[True, False, True], kind="mergesort")
        out = g.groupby("doc_id", sort=False).head(k)
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy("int64"), pa.int64()),
            "token": pa.array(out["token"].to_numpy(dtype=object),
                              pa.string()),
            "tf": pa.array(out["tf"].to_numpy("int64"), pa.int64()),
            "df": pa.array(out["df"].to_numpy("int64"), pa.int64()),
            "tfidf_e6": pa.array(out["tfidf_e6"].to_numpy("int64"),
                                 pa.int64()),
        })

    return (scored.groupby("__b")
            .map_groups(bucket_topk, batch_format="pandas"))


def train_unigram_lm(docs: rd.Dataset, vocab_size: int = 4096
                     ) -> tuple[dict[str, int], int]:
    """Train the bounded unigram LM: returns ``(score_table, oov_e6)``
    where ``score_table[token] = floor(ln((c+1)/(T+V+1)) * 1e6)`` for the
    ``vocab_size`` most frequent tokens (count desc, token asc cut) and
    ``oov_e6 = floor(ln(1/(T+V+1)) * 1e6)``. ``T`` = total corpus tokens.

    The vocabulary cut runs as a distributed top-k (batch-local head +
    one tiny final); only ``vocab_size`` rows ever reach the driver."""
    counts = _token_counts(docs)
    total = counts.sum("n") or 0  # None on an empty/token-less corpus
    t_plus = float(total) + float(vocab_size) + 1.0

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "token"],
                              ascending=[False, True]).head(vocab_size)

    vocab = (counts.map_batches(local_top, batch_format="pandas")
             .repartition(1)
             .map_batches(local_top, batch_format="pandas",
                          batch_size=None)
             .take_all())  # bounded: <= vocab_size rows
    table = {r["token"]: int(math.floor(
        math.log((int(r["n"]) + 1) / t_plus) * 1e6)) for r in vocab}
    oov_e6 = int(math.floor(math.log(1.0 / t_plus) * 1e6))
    return table, oov_e6


def doc_lm_score(docs: rd.Dataset, vocab_size: int = 4096,
                 carry_cols: tuple[str, ...] = ()) -> rd.Dataset:
    """-> (doc_id, n_tokens, lm_score_e6[, *carry_cols]): mean unigram
    log-probability in micro-nats per document (higher = more
    in-distribution; the CCNet quality-bucket signal). Token-less
    documents are omitted. ``carry_cols`` ride along unchanged (one value
    per doc row) so downstream consumers avoid a doc_id join.

    ``lm_score_e6 = floor(sum(per-token score_e6) / n_tokens)`` — the sum
    is over int64 quantized scores, so it is exact and order-independent.
    """
    table, oov_e6 = train_unigram_lm(docs, vocab_size)
    ref = ray.put(table)

    class ScoreStage:
        def __init__(self):
            self.table = ray.get(ref)
            self.oov = oov_e6

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            toks = df["text"].str.lower().str.findall(SHINGLE_RE)
            ex = pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64").to_numpy(),
                "token": toks.to_numpy(dtype=object),
            }).explode("token", ignore_index=True).dropna(subset=["token"])
            base = {"doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "lm_score_e6": pa.array([], pa.int64())}
            if len(ex) == 0:
                for c in carry_cols:
                    base[c] = pa.array([], pa.string())
                return pa.table(base)
            s = (ex["token"].map(self.table).fillna(self.oov)
                 .astype("int64"))
            g = (pd.DataFrame({"doc_id": ex["doc_id"], "s": s})
                 .groupby("doc_id", as_index=False, sort=False)
                 .agg(n_tokens=("s", "size"), total=("s", "sum")))
            score = np.floor(g["total"].to_numpy("float64")
                             / g["n_tokens"].to_numpy("float64")
                             ).astype("int64")
            out = {
                "doc_id": pa.array(g["doc_id"].to_numpy("int64"),
                                   pa.int64()),
                "n_tokens": pa.array(g["n_tokens"].to_numpy("int64"),
                                     pa.int64()),
                "lm_score_e6": pa.array(score, pa.int64()),
            }
            if carry_cols:
                side = (df.assign(doc_id=df["doc_id"].astype("int64"))
                        [["doc_id", *carry_cols]]
                        .drop_duplicates("doc_id"))
                m = g[["doc_id"]].merge(side, on="doc_id")
                for c in carry_cols:
                    out[c] = pa.array(m[c], pa.string())
            return pa.table(out)

    return docs.map_batches(ScoreStage, batch_format="pandas",
                            concurrency=2)
