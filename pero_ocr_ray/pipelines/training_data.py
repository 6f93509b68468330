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


# ---------------------------------------------------------------------------
# v2: the full curation chain (every major engine subsystem in one stream)
# ---------------------------------------------------------------------------


def curate_full(documents: rd.Dataset, min_tokens: int = 20,
                max_stopword_ratio: float = 0.5,
                near_dup_threshold: float = 0.7,
                rates_permille: dict[str, int] | None = None,
                default_permille: int = 700) -> rd.Dataset:
    """documents -> fully curated rows, as one composition:

        exact dedup (md5 groupby, keep min doc_id)              # shuffle 1
        -> transitive near-dup drop (MinHash-LSH pairs + label  # shuffles 2..
           propagation; each cluster keeps its min doc_id; the
           drop set is removed with a NATIVE left_anti join —
           near-dups can be a large corpus fraction, so the drop
           set is never collected on the driver)
        -> quality filter (vectorized token/stopword features)   # narrow
        -> deterministic stratified sample (md5 permille)        # narrow

    Adds ``n_tokens`` and ``n_subwords`` columns (the whitespace and
    BPE-ish token budgets) to the surviving rows."""
    from pero_ocr_ray.functions.dedup import minhash_dedup_cluster_drop_ids
    from pero_ocr_ray.functions.join import hash_join
    from pero_ocr_ray.functions.sampling import stratified_sample

    # materialize the survivor set ONCE: it feeds both the clustering chain
    # and the anti-join, and leaving it lazy makes Ray re-execute the dedup
    # shuffle concurrently with the join aggregators — on small clusters
    # the reserved CPUs deadlock (CLAUDE.md composition gotcha). This is
    # the natural phase checkpoint of a curation run anyway (at 100 TB:
    # write survivors to parquet between phases instead).
    from pero_ocr_ray.util import shuffle_partitions
    survivors = (exact_dedup(documents)
                 .repartition(shuffle_partitions()).materialize())
    drops = minhash_dedup_cluster_drop_ids(
        survivors, near_dup_threshold).repartition(shuffle_partitions())
    kept = hash_join(survivors,
                     drops.map_batches(
                         lambda df: df.rename(columns={"doc_id": "drop_id"}),
                         batch_format="pandas"),
                     on="doc_id", right_on="drop_id", join_type="left_anti")

    def quality_filter(df: pd.DataFrame) -> pd.DataFrame:
        n_tokens = df["text"].str.count(K.TOKEN_RE)
        n_sub = df["text"].str.count(K.SUBWORD_RE)
        n_stop = df["text"].str.lower().str.count(K.STOPWORD_RE)
        keep = (n_tokens >= min_tokens) & \
               (n_stop <= max_stopword_ratio * n_tokens)
        out = df.loc[keep].copy()
        out["n_tokens"] = n_tokens[keep].astype("int64")
        out["n_subwords"] = n_sub[keep].astype("int64")
        return out

    filtered = kept.map_batches(quality_filter, batch_format="pandas")
    return stratified_sample(filtered, rates_permille or {},
                             default_permille=default_permille)


def training_corpus_stats_v2(documents: rd.Dataset, **kwargs) -> rd.Dataset:
    """-> (lang, n_docs, sum_tokens, sum_subwords) over the fully curated
    corpus (:func:`curate_full`) — the whole-chain correctness surface."""
    curated = curate_full(documents, **kwargs)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("lang", as_index=False)
                  .agg(n_partial=("doc_id", "size"),
                       tok_partial=("n_tokens", "sum"),
                       sub_partial=("n_subwords", "sum")))

    agg = (curated.map_batches(partial, batch_format="pandas")
           .groupby("lang").aggregate(
               Sum("n_partial", alias_name="n_docs"),
               Sum("tok_partial", alias_name="sum_tokens"),
               Sum("sub_partial", alias_name="sum_subwords")))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": df["lang"],
            "n_docs": df["n_docs"].astype("int64"),
            "sum_tokens": df["sum_tokens"].astype("int64"),
            "sum_subwords": df["sum_subwords"].astype("int64"),
        })

    return agg.map_batches(finalize, batch_format="pandas")


# ---------------------------------------------------------------------------
# v3: web-corpus chain — paragraph boilerplate removal + decontamination
# ---------------------------------------------------------------------------


def curate_v3(pdocs: rd.Dataset, lang_ds: rd.Dataset,
              bench_texts: list[str], min_tokens: int = 20,
              max_stopword_ratio: float = 0.5) -> rd.Dataset:
    """Paragraph-structured docs -> curated rows, as one composition:

        cross-corpus paragraph dedup (boilerplate removal;      # shuffles 1-2
           combiner counts + left-outer join + bucketed rebuild)
        -> benchmark decontamination (broadcast shingle set,    # narrow
           drop-any-overlap)
        -> exact doc dedup on the REBUILT text (boilerplate-    # shuffle 3
           stripped copies collapse that raw dedup would miss)
        -> lang recovery via narrow (doc_id, lang) hash join    # shuffle 4
        -> quality filter (vectorized token/stopword features)  # narrow

    ``pdocs`` is (doc_id, text); ``lang_ds`` is the 2-column (doc_id, lang)
    side — joined AFTER dedup so only survivors ship. Carries ``n_dropped``
    (boilerplate paragraphs removed per doc) through to the stats."""
    from pero_ocr_ray.functions.contamination import decontaminate
    from pero_ocr_ray.functions.join import hash_join
    from pero_ocr_ray.functions.paragraphs import paragraph_dedup

    # phase checkpoint, same rationale as curate_full: the rebuilt corpus
    # feeds exact_dedup's two consumers (winner groupby + join left side)
    from pero_ocr_ray.util import shuffle_partitions
    cleaned = (paragraph_dedup(pdocs)
               .repartition(shuffle_partitions()).materialize())
    decon = decontaminate(cleaned, bench_texts)
    # cluster-scaled repartition consolidates the join output's sparse
    # tiny blocks before the NEXT native join (empties themselves are
    # handled by rayfix; this doubles as its fallback)
    deduped = exact_dedup(decon).repartition(shuffle_partitions())
    with_lang = hash_join(deduped, lang_ds, on="doc_id")

    def quality_filter(df: pd.DataFrame) -> pd.DataFrame:
        n_tokens = df["text"].str.count(K.TOKEN_RE)
        n_stop = df["text"].str.lower().str.count(K.STOPWORD_RE)
        keep = (n_tokens >= min_tokens) & \
               (n_stop <= max_stopword_ratio * n_tokens)
        out = df.loc[keep].copy()
        out["n_tokens"] = n_tokens[keep].astype("int64")
        return out

    return with_lang.map_batches(quality_filter, batch_format="pandas")


def curate_v4(documents: rd.Dataset,
              vocab_size: int = 4096) -> rd.Dataset:
    """The round-4 "order the training stream" chain — every stage a
    round-4 operator, composed into one run:

        exact dedup (combiner groups + semi-join)               # shuffle 1
        -> duplicated-window filter: drop docs where more than  # digest
           half the 8-token windows recur in the corpus           shuffles
           (window-less short docs carry no evidence: kept)
        -> CCNet perplexity buckets per lang, drop the 'tail'   # LM + scan
        -> deterministic global shuffle order (seeded md5 rank) # sort scan

    -> (doc_id, lang, lm_score_e6, bucket, pos)."""
    import pyarrow.compute as pc

    from pero_ocr_ray.functions.ccnet import perplexity_buckets
    from pero_ocr_ray.functions.join import hash_join
    from pero_ocr_ray.functions.shuffle import global_shuffle_positions
    from pero_ocr_ray.functions.spandedup import dup_window_stats

    # phase checkpoint (CLAUDE.md composition gotcha): survivors feed both
    # the window-stats chain and the semi-join left side
    from pero_ocr_ray.util import shuffle_partitions
    survivors = (exact_dedup(documents)
                 .repartition(shuffle_partitions()).materialize())

    # keep-ids SEMI-join, not a drop-ids anti-join: with include_empty the
    # keep set covers every surviving doc (dense, never empty), which is
    # the composition-safe shape — a drop side is usually tiny/empty and
    # starves hash partitions (CLAUDE.md join gotcha)
    def keep_only(t):
        mask = pc.less_equal(pc.multiply(t.column("n_dup_windows"), 2),
                             t.column("n_windows"))
        import pyarrow as pa
        return pa.table({"keep_id": t.filter(mask).column("doc_id")})

    import pyarrow as pa
    sentinel = rd.from_arrow(pa.table({"keep_id": pa.array([-1],
                                                           pa.int64())}))
    # the sentinel keeps the join's right side non-empty even when the
    # window filter drops every doc (degenerate all-boilerplate corpus);
    # -1 never matches a doc_id
    keep_ids = (dup_window_stats(survivors, w=8, include_empty=True)
                .map_batches(keep_only, batch_format="pyarrow")
                .union(sentinel)
                .repartition(shuffle_partitions()))
    kept = hash_join(survivors, keep_ids, on="doc_id", right_on="keep_id")
    pb = perplexity_buckets(kept, vocab_size=vocab_size)
    head_mid = pb.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("bucket"), "tail")),
        batch_format="pyarrow")
    return global_shuffle_positions(head_mid, seed=42)


def export_curated(curated: rd.Dataset, path: str,
                   partition_cols: list[str] | None = None) -> None:
    """Write the curated corpus as hive-partitioned parquet (default: one
    directory per ``lang``) — the resumable-output layout: a failed
    training-prep run re-exports only the partitions it is missing, and
    per-lang consumers read their slice with partition pruning instead of
    scanning the corpus."""
    curated.write_parquet(path, partition_cols=partition_cols or ["lang"])


def read_curated(path: str, langs: list[str] | None = None) -> rd.Dataset:
    """Read back an :func:`export_curated` tree; ``langs`` prunes whole
    partition directories at the PATH level (files of other langs are
    never opened)."""
    if langs is None:
        return rd.read_parquet(path)
    from ray.data.datasource.partitioning import PathPartitionFilter

    wanted = frozenset(langs)
    pf = PathPartitionFilter.of(
        lambda kv: kv.get("lang") in wanted, style="hive",
        base_dir=path)
    return rd.read_parquet(path, partition_filter=pf)


def training_corpus_stats_v3(pdocs: rd.Dataset, lang_ds: rd.Dataset,
                             bench_texts: list[str],
                             **kwargs) -> rd.Dataset:
    """-> (lang, n_docs, sum_tokens, sum_dropped_paras) over the
    :func:`curate_v3` corpus — the web-chain correctness surface."""
    curated = curate_v3(pdocs, lang_ds, bench_texts, **kwargs)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("lang", as_index=False)
                  .agg(n_partial=("doc_id", "size"),
                       tok_partial=("n_tokens", "sum"),
                       drop_partial=("n_dropped", "sum")))

    agg = (curated.map_batches(partial, batch_format="pandas")
           .groupby("lang").aggregate(
               Sum("n_partial", alias_name="n_docs"),
               Sum("tok_partial", alias_name="sum_tokens"),
               Sum("drop_partial", alias_name="sum_dropped_paras")))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": df["lang"],
            "n_docs": df["n_docs"].astype("int64"),
            "sum_tokens": df["sum_tokens"].astype("int64"),
            "sum_dropped_paras": df["sum_dropped_paras"].astype("int64"),
        })

    return agg.map_batches(finalize, batch_format="pandas")


def quality_funnel(documents: rd.Dataset,
                   concurrency: int = 2) -> rd.Dataset:
    """The round-5 quality-filtering funnel as ONE zero-shuffle stream:

        documents
          └─ Gopher document rules  (functions/gopher.py)     # narrow
          └─ C4 line filter + doc reassembly (linefilter.py)  # narrow
          └─ hashed linear classifier (classifier.py)         # narrow

    Every stage is row-local, so the funnel is a pure pipelined map chain
    — at 100 TB it streams with zero exchanges and drops payload bytes as
    early as possible (Gopher rejects never reach the line filter; C4
    rejects never reach the classifier; the classifier scores CLEANED
    text). Returns survivors only: (doc_id, n_tokens, clf_score).

    The whole composition is value-hash checked against one stacked-CTE
    DuckDB query (`quality_funnel` oracle) — composition correctness on
    top of the three per-stage oracles. The line-filter stage runs the
    gate configuration (8-word synthesized lines, no terminal-punct rule,
    banned word 'spark') because the corpus is flat single-line text; on
    real crawl text call the stages directly with C4 defaults.
    """
    import pyarrow as pa

    from pero_ocr_ray.functions.classifier import classify_docs
    from pero_ocr_ray.functions.gopher import _flags_frame
    from pero_ocr_ray.functions.linefilter import (line_filter_docs,
                                                   synthesize_lines)

    def gopher_keep(df: pd.DataFrame) -> pd.DataFrame:
        ok = _flags_frame(df)["pass_gopher"].to_numpy() == 1
        return df.loc[ok, ["doc_id", "text"]]

    s1 = documents.map_batches(gopher_keep, batch_format="pandas")
    c4 = line_filter_docs(synthesize_lines(s1),
                          require_terminal_punct=False, banned=("spark",))

    def c4_keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        kept = t.filter(pc.equal(t.column("pass_c4"), 1))
        return pa.table({"doc_id": kept.column("doc_id"),
                         "text": kept.column("text_clean")})

    s2 = c4.map_batches(c4_keep, batch_format="pyarrow")
    clf = classify_docs(s2, concurrency=concurrency)

    def clf_keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        kept = t.filter(pc.equal(t.column("keep_doc"), 1))
        return kept.select(["doc_id", "n_tokens", "clf_score"])

    return clf.map_batches(clf_keep, batch_format="pyarrow")
