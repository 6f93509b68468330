"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline over pages synthesized
deterministically from the sf0.001 ``documents`` table. ``queries()`` maps
operator names (SURVEY.md §2 + training-data ops) to callables over an
``sf_dir``; ``oracle_sql()`` gives DuckDB-equivalent SQL where the operator
is SQL-expressible (extraction byte-identity is additionally enforced by
``python -m pytest`` against the sequential oracle — see tests/).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# Ray workers inherit env, not sys.path: make the package importable there.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import pyarrow.parquet as pq  # noqa: E402

import ray.data as rd  # noqa: E402


def _read_pq(path, columns=None, **kwargs):
    """``rd.read_parquet`` with an explicit metadata-free schema. The
    driver-written testdata tables carry pandas schema metadata, which
    makes ``hash(schema)`` raise — every read/shuffle task then logs
    "Failed to hash the schemas (for deduplication)" and skips schema
    dedup. Passing the footer schema (projected to ``columns``, metadata
    removed) makes every block clean at the source; one footer read on
    the driver, no extra pipeline stage."""
    import pyarrow as pa
    full = pq.read_schema(path).remove_metadata()
    schema = (pa.schema([full.field(c) for c in columns])
              if columns else full)
    return rd.read_parquet(path, columns=columns, schema=schema, **kwargs)


_PAGES_CACHE: dict[tuple[str, str], Any] = {}


def _pages(sf_dir: str, template: str):
    from pero_ocr_ray.sources.pages import pages_from_documents
    key = (sf_dir, template)
    pages = _PAGES_CACHE.get(key)
    if pages is None:
        docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
        pages = pages_from_documents(docs, template)
        _PAGES_CACHE[key] = pages
    # from_arrow yields one block; split so the parse actor pool has work
    return rd.from_arrow(pages).repartition(max(2, pages.num_rows // 64))


def _query_pool() -> int:
    """Pool size for query-path pipelines: a quarter of the cluster.

    Queries like merge_best compose TWO actor-pool pipelines feeding a
    groupby; pools sized above cpus//4 can reserve every CPU and starve the
    shuffle tasks (observed deadlocks at 4 and 8 cpus)."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(1, min(2, cpus // 4))


def _extract(sf_dir: str, template: str, mode: str = "fused"):
    from pero_ocr_ray.pipelines.extract import extract_pipeline
    return extract_pipeline(_pages(sf_dir, template), mode=mode,
                            concurrency=_query_pool())


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (full case catalog)."""
    return _extract("/root/testdata/sf0.001", "cases")


# ---------------------------------------------------------------------------


def _q_extract_simple(sf_dir: str):
    return _extract(sf_dir, "simple").select_columns(["url", "extracted_text"])


def _q_extract_simple_metrics(sf_dir: str):
    import pyarrow as pa

    def project(t: pa.Table) -> pa.Table:
        m = t.column("metrics")
        return pa.table({
            "url": t.column("url"),
            "blocks_kept": m.combine_chunks().field("blocks_kept"),
            "chars_emitted": m.combine_chunks().field("chars_emitted"),
        })
    return _extract(sf_dir, "simple").map_batches(project, batch_format="pyarrow")


def _q_extract_cases(sf_dir: str):
    """Full case-catalog extraction, golden-fixture-oracled: the oracle is
    a sequential single-process replay through the SAME kernels
    (tools/make_cases_fixture.py -> tests/golden/cases_oracle.parquet,
    keyed by corpus_len), the reference's golden-output E2E strategy
    (/root/reference/test/processing_test.sh:83-124). The gate therefore
    verifies the distributed scheduling/assembly byte-for-byte (text via
    md5) against ground truth."""
    import hashlib

    import pyarrow as pa

    def project(t: pa.Table) -> pa.Table:
        m = t.column("metrics").combine_chunks()
        return pa.table({
            "url": t.column("url"),
            "payload_kind": t.column("payload_kind"),
            "blocks_kept": m.field("blocks_kept"),
            "blocks_dropped": m.field("blocks_dropped"),
            "chars_emitted": m.field("chars_emitted"),
            "text_md5": pa.array(
                [hashlib.md5(x.encode("utf-8")).hexdigest()
                 for x in t.column("extracted_text").to_pylist()],
                pa.string()),
        })
    return _extract(sf_dir, "cases").map_batches(project, batch_format="pyarrow")


def _q_extract_staged(sf_dir: str):
    return (_extract(sf_dir, "simple", mode="staged")
            .select_columns(["url", "extracted_text"]))


def _q_dedup_pages(sf_dir: str):
    """Url dedup keep-latest over pages with injected duplicates
    (hash-checked: the oracle predicts the surviving row_id per url)."""
    import pyarrow as pa
    from pero_ocr_ray.pipelines.extract import dedup_pages
    from pero_ocr_ray.sources.pages import pages_from_documents
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    base = pages_from_documents(docs, "simple")
    # duplicate every 10th row with a later warc_ts (the dup must win)
    import numpy as np
    import pyarrow.compute as pc
    rid_np = base.column("row_id").to_numpy()
    dups = base.filter(pa.array(rid_np % 10 == 0))
    later = pc.add(dups.column("warc_ts"), pa.scalar(10_000_000, pa.duration("us")))
    dups = dups.set_column(dups.column_names.index("warc_ts"), "warc_ts", later)
    rid = pc.add(dups.column("row_id"), pa.scalar(1_000_000, pa.int64()))
    dups = dups.set_column(dups.column_names.index("row_id"), "row_id", rid)
    both = pa.concat_tables([base, dups])
    return (dedup_pages(rd.from_arrow(both))
            .select_columns(["url", "row_id"]))


def _q_merge_best(sf_dir: str):
    """N-way merge (J2): two full extraction pipelines over the same url
    set — engine B sees text doubled for even doc_ids (B must win) and
    vowel-stripped for odd ones (A must win) — union + one url-keyed
    groupby picks max chars with engine-order tie-break. SQL replays the
    choice per url. (Stripped texts stay above page_min_chars at every sf,
    so no page-drop divergence: min stripped length 31 > 25.)"""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pero_ocr_ray.pipelines.extract import extract_pipeline
    from pero_ocr_ray.pipelines.merge import merge_results
    from pero_ocr_ray.sources.pages import pages_from_documents
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    txt = docs.column("text")
    doubled = pc.binary_join_element_wise(txt, txt, pa.scalar(" "))
    stripped = pc.replace_substring_regex(txt, "[aeiou]", "")
    even = pc.equal(pc.bit_wise_and(docs.column("doc_id"), 1), 0)
    docs_b = docs.set_column(docs.column_names.index("text"), "text",
                             pc.if_else(even, doubled, stripped))
    pages_b = pages_from_documents(docs_b, "simple")
    a = _extract(sf_dir, "simple").select_columns(["url", "extracted_text"])
    b = extract_pipeline(
        rd.from_arrow(pages_b).repartition(max(2, pages_b.num_rows // 64)),
        concurrency=_query_pool()).select_columns(["url", "extracted_text"])
    return merge_results([a, b])


def _docs(sf_dir: str, columns: list[str] | None = None):
    # prune at the read: only the columns the operator touches leave storage
    return _read_pq(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns or ["doc_id", "text"])


def _q_token_counts(sf_dir: str):
    from pero_ocr_ray.functions.textstats import token_counts
    return token_counts(_docs(sf_dir))


def _q_top_tokens(sf_dir: str):
    """Corpus-wide top-50 tokens: per-batch value-count partials ->
    groupby Sum -> distributed top-k (never a vocabulary-wide sort)."""
    from pero_ocr_ray.functions.textstats import top_tokens
    return top_tokens(_docs(sf_dir), k=50)


def _q_stratified_sample(sf_dir: str):
    """Deterministic hash-based stratified sampling: keep 100 permille of
    'en' docs, 500 of 'de', all others default 250 — the SQL oracle
    evaluates the identical md5 permille predicate."""
    from pero_ocr_ray.functions.sampling import stratified_sample
    docs = _read_pq(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang"])
    return stratified_sample(docs, {"en": 100, "de": 500},
                             default_permille=250)


def _q_domain_counts(sf_dir: str):
    """Pages per host over the simple pages corpus (combiner partials +
    tiny groupby); the oracle extracts hosts with the identical regex."""
    from pero_ocr_ray.functions.domains import domain_counts
    return domain_counts(_pages(sf_dir, "simple"))


def _q_domain_cap(sf_dir: str):
    """Domain diversity cap: at most 3 docs per host, smallest doc_ids win
    (one host-keyed shuffle; SQL mirror = row_number <= 3)."""
    from pero_ocr_ray.functions.domains import cap_per_domain
    docs = _read_pq(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang"])
    import pandas as pd

    def add_url(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["url"] = ("https://site" + (df["doc_id"] % 97).astype(str)
                     + ".example/d/" + df["doc_id"].astype(str))
        return df

    with_urls = docs.map_batches(add_url, batch_format="pandas")
    return (cap_per_domain(with_urls, cap=3)
            .select_columns(["doc_id", "url", "lang"]))


def _q_redact_pii(sf_dir: str):
    """PII redaction over documents with synthetic PII appended to every
    5th doc (emails/phones/IPs); the oracle replays the identical
    regexp_replace chain in the same category order."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pero_ocr_ray.functions.pii import redact_pii
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    did = tbl.column("doc_id")
    inject = pc.binary_join_element_wise(
        pa.scalar(" contact user"), pc.cast(did, pa.string()),
        pa.scalar("@example.com or call +1 (555) 123-4567 from 10.0.0.1"),
        pa.scalar(""))
    did_np = did.to_numpy()
    newtext = pc.if_else(
        pa.array(did_np % 5 == 0),
        pc.binary_join_element_wise(tbl.column("text"), inject, pa.scalar("")),
        tbl.column("text"))
    tbl = tbl.set_column(tbl.column_names.index("text"), "text", newtext)
    return redact_pii(rd.from_arrow(tbl))


def _q_repetition_stats(sf_dir: str):
    """Gopher-style repetition signals (duplicate-word and top-bigram
    fractions, exact integer fixed-point)."""
    from pero_ocr_ray.functions.pii import repetition_stats
    return repetition_stats(_docs(sf_dir))


def _q_subword_counts(sf_dir: str):
    from pero_ocr_ray.functions.textstats import subword_token_counts
    return subword_token_counts(_docs(sf_dir))


def _q_bpe_counts(sf_dir: str):
    """REAL merges-table BPE subword budget (round-5): canonical GPT-2
    style encoding under the fixture tokenizer (kernels/bpe.py)."""
    from pero_ocr_ray.functions.textstats import bpe_doc_counts
    return bpe_doc_counts(_docs(sf_dir))


def _q_filter_agreement(sf_dir: str):
    """Classifier-vs-Gopher 2x2 agreement matrix (filter calibration):
    one fused streaming pass + a <=4-key combiner groupby."""
    from pero_ocr_ray.functions.gopher import filter_agreement
    return filter_agreement(_docs(sf_dir))


def _q_bpe_fertility(sf_dir: str):
    """Tokenizer fertility per language (BPE subwords per word), the
    standard multilingual-vocab health metric, as the exact integer
    micro-ratio. Per-doc BPE counts with lang carried -> combiner
    partials -> one tiny groupby(lang)."""
    from pero_ocr_ray.functions.textstats import bpe_fertility_by_lang
    return bpe_fertility_by_lang(_docs(sf_dir, ["doc_id", "text", "lang"]))


def _q_quality(sf_dir: str):
    from pero_ocr_ray.functions.textstats import quality_scores
    return quality_scores(_docs(sf_dir))


def _q_gopher(sf_dir: str):
    """Gopher-rules pre-filter (Rae et al. 2021 A1.1): integer features +
    all-integer composite pass flag; pure streaming map, zero shuffle."""
    from pero_ocr_ray.functions.gopher import gopher_flags
    return gopher_flags(_docs(sf_dir))


def _q_c4_line_filter(sf_dir: str):
    """C4-style line filter + doc reassembly (Raffel et al. 2020 §2.2).
    The gate corpus is single-line, so both engines first apply the shared
    deterministic line synthesis (8 words/line; SQL mirror in `_c4_sql`);
    the terminal-punct rule is off (the corpus carries no punctuation) and
    the line-level ban word is 'spark' (present in the corpus) so the
    filter is exercised non-degenerately. Zero shuffle end-to-end."""
    from pero_ocr_ray.functions.linefilter import (line_filter_docs,
                                                   synthesize_lines)
    return line_filter_docs(synthesize_lines(_docs(sf_dir)),
                            require_terminal_punct=False, banned=("spark",))


def _q_classifier(sf_dir: str):
    """fastText-style hashed linear quality classifier: bounded weight
    vector broadcast once (ray.put), hashed-unigram lookup + integer doc
    score per batch; zero shuffle. The gate model is the deterministic
    md5-derived head so the SQL mirror recomputes identical weights."""
    from pero_ocr_ray.functions.classifier import classify_docs
    return classify_docs(_docs(sf_dir))


def _q_quality_funnel(sf_dir: str):
    """Gopher rules -> C4 line filter -> hashed classifier, composed as
    one zero-shuffle stream; survivors only. Whole-chain stacked-CTE SQL
    oracle (composition correctness on top of the per-stage oracles)."""
    from pero_ocr_ray.pipelines.training_data import quality_funnel
    return quality_funnel(_docs(sf_dir))


def _q_host_quality(sf_dir: str):
    """Crawl -> trust-list chain: extraction -> hashed classifier (url
    carried through the scoring pool, no doc_id join) -> per-host
    mean-quality decision (`domains.host_quality`). The host exchange
    moves per-host (n, sum) partials only — the standard spam-farm
    blocklist rollup (a host whose average page quality is negative is
    dropped wholesale). Whole-chain stacked-CTE SQL oracle."""
    import pyarrow as pa
    from pero_ocr_ray.functions.classifier import classify_docs
    from pero_ocr_ray.functions.domains import host_quality

    def to_docs(t: pa.Table) -> pa.Table:
        import numpy as np
        urls = t.column("url").to_pylist()
        # simple-template urls carry the doc_id as the path tail
        # (sources/pages.py closed form) — parsed, not joined
        ids = np.fromiter((int(u.rsplit("/", 1)[1]) for u in urls),
                          np.int64, len(urls))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": t.column("extracted_text"),
            "url": t.column("url"),
        })

    ext = _extract(sf_dir, "simple").map_batches(
        to_docs, batch_format="pyarrow")
    scored = classify_docs(ext, carry_cols=("url",))
    return host_quality(scored)


def _q_quality_upsample(sf_dir: str):
    """Quality-weighted epoch plan: classifier scores -> per-tier copy
    counts (2x for mean >= 500 milli, 1x for non-negative, drop the
    rest) with seeded md5 order keys. Zero shuffle end-to-end: the
    classifier pool streams into the row-expansion map."""
    from pero_ocr_ray.functions.classifier import classify_docs
    from pero_ocr_ray.functions.sampling import quality_upsample
    return quality_upsample(classify_docs(_docs(sf_dir)))


def _q_bitext_pairs(sf_dir: str):
    """Bitext mining (CCMatrix mutual-best shape, exact-integer core):
    embeddings quantized to int32 blobs (floor(x*2^12) — bit-exact in
    both engines), lang attached by a native join (binary payload, no
    list<> through Acero), then the pair-grid sweep + two bucketed
    reductions from functions/bitext.py. No broadcast, no take_all."""
    import os as _os
    from pero_ocr_ray.functions.bitext import mine_bitext, quantize_pack
    from pero_ocr_ray.functions.join import hash_join
    emb = rd.read_parquet(_os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    langs = _docs(sf_dir, ["doc_id", "lang"])
    joined = hash_join(quantize_pack(emb), langs,
                       on="vec_id", right_on="doc_id")
    return mine_bitext(joined, src_lang="en", tgt_lang="de")


def _q_bitext_margin(sf_dir: str):
    """Ratio-margin bitext mining (Artetxe & Schwenk 2019), float-free:
    mutual-best pairs kept iff dot * 2k * 1000 >= 1200 * (top-k fwd sum
    + top-k bwd sum) — the cross-multiplied margin >= 1.2 rule. Top-k
    sums reduce exactly from per-shard top-ks; sums attach to pairs via
    two bucketed tag/union merges of id+score rows."""
    import os as _os
    from pero_ocr_ray.functions.bitext import mine_bitext, quantize_pack
    from pero_ocr_ray.functions.join import hash_join
    emb = rd.read_parquet(_os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    langs = _docs(sf_dir, ["doc_id", "lang"])
    joined = hash_join(quantize_pack(emb), langs,
                       on="vec_id", right_on="doc_id")
    return mine_bitext(joined, src_lang="en", tgt_lang="de",
                       margin_k=4, margin_thr_milli=1200)


def _q_perplexity_buckets_hist(sf_dir: str):
    """The zero-sort CCNet split (histogram bin-thresholds): one bounded
    (lang, bin) combiner histogram, driver computes |langs| threshold
    pairs, broadcast assign pass. The 100-TB shape the exact-NTILE
    variant's docstring trades against — both are oracled."""
    from pero_ocr_ray.functions.ccnet import perplexity_buckets_histogram
    return perplexity_buckets_histogram(
        _docs(sf_dir, ["doc_id", "text", "lang"]), vocab_size=4096)


def _q_dsir_scores(sf_dir: str):
    """DSIR importance resampling (arXiv:2302.03169): hashed-unigram
    log-likelihood ratio of target (source='src0') vs raw corpus,
    micro-nat quantized per bucket before summation. One bounded
    combiner histogram + one broadcast scoring pass."""
    from pero_ocr_ray.functions.dsir import dsir_scores
    return dsir_scores(_docs(sf_dir, ["doc_id", "text", "source"]))


def _q_weighted_sample(sf_dir: str):
    """Exact weighted sampling by token mass: k seeded md5 positions
    over the corpus token line (inversion sampling), credited via the
    frozen-block prefix-sum scan — one sort, metadata-only driver
    traffic, streaming searchsorted assignment."""
    from pero_ocr_ray.functions.sampling import weighted_token_sample
    return weighted_token_sample(_docs(sf_dir, ["doc_id", "text"]),
                                 k=200)


def _q_validate_corpus(sf_dir: str):
    """Corpus expectation monitors: per-rule violation counts in one
    streaming pass (rule partials on the exchange, never documents) +
    the dup-id combiner groupby. Rule list and SQL mirror share one
    definition (functions/validate.py)."""
    from pero_ocr_ray.functions.validate import validate_corpus
    return validate_corpus(
        _docs(sf_dir, ["doc_id", "text", "lang", "n_chars"]))


def _q_temperature_sample(sf_dir: str):
    """Temperature-0.5 language rebalancing (Conneau & Lample 2019/mT5):
    per-lang quota floor(sqrt(n)), selection by seeded md5 rank. Two
    bounded exchanges: a one-row-per-lang count and a candidates-only
    top-k (each block forwards at most quota rows per lang)."""
    from pero_ocr_ray.functions.sampling import temperature_sample
    return temperature_sample(_docs(sf_dir, ["doc_id", "text", "lang"]))


def _q_mixed_stream(sf_dir: str):
    """Proportional source interleaving (T5/Pile mixture schedule):
    per-source seeded rank -> exact integer midpoint key -> one global
    order; two sorts + metadata-only driver traffic (see mixing.py)."""
    from pero_ocr_ray.functions.mixing import interleave_positions
    return interleave_positions(
        _docs(sf_dir, ["doc_id", "source"]))


def _q_content_hash(sf_dir: str):
    from pero_ocr_ray.functions.textstats import content_hashes
    return content_hashes(_docs(sf_dir))


def _q_lang_id(sf_dir: str):
    from pero_ocr_ray.functions.textstats import lang_ids
    return lang_ids(_docs(sf_dir))  # doc_id+text only


def _q_fingerprints(sf_dir: str):
    from pero_ocr_ray.functions.textstats import fingerprints
    return fingerprints(_docs(sf_dir))


def _q_dedup_exact(sf_dir: str):
    from pero_ocr_ray.functions.dedup import exact_dedup_groups
    return exact_dedup_groups(_docs(sf_dir))


def _q_minhash_pairs(sf_dir: str):
    from pero_ocr_ray.functions.dedup import minhash_near_dup_pairs
    return minhash_near_dup_pairs(_docs(sf_dir), threshold=0.7)


def _q_jaccard_pairs(sf_dir: str):
    """EXACT n-gram Jaccard near-dup pairs (LSH candidates + exact shingle
    verify). Near-dups injected deterministically (docs 0..9 duplicated
    with a 3-word tail) so the pair set is non-empty; the DuckDB oracle
    recomputes exact trigram Jaccard from scratch."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pero_ocr_ray.functions.dedup import jaccard_near_dup_pairs
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    head = tbl.filter(pc.less(tbl.column("doc_id"), 10))
    mod = pc.binary_join_element_wise(
        head.column("text"), pa.scalar(" extra tail words"), pa.scalar(""))
    dups = pa.table({"doc_id": pc.add(head.column("doc_id"),
                                      pa.scalar(1_000_000, pa.int64())),
                     "text": mod})
    both = pa.concat_tables([tbl, dups])
    return jaccard_near_dup_pairs(rd.from_arrow(both), threshold=0.6)


def _bench_texts(sf_dir: str) -> list[str]:
    """Deterministic stand-in eval benchmark: every 41st document. Bounded
    by nature (eval suites are MBs vs a TB corpus), so a driver-side fetch
    + ``ray.put`` broadcast is the right scale shape — never a shuffle
    side. Order-independence: the consumer builds a SET of shingle hashes."""
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    import pyarrow as pa
    mask = pa.array(tbl.column("doc_id").to_numpy() % 41 == 0)
    return tbl.filter(mask).column("text").to_pylist()


def _q_contamination(sf_dir: str):
    """Per-doc distinct-trigram overlap with the benchmark set; the DuckDB
    oracle rebuilds the counts from the n-gram STRINGS from scratch (hash
    membership == string membership up to md5-64 collisions)."""
    from pero_ocr_ray.functions.contamination import ngram_contamination
    return ngram_contamination(_docs(sf_dir), _bench_texts(sf_dir), n=3)


def _q_decontaminate(sf_dir: str):
    """Corpus docs surviving drop-any-overlap decontamination (benchmark
    docs drop themselves — they fully overlap the set they define)."""
    from pero_ocr_ray.functions.contamination import decontaminate
    out = decontaminate(_docs(sf_dir), _bench_texts(sf_dir), n=3)
    return out.select_columns(["doc_id"])


def _q_decontaminate_spans(sf_dir: str):
    """Surgical decontamination: contaminated n-gram spans removed,
    documents kept. Broadcast benchmark shingle set, one streaming pass,
    zero shuffle; both engines rebuild the identical kept-token string."""
    from pero_ocr_ray.functions.contamination import decontaminate_spans
    return decontaminate_spans(_docs(sf_dir), _bench_texts(sf_dir), n=3)


def _para_docs(sf_dir: str):
    """Documents re-chunked into 10-token paragraphs, with a boilerplate
    paragraph (cookie banner) prepended to every 7th doc — deterministic
    paragraph structure + corpus-wide duplication injected the way
    _q_jaccard_pairs injects near-dups (the synthetic docs are single-line).
    Token split is the ASCII TOKEN_RE convention, mirrored by \\S+ in RE2."""
    import pyarrow as pa

    def chunk(t: pa.Table) -> pa.Table:
        ids, texts = [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            toks = (text or "").split()
            if not toks:  # SQL's per-token unnest drops token-less docs
                continue
            paras = [" ".join(toks[i:i + 10])
                     for i in range(0, len(toks), 10)]
            if did % 7 == 0:
                paras.insert(0, "please accept all cookies to continue")
            ids.append(did)
            texts.append("\n\n".join(paras))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return _docs(sf_dir).map_batches(chunk, batch_format="pyarrow")


def _q_paragraph_dedup(sf_dir: str):
    """Docs rebuilt from globally-deduplicated paragraphs (CCNet-style
    boilerplate removal); first occurrence by (doc_id, idx) survives."""
    from pero_ocr_ray.functions.paragraphs import paragraph_dedup
    return paragraph_dedup(_para_docs(sf_dir), min_copies=2)


def _q_duplicate_paragraphs(sf_dir: str):
    """Corpus-duplicated-paragraph census (hash, copies, winner doc)."""
    from pero_ocr_ray.functions.paragraphs import duplicate_paragraph_stats
    return duplicate_paragraph_stats(_para_docs(sf_dir), min_copies=2)


def _q_inverted_index(sf_dir: str):
    """Inverted token index (stats for every token, posting lists for the
    rare set). A per-doc rare token ``tag<doc_id % 250>`` is injected so
    the posting path has coverage at every sf (the synthetic vocabulary is
    all-common otherwise); SQL mirrors the injection."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pero_ocr_ray.functions.index import inverted_index

    def tag(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        suffix = pa.array([f" tag{i % 250}" for i in ids], pa.string())
        return pa.table({
            "doc_id": t.column("doc_id"),
            "text": pc.binary_join_element_wise(t.column("text"), suffix,
                                                pa.scalar("")),
        })

    docs = _docs(sf_dir).map_batches(tag, batch_format="pyarrow")
    return inverted_index(docs, max_df=32)


def _q_docs_above_lang_median(sf_dir: str):
    """Derived-threshold filter: per-lang discrete median token count
    (hot-key-safe histogram), broadcast back, strictly-above filter."""
    from pero_ocr_ray.functions.relational import docs_above_lang_median
    return docs_above_lang_median(
        _docs(sf_dir, ["doc_id", "text", "lang"]))


def _q_token_budget_cut(sf_dir: str):
    """Per-lang token-budget cap via the distributed prefix-sum (scan)
    composition; inclusive running total <= 1500 tokens per lang."""
    from pero_ocr_ray.functions.budget import token_budget_cut
    return token_budget_cut(_docs(sf_dir, ["doc_id", "text", "lang"]),
                            default_budget=1500)


def _q_training_chunks(sf_dir: str):
    """Overlapping fixed-token-window chunking (tokenizer prep)."""
    from pero_ocr_ray.functions.chunking import chunk_for_training
    return chunk_for_training(_docs(sf_dir), chunk_tokens=64, overlap=8)


def _q_normalize_text(sf_dir: str):
    """C4-style normalization chain (control strip, quote/dash fold,
    ws collapse, trim) — pure streaming map; the oracle SQL nests the
    SAME ordered rule list (built from NORMALIZE_RULES, one source of
    truth)."""
    from pero_ocr_ray.functions.textstats import normalize_text
    return normalize_text(_docs(sf_dir))


def _normalize_sql() -> str:
    from pero_ocr_ray.functions.textstats import NORMALIZE_RULES
    expr = "text"
    for p, r in NORMALIZE_RULES:
        pe, re_ = p.replace("'", "''"), r.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pe}', '{re_}', 'g')"
    return (f"SELECT doc_id, {expr} AS norm_text, "
            f"CAST(length(text) - length({expr}) AS BIGINT) "
            f"AS n_chars_removed FROM documents")


def _q_pack_sequences(sf_dir: str):
    """Greedy fixed-capacity sequence packing of the training chunks;
    sequential per bucket (the only honest shape for a running-fill
    recurrence), parallel across buckets. Oracled by a recursive CTE
    replaying the same recurrence."""
    from pero_ocr_ray.functions.chunking import (chunk_for_training,
                                                 pack_sequences)
    return pack_sequences(chunk_for_training(_docs(sf_dir),
                                             chunk_tokens=64, overlap=8),
                          capacity=256, num_buckets=8)


def _q_doc_tfidf_topk(sf_dir: str):
    """Top-5 TF-IDF keywords per doc: combiner df + partitioned hash join
    + bucketed per-doc top-k (integer-score ranking, token tie-break)."""
    from pero_ocr_ray.functions.tfidf import doc_tfidf_topk
    return doc_tfidf_topk(_docs(sf_dir), k=5)


def _q_doc_lm_score(sf_dir: str):
    """CCNet-style corpus-LM scoring: bounded top-4096 unigram vocab
    trained distributed, broadcast once, zero-shuffle per-doc scoring in
    exact int64 micro-nats."""
    from pero_ocr_ray.functions.tfidf import doc_lm_score
    return doc_lm_score(_docs(sf_dir), vocab_size=4096)


def _q_near_dup_clusters(sf_dir: str):
    """Transitive near-dup clusters: MinHash-LSH pairs -> distributed
    min-label propagation. The oracle recomputes the same pair set in SQL
    (the minhash mirror) and closes it with a recursive CTE."""
    from pero_ocr_ray.functions.dedup import near_dup_clusters
    return near_dup_clusters(_docs(sf_dir), threshold=0.7)


def _q_cluster_reps(sf_dir: str):
    """Keep-best-copy curation: near-dup clusters x classifier scores ->
    the highest-quality member per cluster (tie: smaller doc_id). One
    native join + a bucketed vectorized argmax; the oracle composes the
    recursive-CTE closure with the classifier CTE."""
    from pero_ocr_ray.functions.classifier import classify_docs
    from pero_ocr_ray.functions.dedup import (cluster_representatives,
                                              near_dup_clusters)
    clusters = near_dup_clusters(_docs(sf_dir), threshold=0.7)
    scored = classify_docs(_docs(sf_dir)) \
        .select_columns(["doc_id", "clf_score"])
    return cluster_representatives(clusters, scored)


def _q_orders_per_segment(sf_dir: str):
    """Salted grouped join (hot-key-safe equi-join): orders joined to
    customer on custkey with the right side replicated across salt
    buckets, then a per-segment count (partials + tiny groupby)."""
    import pandas as pd
    from ray.data.aggregate import Sum
    from pero_ocr_ray.functions.join import grouped_join_salted
    o = _read_pq(os.path.join(sf_dir, "orders.parquet"),
                        columns=["o_orderkey", "o_custkey"])
    c = _read_pq(os.path.join(sf_dir, "customer.parquet"),
                        columns=["c_custkey", "c_mktsegment"])
    j = grouped_join_salted(o, c, on="o_custkey", right_on="c_custkey",
                            salts=4)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("c_mktsegment", as_index=False).size()
                  .rename(columns={"size": "n_partial"}))

    agg = (j.map_batches(partial, batch_format="pandas")
           .groupby("c_mktsegment")
           .aggregate(Sum("n_partial", alias_name="n_orders")))
    return agg.map_batches(
        lambda df: df.assign(n_orders=df["n_orders"].astype("int64")),
        batch_format="pandas")


def _q_asof_bucketed(sf_dir: str):
    """Hot-key-safe as-of join (two-phase per (key, day) bucketing +
    cross-bucket summary resolution) — must hash-match the SAME SQL oracle
    as the plain asof_purchase_view."""
    import pandas as pd
    from pero_ocr_ray.functions.join import asof_join_bucketed
    ev = _read_pq(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "ts",
                                  "event_type", "value"])

    def only(kind):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.loc[df["event_type"] == kind,
                          ["event_id", "user_id", "ts", "value"]]
        return fn

    purchases = ev.map_batches(only("purchase"), batch_format="pandas")
    views = ev.map_batches(only("view"), batch_format="pandas")
    joined = asof_join_bucketed(purchases, views, key="user_id", ts="ts",
                                right_cols=["value"], bucket_freq="D")

    def project(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "ts": pd.to_datetime(df["ts"]).astype("datetime64[us]"),
            "view_ts": pd.to_datetime(df["ts_right"]).astype("datetime64[us]"),
            # DuckDB ROUND is half-away-from-zero for BOTH signs; pandas
            # .round() is banker's and floor(x*100+0.5) alone diverges at
            # negative exact half-cents (-0.125 -> -12 vs -13), so branch
            # on sign to make the documented equivalence hold everywhere
            "view_value_cents": np.where(
                pd.to_numeric(df["value_right"]).to_numpy() >= 0,
                np.floor(pd.to_numeric(df["value_right"]) * 100 + 0.5),
                np.ceil(pd.to_numeric(df["value_right"]) * 100 - 0.5),
            ).astype("int64"),
        })

    return joined.map_batches(project, batch_format="pandas")


def _q_simhash_sigs(sf_dir: str):
    from pero_ocr_ray.functions.dedup import simhash_signatures
    return simhash_signatures(_docs(sf_dir))


def _q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs (hamming <= 3 via 4-block pigeonhole) over
    documents + injected near-copies; the oracle recomputes signatures,
    block buckets (with the MAX_BUCKET cap) and exact hamming in SQL."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pero_ocr_ray.functions.dedup import simhash_near_dup_pairs
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    head = tbl.filter(pc.less(tbl.column("doc_id"), 10))
    mod = pc.binary_join_element_wise(
        head.column("text"), pa.scalar(" extra tail words"), pa.scalar(""))
    dups = pa.table({"doc_id": pc.add(head.column("doc_id"),
                                      pa.scalar(1_000_000, pa.int64())),
                     "text": mod})
    both = pa.concat_tables([tbl, dups])
    return simhash_near_dup_pairs(rd.from_arrow(both), max_hamming=3)


def _q_knn(sf_dir: str):
    from pero_ocr_ray.functions.similarity import knn_self_queries
    emb = _read_pq(os.path.join(sf_dir, "embeddings.parquet"))
    return knn_self_queries(emb, n_queries=5, top_k=10)


def _q_embedding_near_dup(sf_dir: str):
    """Near-dup pairs; the corpus has none, so inject exact copies of the
    first 10 vectors (vec_id + 1_000_000) — expect exactly those 10 pairs."""
    import numpy as np
    import pyarrow as pa
    from pero_ocr_ray.functions.similarity import embedding_near_dup_pairs
    import pyarrow.compute as pc
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    # filter by id VALUE (the oracle's WHERE vec_id < 10), never by file
    # position — parquet row order is not part of the contract
    head = tbl.filter(pc.less(tbl.column("vec_id"), 10))
    dup_ids = pa.array((head.column("vec_id").to_numpy() + 1_000_000), pa.int64())
    dups = head.set_column(head.column_names.index("vec_id"), "vec_id", dup_ids)
    both = pa.concat_tables([tbl, dups])
    return embedding_near_dup_pairs(rd.from_arrow(both), threshold=0.95)


def _q_events_hourly(sf_dir: str):
    from pero_ocr_ray.functions.windows import tumbling_window_counts
    ev = _read_pq(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "ts"])
    return tumbling_window_counts(ev, "h")


def _q_user_retention(sf_dir: str):
    """Weekly retention cohorts: per-user Min combiners + pair dedup +
    one hash join; the matrix shuffle moves (cohort, offset) partials."""
    from pero_ocr_ray.functions.cohorts import user_retention
    ev = _read_pq(os.path.join(sf_dir, "events.parquet"),
                  columns=["user_id", "ts"])
    return user_retention(ev)


def _q_event_funnel(sf_dir: str):
    """Ordered view->click->purchase funnel; per-step joins shrink
    monotonically, per-user times are Min combiners."""
    from pero_ocr_ray.functions.cohorts import event_funnel
    ev = _read_pq(os.path.join(sf_dir, "events.parquet"),
                  columns=["user_id", "ts", "event_type"])
    return event_funnel(ev)


def _q_q1(sf_dir: str):
    from pero_ocr_ray.functions.relational import pricing_summary
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])
    return pricing_summary(li, "2000-01-01")


def _q_q3(sf_dir: str):
    from pero_ocr_ray.functions.relational import top_orders_by_revenue
    c = _read_pq(os.path.join(sf_dir, "customer.parquet"),
                        columns=["c_custkey", "c_mktsegment"])
    o = _read_pq(os.path.join(sf_dir, "orders.parquet"),
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read_pq(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])
    return top_orders_by_revenue(c, o, li, "BUILDING", "1998-01-01", 10)


def _q_suppliers_per_nation(sf_dir: str):
    from pero_ocr_ray.functions.relational import suppliers_per_nation
    s = _read_pq(os.path.join(sf_dir, "supplier.parquet"))
    n = _read_pq(os.path.join(sf_dir, "nation.parquet"))
    return suppliers_per_nation(s, n)


def _q_lang_counts(sf_dir: str):
    from pero_ocr_ray.functions.relational import lang_counts
    return lang_counts(_docs(sf_dir, ["lang"]))


def _q_token_quantiles(sf_dir: str):
    from pero_ocr_ray.functions.relational import token_quantiles_by_lang
    return token_quantiles_by_lang(_docs(sf_dir, ["lang", "text"]))


def _q_sessionize(sf_dir: str):
    from pero_ocr_ray.functions.windows import sessionize
    ev = _read_pq(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])
    return sessionize(ev, 30)


def _q_sessionize_bucketed(sf_dir: str):
    """Hot-key-safe sessionize (two-phase (user, day) bucketing + boundary
    merge) — must hash-match the same SQL oracle as the plain operator."""
    from pero_ocr_ray.functions.windows import sessionize_bucketed
    ev = _read_pq(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])
    return sessionize_bucketed(ev, 30, "D")


def _q_distinct_brands(sf_dir: str):
    from pero_ocr_ray.functions.relational import distinct_brands
    return distinct_brands(_read_pq(os.path.join(sf_dir, "part.parquet")))


def _q_top_parts(sf_dir: str):
    from pero_ocr_ray.functions.relational import top_parts_by_price
    return top_parts_by_price(_read_pq(os.path.join(sf_dir, "part.parquet")), 5)


def _q_segment_counts(sf_dir: str):
    from pero_ocr_ray.functions.relational import customer_segment_counts
    return customer_segment_counts(
        _read_pq(os.path.join(sf_dir, "customer.parquet")))


def _q_events_sliding(sf_dir: str):
    from pero_ocr_ray.functions.windows import sliding_window_counts
    ev = _read_pq(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "ts"])
    return sliding_window_counts(ev, 2, 1)


def _q_ivf_knn(sf_dir: str):
    """IVF approximate knn. Approximate vs exact knn BY DESIGN (probe
    pruning), but deterministic — the batch-local candidate cut uses the
    total order (sim desc, neighbor_id asc), making per-batch top-k +
    merge partitioning-invariant — so it is golden-fixture-oracled
    against a single-pass sequential scan with the same quantizer
    (tools/make_golden_fixtures.py)."""
    import numpy as np
    from pero_ocr_ray.functions.similarity import ivf_knn
    emb = _read_pq(os.path.join(sf_dir, "embeddings.parquet"))
    import pyarrow.compute as _pc
    head = sorted(emb.map_batches(
                      lambda t: t.filter(_pc.less(t["vec_id"], 5)),
                      batch_format="pyarrow").take_all(),
                  key=lambda r: r["vec_id"])
    queries = np.array([np.asarray(r["embedding"], dtype=np.float64)
                        for r in head])
    return ivf_knn(emb, queries, [int(r["vec_id"]) for r in head],
                   top_k=10, n_lists=8, n_probe=4)


def _q_kmeans_clusters(sf_dir: str):
    """Distributed exact int64 k-means (fixed-point Lloyd; every quantity
    integer, so distributed == sequential replay bit-for-bit). Golden-
    fixture-oracled (tools/make_golden_fixtures.py sequential_kmeans)."""
    from pero_ocr_ray.functions.clustering import kmeans_clusters
    emb = _read_pq(os.path.join(sf_dir, "embeddings.parquet"),
                   columns=["vec_id", "embedding"])
    return kmeans_clusters(emb, k=8, iters=4)


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup (arXiv:2303.09540): exact k-means clusters as blocking
    keys, greedy within-cluster cosine dedup from exact integer dots.
    Golden-fixture-oracled (sequential_semdedup)."""
    from pero_ocr_ray.functions.clustering import semantic_dedup
    emb = _read_pq(os.path.join(sf_dir, "embeddings.parquet"),
                   columns=["vec_id", "embedding"])
    return semantic_dedup(emb, k=8, iters=4)


def _q_extract_lines(sf_dir: str):
    from pero_ocr_ray.stages.extract import explode_lines
    return explode_lines(_extract(sf_dir, "simple"))


def _q_approx_distinct_tokens(sf_dir: str):
    """HLL approximate distinct-token count over documents. Approximate vs
    the TRUE count (<3% unit-tested) but bit-deterministic given the md5
    hash — so the DuckDB oracle rebuilds the 4096 HLL registers from
    scratch in SQL and must land on the same estimate. (sketches_merged is
    the Ray block count — execution detail, not part of the contract.)"""
    import pandas as pd
    from pero_ocr_ray.functions.textstats import approx_distinct
    out = approx_distinct(_docs(sf_dir), "text", tokenize=True)
    return pd.DataFrame({"estimate": pd.Series([out["estimate"]],
                                               dtype="int64")})


def _q_asof_purchase_view(sf_dir: str):
    """As-of join: each purchase event attributed to the user's most recent
    prior (or simultaneous) view event."""
    import pandas as pd
    from pero_ocr_ray.functions.join import asof_join
    ev = _read_pq(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "ts",
                                  "event_type", "value"])

    def only(kind):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.loc[df["event_type"] == kind,
                          ["event_id", "user_id", "ts", "value"]]
        return fn

    purchases = ev.map_batches(only("purchase"), batch_format="pandas")
    views = ev.map_batches(only("view"), batch_format="pandas")
    joined = asof_join(purchases, views, key="user_id", ts="ts",
                       right_cols=["value"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "ts": pd.to_datetime(df["ts"]).astype("datetime64[us]"),
            "view_ts": pd.to_datetime(df["ts_right"]).astype("datetime64[us]"),
            # DuckDB ROUND is half-away-from-zero for BOTH signs; pandas
            # .round() is banker's and floor(x*100+0.5) alone diverges at
            # negative exact half-cents (-0.125 -> -12 vs -13), so branch
            # on sign to make the documented equivalence hold everywhere
            "view_value_cents": np.where(
                pd.to_numeric(df["value_right"]).to_numpy() >= 0,
                np.floor(pd.to_numeric(df["value_right"]) * 100 + 0.5),
                np.ceil(pd.to_numeric(df["value_right"]) * 100 - 0.5),
            ).astype("int64"),
        })

    return joined.map_batches(project, batch_format="pandas")


def _q_warc_extract(sf_dir: str):
    """WARC-native input path: build a deterministic WARC from documents,
    read it with the stdlib WARC source, extract (hash-checked against
    the canonical-text oracle keyed by the WARC urls)."""
    import hashlib
    from pero_ocr_ray.pipelines.extract import extract_pipeline
    from pero_ocr_ray.sources.warc import make_warc
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    recs = []
    import html as html_mod
    import pyarrow.compute as _pc
    first200 = docs.filter(_pc.less(docs.column("doc_id"), 200))
    for did, text in zip(first200.column("doc_id").to_pylist(),
                         first200.column("text").to_pylist()):
        body = (f"<html><body><article><p>{html_mod.escape(text)}</p>"
                f"</article></body></html>").encode()
        recs.append((f"https://warc.example/d/{did}",
                     "2026-01-01T00:00:00Z", body))
    h = hashlib.md5()
    for url, ts, body in recs:  # content-keyed: regenerated testdata with
        h.update(url.encode()); h.update(body)  # the same row count must
    digest = h.hexdigest()[:12]                 # not reuse a stale cache
    path = f"/tmp/pero_warc_{digest}.warc.gz"
    if not os.path.exists(path):
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(make_warc(recs, compress=True))
        os.replace(tmp, path)  # atomic: concurrent runs never see partials
    from pero_ocr_ray.sources.warc import read_warc
    return (extract_pipeline(read_warc(path), concurrency=_query_pool())
            .select_columns(["url", "extracted_text"]))


def _q_refine(sf_dir: str):
    """Dehyphenation refine (A5 sequential-per-doc stage) over
    deterministically line-broken text: every (word, word) pair of ≥2-char
    lowercase words becomes 'word-\\nword'; the stage must rejoin them.
    Construction keeps breaks non-adjacent, so the sequential line merge is
    SQL-expressible as two global regex passes (see oracle)."""
    import pandas as pd
    from pero_ocr_ray.stages.refine import refine

    def to_run(df: pd.DataFrame) -> pd.DataFrame:
        urls = [f"https://site{d % 97}.example/d/{d}" for d in df["doc_id"]]
        broken = df["text"].str.replace(
            r"([a-z]{2,}) ([a-z]{2,})", "\\1-\n\\2", regex=True)
        return pd.DataFrame({"url": urls, "extracted_text": broken})

    run = _docs(sf_dir).map_batches(to_run, batch_format="pandas")
    return (refine(run, concurrency=_query_pool())
            .select_columns(["url", "refined_text"]))


def _q_refine_cases(sf_dir: str):
    """Refine over the full case-catalog extraction, golden-fixture-oracled
    like ``extract_cases``: the sequential replay applies the shared
    ``dehyphenate_text`` kernel to the oracle extraction, so the gate
    checks the distributed extract->refine chain end-to-end (text via
    md5 + exact char count)."""
    import hashlib

    import pyarrow as pa

    from pero_ocr_ray.stages.refine import refine

    def project(t: pa.Table) -> pa.Table:
        texts = t.column("refined_text").to_pylist()
        return pa.table({
            "url": t.column("url"),
            "refined_md5": pa.array(
                [hashlib.md5(x.encode("utf-8")).hexdigest() for x in texts],
                pa.string()),
            "refined_chars": pa.array([len(x) for x in texts], pa.int64()),
        })
    return (refine(_extract(sf_dir, "cases"), concurrency=_query_pool())
            .map_batches(project, batch_format="pyarrow"))


def _q_compare_runs_cer(sf_dir: str):
    """Distributed CER comparison: extraction of the original pages vs a
    vowel-stripped rerun, joined per url by ONE hash shuffle (union +
    groupby(url)) — no driver-side materialization of either run. Returns
    per-url char error counts; DuckDB cross-checks with levenshtein()."""
    import pyarrow.compute as pc
    from pero_ocr_ray.functions.quality import compare_runs
    from pero_ocr_ray.pipelines.extract import extract_pipeline
    from pero_ocr_ray.sources.pages import pages_from_documents
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    stripped = docs.set_column(
        docs.column_names.index("text"), "text",
        pc.replace_substring_regex(docs.column("text"), "[aeiou]", ""))
    pages_b = pages_from_documents(stripped, "simple")
    a = _extract(sf_dir, "simple")
    b = extract_pipeline(
        rd.from_arrow(pages_b).repartition(max(2, pages_b.num_rows // 64)),
        concurrency=_query_pool())
    return (compare_runs(a, b)
            .select_columns(["url", "char_errors", "ref_chars"]))


def _pdf_attach_image(t):
    """Row-deterministic page-image payloads: every third url (by md5 of
    the url) gets a FAKEIMG container -> that row renders as the TWO-LAYER
    reference form. Module-level so tools/make_golden_fixtures.py replays
    the identical logic sequentially."""
    import hashlib
    import pyarrow as pa
    from pero_ocr_ray.stages.multimodal import make_fake_image
    imgs = []
    for url in t.column("url").to_pylist():
        seed = int(hashlib.md5(url.encode()).hexdigest()[:8], 16)
        imgs.append(make_fake_image(16, 12, 3, seed=seed % 251)
                    if seed % 3 == 0 else None)
    return t.append_column("page_image", pa.array(imgs, pa.binary()))


def _pdf_verify(t):
    """Read each PDF back through the engine's own PDF source (sink<->
    source closed loop) and fingerprint the bytes."""
    import hashlib
    import pyarrow as pa
    from pero_ocr_ray.kernels.pdfmini import pdf_blocks
    urls, shas, nb, ok, has_img = [], [], [], [], []
    for url, pdf in zip(t.column("url").to_pylist(),
                        t.column("pdf").to_pylist()):
        blocks, err = pdf_blocks(pdf)
        urls.append(url)
        shas.append(hashlib.md5(pdf).hexdigest())
        nb.append(len(pdf))
        ok.append(err == "" and (bool(blocks) or len(pdf) < 800))
        has_img.append(b"/Subtype /Image" in pdf)
    return pa.table({"url": pa.array(urls, pa.string()),
                     "pdf_md5": pa.array(shas, pa.string()),
                     "n_bytes": pa.array(nb, pa.int64()),
                     "readback_ok": pa.array(ok, pa.bool_()),
                     "has_image_layer": pa.array(has_img, pa.bool_())})


def _q_searchable_pdf(sf_dir: str):
    """Searchable-PDF sink (W8): extraction output rendered to valid PDFs
    — every third url as the TWO-LAYER reference form (page image XObject
    + invisible text, pdf_production.py:64-100 analog, with a
    deterministic FAKEIMG payload seeded per row) — then verified by
    reading each PDF back through the engine's own PDF source and
    counting the embedded image layers. Golden-fixture-oracled: the PDF
    bytes are deterministic, so a sequential replay through the same
    codecs (tools/make_golden_fixtures.py) pins every byte via md5."""
    from pero_ocr_ray.sources.searchable_pdf import searchable_pdf

    pdfs = searchable_pdf(
        _extract(sf_dir, "simple").map_batches(_pdf_attach_image,
                                               batch_format="pyarrow"),
        image_column="page_image")
    return pdfs.map_batches(_pdf_verify, batch_format="pyarrow")


def _q_training_corpus_v2(sf_dir: str):
    """FULL curation chain in one stream — exact dedup, transitive
    near-dup drop (LSH pairs + label propagation, removed via a native
    left_anti join), quality filter, deterministic stratified sample,
    per-lang token+subword budgets — hash-checked against ONE DuckDB
    query that replays every stage (recursive CTE for the clusters)."""
    from pero_ocr_ray.pipelines.training_data import training_corpus_stats_v2
    docs = _read_pq(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text", "lang"])
    return training_corpus_stats_v2(docs, min_tokens=20,
                                    max_stopword_ratio=0.5,
                                    near_dup_threshold=0.7,
                                    rates_permille={"en": 600, "de": 800},
                                    default_permille=700)


def _q_training_corpus_v3(sf_dir: str):
    """Web-corpus curation chain — cross-corpus paragraph dedup
    (boilerplate removal), benchmark decontamination, exact dedup on the
    rebuilt text, narrow lang join, quality filter, per-lang budgets —
    hash-checked against ONE DuckDB query replaying every stage."""
    from pero_ocr_ray.pipelines.training_data import training_corpus_stats_v3
    lang_ds = _read_pq(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "lang"])
    return training_corpus_stats_v3(_para_docs(sf_dir), lang_ds,
                                    _bench_texts(sf_dir))


def _q_training_corpus_stats(sf_dir: str):
    """Composed curation pipeline: exact dedup -> quality filter ->
    per-lang stats in one streaming chain; the oracle replays the whole
    composition in SQL (composition correctness, not just per-op)."""
    from pero_ocr_ray.pipelines.training_data import training_corpus_stats
    docs = _read_pq(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text", "lang"])
    return training_corpus_stats(docs, min_tokens=20,
                                 max_stopword_ratio=0.5)


def _q_select_config(sf_dir: str):
    """select_embed_id analog: evaluate candidate extraction configs on a
    bounded ground-truth sample, report per-candidate CER and the argmin.
    Over the 'simple' template the per-candidate CERs are exact functions
    of the config semantics, so the SQL oracle replays the sweep."""
    import pandas as pd
    from pero_ocr_ray.functions.select_config import select_best_config
    from pero_ocr_ray.kernels.config import ExtractConfig
    from pero_ocr_ray.sources.pages import pages_from_documents
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    pages = pages_from_documents(docs, "simple")
    gt = dict(zip(pages.column("url").to_pylist(),
                  [" ".join(t.split())
                   for t in docs.column("text").to_pylist()]))
    candidates = [ExtractConfig(),
                  ExtractConfig(page_min_chars=10_000),
                  ExtractConfig(score_threshold=-5.0),
                  ExtractConfig(link_weight=2.0)]
    out = select_best_config(rd.from_arrow(pages), gt, candidates,
                             n_clusters=3, sample_n=100,
                             concurrency=_query_pool())
    return pd.DataFrame({
        "candidate": pd.Series(sorted(out["cers"]), dtype="int64"),
        "cer": pd.Series([out["cers"][i] for i in sorted(out["cers"])],
                         dtype="float64"),
        "is_best": pd.Series([i == out["best_index"]
                              for i in sorted(out["cers"])], dtype="bool"),
    })


def _q_beam_decode(sf_dir: str):
    """Prefix-beam decoding with bigram-LM fusion and per-document hidden
    state carryover across lines. Deterministic (hash-derived lattices,
    add-one bigram LM), so golden-fixture-oracled: a sequential replay
    through the same BeamDecodeStage kernel
    (tools/make_golden_fixtures.py) pins the decode per doc — text via
    md5, confidence as floor(c*1e6) int64 (the repo's float-emission
    convention; both sides run the identical float code, so the fixed-
    point values are bit-equal)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from pero_ocr_ray.stages.beamdecode import beam_decode

    def project(t: pa.Table) -> pa.Table:
        conf = t.column("confidence").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "decoded_md5": pa.array(
                [hashlib.md5(x.encode("utf-8")).hexdigest()
                 for x in t.column("decoded_text").to_pylist()],
                pa.string()),
            "conf_e6": pa.array(np.floor(conf * 1e6).astype("int64")),
            "n_lines": t.column("n_lines"),
        })

    return (beam_decode(_docs(sf_dir), concurrency=_query_pool())
            .map_batches(project, batch_format="pyarrow"))


def _q_confusion_top(sf_dir: str):
    """Distributed character-confusion tallies between the original and a
    vowel-stripped rerun (union + url-keyed groupby + partial-tally
    aggregate + distributed top-k; no driver materialization).

    SQL-oracled: for THIS pair of runs the ref text is always a
    subsequence of the hyp text (vowel removal + whitespace re-collapse
    only deletes characters), so the minimal edit distance equals the
    length difference, every minimal alignment is deletions-only, and the
    confusion multiset is exactly the per-character count difference —
    which DuckDB computes directly. tools/make_confusion_fixture.py
    replays the full query sequentially through the shared
    levenshtein_alignment kernel and confirms the same tallies."""
    import pyarrow.compute as pc
    from pero_ocr_ray.functions.quality import confusion_counts
    from pero_ocr_ray.pipelines.extract import extract_pipeline
    from pero_ocr_ray.sources.pages import pages_from_documents
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    stripped = docs.set_column(
        docs.column_names.index("text"), "text",
        pc.replace_substring_regex(docs.column("text"), "[aeiou]", ""))
    pages_b = pages_from_documents(stripped, "simple")
    a = _extract(sf_dir, "simple")
    b = extract_pipeline(
        rd.from_arrow(pages_b).repartition(max(2, pages_b.num_rows // 64)),
        concurrency=_query_pool())
    return confusion_counts(a, b, top_k=20)


def _q_merge_linewise(sf_dir: str):
    from pero_ocr_ray.pipelines.merge import merge_results_linewise
    a = _extract(sf_dir, "simple")
    return merge_results_linewise([a])


def _q_image_features(sf_dir: str):
    """Multimodal decode + histogram over arithmetic fake image payloads
    (pixel = (seed*37 + j*101) % 256): the distributed actor-pool decode
    path is hash-verified against a DuckDB oracle that recomputes the
    16-bin histogram from the same closed-form pixel fill."""
    from pero_ocr_ray.stages.multimodal import image_features, make_fake_image
    import pyarrow as pa
    ids = list(range(200))
    tbl = pa.table({
        "item_id": pa.array(ids, pa.int64()),
        "image": pa.array([make_fake_image(16, 12, 3, seed=i) for i in ids],
                          pa.binary()),
    })
    feats = image_features(rd.from_arrow(tbl), concurrency=2)

    def explode(t: pa.Table) -> pa.Table:
        iid, w, h, c, bins, ns = [], [], [], [], [], []
        for row in t.to_pylist():
            for b, n in enumerate(row["hist_counts"]):
                iid.append(row["item_id"])
                w.append(row["width"]); h.append(row["height"])
                c.append(row["channels"])
                bins.append(b); ns.append(n)
        return pa.table({
            "item_id": pa.array(iid, pa.int64()),
            "width": pa.array(w, pa.int64()),
            "height": pa.array(h, pa.int64()),
            "channels": pa.array(c, pa.int64()),
            "bin": pa.array(bins, pa.int64()),
            "n": pa.array(ns, pa.int64()),
        })

    return feats.map_batches(explode, batch_format="pyarrow")


def _q_audio_features(sf_dir: str):
    """Audio decode + features over integer sawtooth waveforms
    (x_t = (i*7 + t*13) % 24001 - 12000, 8 kHz): duration, exact integer
    signal energy and zero-crossings hash-match a DuckDB oracle that
    regenerates the same samples arithmetically — no float codec drift."""
    from pero_ocr_ray.stages.multimodal import audio_features, make_fake_audio
    import numpy as np
    import pyarrow as pa
    rows = []
    for i in range(100):
        t = np.arange(4000, dtype=np.int64)
        wave = ((i * 7 + t * 13) % 24001 - 12000).astype(np.int16)
        rows.append(make_fake_audio(8000, wave))
    tbl = pa.table({"item_id": pa.array(list(range(100)), pa.int64()),
                    "audio": pa.array(rows, pa.binary())})
    return (audio_features(rd.from_arrow(tbl), concurrency=2)
            .select_columns(["item_id", "duration_sec", "energy",
                             "zero_crossings"]))


def _q_page_xml_roundtrip(sf_dir: str):
    """Real PAGE-XML interop (S2/W1): staged chain serializes the layout
    state to PAGE-XML strings, parses them back, then emits — the result
    must still match the SQL extraction oracle byte-for-byte."""
    from pero_ocr_ray.pipelines.registry import build_from_spec
    spec = [{"stage": "decode"}, {"stage": "parse"}, {"stage": "segment"},
            {"stage": "classify", "concurrency": _query_pool()},
            {"stage": "order"},
            {"stage": "to_pagexml"}, {"stage": "from_pagexml"},
            {"stage": "emit"}]
    out = build_from_spec(_pages(sf_dir, "simple"), spec)
    return out.select_columns(["url", "extracted_text"])


def _q_alto_lines(sf_dir: str):
    """ALTO writer + reader (W2/S3): serialize kept blocks to ALTO v2,
    parse the word model back to a flat lines table."""
    import functools
    import pyarrow as pa
    from pero_ocr_ray.pipelines.registry import build_from_spec
    from pero_ocr_ray.sources.pagexml import alto_to_lines
    spec = [{"stage": "decode"}, {"stage": "parse"}, {"stage": "segment"},
            {"stage": "classify", "concurrency": _query_pool()},
            {"stage": "order"}, {"stage": "to_alto"}]
    with_alto = build_from_spec(_pages(sf_dir, "simple"), spec)

    def explode(t: pa.Table) -> pa.Table:
        urls, bids, texts = [], [], []
        for xml in t.column("alto").to_pylist():
            for ln in alto_to_lines(xml):
                urls.append(ln["url"])
                bids.append(ln["block_id"])
                texts.append(ln["line_text"])
        return pa.table({"url": pa.array(urls, pa.string()),
                         "block_id": pa.array(bids, pa.string()),
                         "line_text": pa.array(texts, pa.string())})

    return with_alto.map_batches(explode, batch_format="pyarrow")


def _q_image_resize(sf_dir: str):
    """Multimodal nearest-neighbor resize (16x12 -> 8x6) over arithmetic
    fake payloads; the output container is decoded back and reduced to a
    position-weighted integer checksum, which a DuckDB oracle recomputes
    from the closed-form pixel fill + the same index mapping
    (ys = y*in_h//out_h, xs = x*in_w//out_w)."""
    import pyarrow as pa
    from pero_ocr_ray.stages.multimodal import (
        _decode_image, make_fake_image, resize_images,
    )
    ids = list(range(200))
    tbl = pa.table({
        "item_id": pa.array(ids, pa.int64()),
        "image": pa.array([make_fake_image(16, 12, 3, seed=i) for i in ids],
                          pa.binary()),
    })
    resized = resize_images(rd.from_arrow(tbl), 8, 6, concurrency=2)

    def checksum(t: pa.Table) -> pa.Table:
        import numpy as np
        iid, ws, hs, cks = [], [], [], []
        for row in t.to_pylist():
            img = _decode_image(row["image"])
            flat = img.reshape(-1).astype(np.int64)
            iid.append(row["item_id"])
            hs.append(img.shape[0]); ws.append(img.shape[1])
            cks.append(int((flat * (np.arange(flat.size) + 1)).sum()))
        return pa.table({
            "item_id": pa.array(iid, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "checksum": pa.array(cks, pa.int64()),
        })

    return resized.map_batches(checksum, batch_format="pyarrow")


def _q_video_frames(sf_dir: str):
    """Video frame sampling (every 4th frame) over arithmetic fake video
    payloads; per-frame exact integer pixel sums hash-match a DuckDB
    oracle regenerating the same frames."""
    import pyarrow as pa
    from pero_ocr_ray.stages.multimodal import (
        make_fake_video, video_frame_samples,
    )
    ids = list(range(60))
    tbl = pa.table({
        "item_id": pa.array(ids, pa.int64()),
        "video": pa.array([make_fake_video(8, 6, 12, seed=i) for i in ids],
                          pa.binary()),
    })
    return (video_frame_samples(rd.from_arrow(tbl), every_k=4, concurrency=2)
            .select_columns(["item_id", "frame_idx", "frame_sum"]))


def _q_page_quality(sf_dir: str):
    """Page quality (G2): power-mean (p=6) of kept-block logistic
    confidences over a multi-block corpus (10-token <p> chunks per doc).
    The SQL oracle recomputes scores, keep/edge/page filters, and the
    power mean from scratch; floor(q*1e6) int64 makes the hash gate immune
    to last-ulp libm drift."""
    from pero_ocr_ray.functions.quality import page_quality
    return page_quality(_pages(sf_dir, "chunks"), concurrency=_query_pool())


def _snapshot_sides(sf_dir: str):
    """Two closed-form crawl snapshots derived from documents: snapshot A
    drops doc_id%11==0 (those urls are 'added' later), snapshot B drops
    doc_id%13==0 ('removed') and bumps the text of doc_id%7==0
    ('changed'). Both regenerable in SQL."""
    import numpy as np
    import pyarrow as pa

    def side(df, drop_mod, bump):
        df = df[df["doc_id"] % drop_mod != 0]
        url = ("https://site" + (df["doc_id"] % 97).astype(str)
               + ".example/d/" + df["doc_id"].astype(str))
        text = (np.where(df["doc_id"] % 7 == 0, df["text"] + " v2",
                         df["text"]) if bump else df["text"])
        return pa.table({"url": pa.array(url, pa.string()),
                         "text": pa.array(text, pa.string())})

    path = os.path.join(sf_dir, "documents.parquet")
    old = (_read_pq(path, columns=["doc_id", "text"])
           .map_batches(lambda df: side(df, 11, False),
                        batch_format="pandas"))
    new = (_read_pq(path, columns=["doc_id", "text"])
           .map_batches(lambda df: side(df, 13, True),
                        batch_format="pandas"))
    return old, new


def _dirty_urls(sf_dir: str):
    """Deterministic dirty-url table: five closed-form mess variants
    (upper-case authority, default ports, tracking params, duplicate
    slashes, fragments) keyed by doc_id; host/path mods are small so
    canonicalization creates real collision groups."""
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        urls = []
        for d in ids:
            h, p, v = d % 7, d % 10, d % 5
            if v == 0:
                u = f"https://site{h}.example/d/{p}"
            elif v == 1:
                u = (f"HTTPS://SITE{h}.EXAMPLE:443/d/{p}"
                     f"?utm_source=feed&utm_medium=rss")
            elif v == 2:
                u = f"http://site{h}.example:80/d//{p}#sec"
            elif v == 3:
                u = f"https://site{h}.example/d/{p}?a=1&utm_campaign=x&b=2"
            else:
                u = f"https://site{h}.example/d/{p}?fbclid=c{d}"
            urls.append(u)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "url": pa.array(urls, pa.string())})

    return (_read_pq(os.path.join(sf_dir, "documents.parquet"),
                     columns=["doc_id"])
            .map_batches(fn, batch_format="pyarrow"))


def _q_index_search(sf_dir: str):
    """Conjunctive boolean retrieval (docs containing BOTH terms, score =
    total tf) — term-at-a-time shape, only query-term rows shuffle."""
    from pero_ocr_ray.functions.index import index_search
    return index_search(_docs(sf_dir), ["batch", "key"])


def _q_url_blocklist_filter(sf_dir: str):
    """Blocklist curation: broadcast host set (hosts site{h} with
    h%10==3) + a path-pattern rule; the oracle recomputes both decisions
    from the closed url form."""
    import pyarrow as pa

    from pero_ocr_ray.functions.domains import filter_blocked_urls

    def to_urls(df):
        url = ("https://site" + (df["doc_id"] % 97).astype(str)
               + ".example/d/" + df["doc_id"].astype(str))
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            "url": pa.array(url, pa.string()),
        })

    ds = _read_pq(os.path.join(sf_dir, "documents.parquet"),
                  columns=["doc_id"]).map_batches(to_urls,
                                                  batch_format="pandas")
    blocked = {f"site{h}.example" for h in range(97) if h % 10 == 3}
    return filter_blocked_urls(ds, blocked, path_re=r"/d/[0-9]*0$")


def _q_url_seen_probe(sf_dir: str):
    """Bloom-filter url seen-set (crawler frontier dedup): bounded
    distinct-positions build + broadcast bitmap + zero-shuffle probe.
    Candidates mix in-corpus urls (doc_id%3==0) with absent ones
    (doc_id%3==1); both engines replay identical md5-slice bits, so even
    false positives hash-match."""
    import numpy as np
    import pyarrow as pa

    from pero_ocr_ray.functions.bloom import url_seen_probe

    def to_urls(df):
        url = ("https://site" + (df["doc_id"] % 97).astype(str)
               + ".example/d/" + df["doc_id"].astype(str))
        return pa.table({"url": pa.array(url, pa.string())})

    def to_cands(df):
        df = df[df["doc_id"] % 3 < 2]
        ids = df["doc_id"].to_numpy()
        url = np.where(
            ids % 3 == 0,
            ("https://site" + (df["doc_id"] % 97).astype(str)
             + ".example/d/" + df["doc_id"].astype(str)).to_numpy(
                 dtype=object),
            ("https://absent" + df["doc_id"].astype(str)
             + ".example/x").to_numpy(dtype=object))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(url, pa.string()),
        })

    path = os.path.join(sf_dir, "documents.parquet")
    corpus = _read_pq(path, columns=["doc_id"]).map_batches(
        to_urls, batch_format="pandas")
    cands = _read_pq(path, columns=["doc_id"]).map_batches(
        to_cands, batch_format="pandas")
    return url_seen_probe(corpus, cands)


def _q_training_corpus_v4(sf_dir: str):
    """The round-4 stream-ordering chain: exact dedup -> duplicated-window
    filter (keep-ids semi-join) -> CCNet buckets minus tail -> seeded
    global shuffle order — one whole-chain SQL oracle."""
    from pero_ocr_ray.pipelines.training_data import curate_v4
    return curate_v4(_docs(sf_dir, ["doc_id", "text", "lang"]))


def _q_dup_window_stats(sf_dir: str):
    """Exact duplicated-window detection (fixed-width ExactSubstr
    variant, arXiv:2107.06499): per-doc counts of 8-token windows whose
    exact text recurs anywhere in the corpus. All shuffles move digests
    and partials."""
    from pero_ocr_ray.functions.spandedup import dup_window_stats
    return dup_window_stats(_docs(sf_dir), w=8)


def _q_perplexity_buckets(sf_dir: str):
    """CCNet head/middle/tail terciles per language by unigram-LM score:
    broadcast-LM zero-shuffle scoring, then the frozen-blocking rank scan
    with the NTILE(3) formula — SQL mirror is literal NTILE(3)."""
    from pero_ocr_ray.functions.ccnet import perplexity_buckets
    return perplexity_buckets(_docs(sf_dir, ["doc_id", "text", "lang"]),
                              vocab_size=4096)


def _q_global_shuffle(sf_dir: str):
    """Seeded deterministic global shuffle: corpus-wide position by
    md5-keyed sort + the two-pass block-offset scan (budget.py pattern);
    oracle = row_number() over the same (md5, doc_id) order."""
    from pero_ocr_ray.functions.shuffle import global_shuffle_positions
    docs = _read_pq(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id"])
    return global_shuffle_positions(docs, seed=42)


def _q_canonical_urls(sf_dir: str):
    """URL canonicalization chain (kernels/urlnorm.py): lowercase
    authority, default ports, fragments, tracking params, duplicate
    slashes — one rule list drives both engines."""
    from pero_ocr_ray.functions.domains import canonicalize_urls
    return canonicalize_urls(_dirty_urls(sf_dir))


def _q_canonical_dedup(sf_dir: str):
    """Canonical-url dedup groups: combiner partials + one canonical-key
    groupby (n_urls, min doc_id per canonical form)."""
    from pero_ocr_ray.functions.domains import canonical_dedup_groups
    return canonical_dedup_groups(_dirty_urls(sf_dir))


def _q_snapshot_diff(sf_dir: str):
    """Crawl snapshot reconciliation: per-url added/removed/changed/
    unchanged status via content-hash compare, bucketed union+groupby
    (the shuffle moves (url, md5) partials only)."""
    from pero_ocr_ray.functions.crawldiff import snapshot_diff
    old, new = _snapshot_sides(sf_dir)
    return snapshot_diff(old, new)


def _q_snapshot_diff_counts(sf_dir: str):
    """Status roll-up of the snapshot diff (combiner partials + a tiny
    groupby)."""
    from pero_ocr_ray.functions.crawldiff import diff_counts, snapshot_diff
    old, new = _snapshot_sides(sf_dir)
    return diff_counts(snapshot_diff(old, new))


def _q_extract_links(sf_dir: str):
    """Out-link extraction over the linked-template pages: one DOM walk
    per page (kernels/links.py), first occurrence wins, fragments and
    non-hierarchical schemes dropped. The oracle regenerates the
    closed-form anchor set from doc_id."""
    from pero_ocr_ray.functions.linkgraph import link_table
    return link_table(_pages(sf_dir, "linked"))


def _q_host_edges(sf_dir: str):
    """Host-level weighted link edges: per-batch pandas partials + one
    (src,dst) groupby Sum over the extracted link table."""
    from pero_ocr_ray.functions.linkgraph import host_edges, link_table
    return host_edges(link_table(_pages(sf_dir, "linked")))


def _q_top_hosts_by_rank(sf_dir: str):
    """Authority shortlist: 5 PageRank iterations then a distributed
    top-10 (rank desc, host tie-break) — the compose a crawl scheduler
    actually runs."""
    from pero_ocr_ray.functions.linkgraph import (
        host_edges, link_table, pagerank_hosts, top_hosts_by_rank,
    )
    edges = host_edges(link_table(_pages(sf_dir, "linked")))
    return top_hosts_by_rank(pagerank_hosts(edges, n_iter=5), k=10)


def _q_anchor_texts(sf_dir: str):
    """Corpus-wide (target href, anchor text) counts over the linked
    template — link 1 appears twice per page (the duplicate anchor), so
    its pair carries n=2; fragment/mailto anchors contribute nothing."""
    from pero_ocr_ray.functions.linkgraph import anchor_text_counts
    return anchor_text_counts(_pages(sf_dir, "linked"))


def _q_pagerank_hosts(sf_dir: str):
    """5 exact integer fixed-point PageRank iterations over the host
    graph (damping 85/100, micro-unit ranks, per-edge floor division) —
    distributed == sequential == the oracle's unrolled-CTE replay
    bit-for-bit because every operation is order-independent int64."""
    from pero_ocr_ray.functions.linkgraph import (
        host_edges, link_table, pagerank_hosts,
    )
    edges = host_edges(link_table(_pages(sf_dir, "linked")))
    return pagerank_hosts(edges, n_iter=5)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_simple": _q_extract_simple,
        "extract_simple_metrics": _q_extract_simple_metrics,
        "extract_cases": _q_extract_cases,
        "extract_staged": _q_extract_staged,
        "dedup_pages_latest": _q_dedup_pages,
        "merge_best": _q_merge_best,
        "doc_token_counts": _q_token_counts,
        "doc_subword_counts": _q_subword_counts,
        "doc_bpe_counts": _q_bpe_counts,
        "redact_pii": _q_redact_pii,
        "repetition_stats": _q_repetition_stats,
        "domain_counts": _q_domain_counts,
        "domain_cap": _q_domain_cap,
        "top_tokens": _q_top_tokens,
        "stratified_sample": _q_stratified_sample,
        "doc_quality": _q_quality,
        "gopher_quality_filter": _q_gopher,
        "c4_line_filter": _q_c4_line_filter,
        "quality_classifier": _q_classifier,
        "quality_funnel": _q_quality_funnel,
        "host_quality": _q_host_quality,
        "quality_upsample": _q_quality_upsample,
        "bitext_pairs": _q_bitext_pairs,
        "bitext_margin_pairs": _q_bitext_margin,
        "validate_corpus": _q_validate_corpus,
        "perplexity_buckets_hist": _q_perplexity_buckets_hist,
        "weighted_token_sample": _q_weighted_sample,
        "dsir_scores": _q_dsir_scores,
        "decontaminate_spans": _q_decontaminate_spans,
        "cluster_representatives": _q_cluster_reps,
        "bpe_fertility_by_lang": _q_bpe_fertility,
        "filter_agreement": _q_filter_agreement,
        "temperature_sample": _q_temperature_sample,
        "mixed_stream": _q_mixed_stream,
        "doc_content_hash": _q_content_hash,
        "doc_lang_id": _q_lang_id,
        "doc_fingerprints": _q_fingerprints,
        "dedup_exact_groups": _q_dedup_exact,
        "minhash_near_dup_pairs": _q_minhash_pairs,
        "jaccard_near_dup_pairs": _q_jaccard_pairs,
        "simhash_signatures": _q_simhash_sigs,
        "simhash_near_dup_pairs": _q_simhash_pairs,
        "near_dup_clusters": _q_near_dup_clusters,
        "ngram_contamination": _q_contamination,
        "decontaminate_corpus": _q_decontaminate,
        "paragraph_dedup_docs": _q_paragraph_dedup,
        "duplicate_paragraphs": _q_duplicate_paragraphs,
        "inverted_index": _q_inverted_index,
        "docs_above_lang_median": _q_docs_above_lang_median,
        "token_budget_cut": _q_token_budget_cut,
        "training_chunks": _q_training_chunks,
        "pack_sequences": _q_pack_sequences,
        "normalize_text": _q_normalize_text,
        "doc_tfidf_topk": _q_doc_tfidf_topk,
        "doc_lm_score": _q_doc_lm_score,
        "orders_per_segment": _q_orders_per_segment,
        "asof_purchase_view_bucketed": _q_asof_bucketed,
        "knn_cosine": _q_knn,
        "embedding_near_dup": _q_embedding_near_dup,
        "events_hourly": _q_events_hourly,
        "user_retention": _q_user_retention,
        "event_funnel": _q_event_funnel,
        "q1_pricing": _q_q1,
        "q3_top_orders": _q_q3,
        "suppliers_per_nation": _q_suppliers_per_nation,
        "doc_lang_counts": _q_lang_counts,
        "events_sessionize": _q_sessionize,
        "events_sessionize_bucketed": _q_sessionize_bucketed,
        "distinct_brands": _q_distinct_brands,
        "top_parts_by_price": _q_top_parts,
        "customer_segment_counts": _q_segment_counts,
        "page_quality": _q_page_quality,
        "page_xml_roundtrip": _q_page_xml_roundtrip,
        "alto_lines": _q_alto_lines,
        "extract_lines": _q_extract_lines,
        "events_sliding": _q_events_sliding,
        "ivf_knn": _q_ivf_knn,
        "kmeans_clusters": _q_kmeans_clusters,
        "semantic_dedup": _q_semantic_dedup,
        "asof_purchase_view": _q_asof_purchase_view,
        "approx_distinct_tokens": _q_approx_distinct_tokens,
        "token_quantiles_by_lang": _q_token_quantiles,
        "warc_extract": _q_warc_extract,
        "refine_dehyphenate": _q_refine,
        "refine_cases": _q_refine_cases,
        "compare_runs_cer": _q_compare_runs_cer,
        "beam_decode_docs": _q_beam_decode,
        "training_corpus_stats": _q_training_corpus_stats,
        "training_corpus_v2": _q_training_corpus_v2,
        "training_corpus_v3": _q_training_corpus_v3,
        "select_config": _q_select_config,
        "searchable_pdf": _q_searchable_pdf,
        "confusion_top": _q_confusion_top,
        "merge_linewise": _q_merge_linewise,
        "index_search": _q_index_search,
        "url_blocklist_filter": _q_url_blocklist_filter,
        "url_seen_probe": _q_url_seen_probe,
        "training_corpus_v4": _q_training_corpus_v4,
        "dup_window_stats": _q_dup_window_stats,
        "perplexity_buckets": _q_perplexity_buckets,
        "global_shuffle": _q_global_shuffle,
        "canonical_urls": _q_canonical_urls,
        "canonical_dedup": _q_canonical_dedup,
        "snapshot_diff": _q_snapshot_diff,
        "snapshot_diff_counts": _q_snapshot_diff_counts,
        "extract_links": _q_extract_links,
        "host_edges": _q_host_edges,
        "pagerank_hosts": _q_pagerank_hosts,
        "anchor_texts": _q_anchor_texts,
        "top_hosts_by_rank": _q_top_hosts_by_rank,
        "image_features": _q_image_features,
        "image_resize": _q_image_resize,
        "video_frame_samples": _q_video_frames,
        "audio_features": _q_audio_features,
    }


_URL_SQL = "'https://site' || CAST(doc_id % 97 AS VARCHAR) || '.example/d/' || CAST(doc_id AS VARCHAR)"
# NOTE: the extraction kernel canonicalizes UNICODE whitespace (the right
# semantics for web text: &nbsp; collapses like a space) while RE2's \s is
# ASCII. The extraction oracles below are therefore exact only while
# documents.text carries no non-ASCII whitespace — true for the driver's
# synthetic corpus by construction. Token/stopword oracles are exact
# unconditionally (kernels pinned to ASCII classes, kernels/textstats.py).
_CANON_SQL = r"trim(regexp_replace(text, '\s+', ' ', 'g'))"
_STOPWORD_SQL = r"\b(?:the|and|of|a|to|in|is|for|on|with)\b"


def _gopher_sql(src: str = 'documents') -> str:
    """Gopher-rules mirror: the regex constants come verbatim from
    ``functions/gopher.py`` (one rule list drives both engines) and every
    rule is an integer cross-multiplication, so the hash compare is exact.
    RE2's ``\\S`` is ASCII — identical to the kernel's TOKEN_RE class."""
    from pero_ocr_ray.functions import gopher as G
    return rf"""
        WITH f AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                     AS n_words,
                 CAST(coalesce(length(array_to_string(
                     regexp_extract_all(text, '\S+'), '')), 0) AS BIGINT)
                     AS word_chars,
                 CAST(len(list_filter(regexp_extract_all(text, '\S+'),
                          x -> regexp_matches(x, '{G.ALPHA_RE_STR}')))
                     AS BIGINT) AS n_alpha_words,
                 CAST(len(regexp_extract_all(lower(text),
                          '{_STOPWORD_SQL}')) AS BIGINT) AS n_stop_hits,
                 CAST(len(regexp_extract_all(text, '{G.SYMBOL_RE_STR}'))
                     AS BIGINT) AS n_symbols,
                 CAST(CASE WHEN length(text) = 0 THEN 0
                      ELSE len(regexp_extract_all(text, '\n')) + 1 END
                     AS BIGINT) AS n_lines,
                 CAST(len(regexp_extract_all(text, '{G.BULLET_RE_STR}'))
                     AS BIGINT) AS n_bullet_lines,
                 CAST(len(regexp_extract_all(text,
                          '{G.ELLIPSIS_LINE_RE_STR}')) AS BIGINT)
                     AS n_ellipsis_lines
          FROM {src})
        SELECT doc_id, n_words, word_chars, n_alpha_words, n_stop_hits,
               n_symbols, n_lines, n_bullet_lines, n_ellipsis_lines,
               CAST(CASE WHEN n_words BETWEEN {G.MIN_WORDS} AND {G.MAX_WORDS}
                          AND {G.MIN_MEAN_WORD_LEN} * n_words <= word_chars
                          AND word_chars <= {G.MAX_MEAN_WORD_LEN} * n_words
                          AND 1000 * n_symbols
                              < {G.MAX_SYMBOL_PERMILLE} * n_words
                          AND 1000 * n_bullet_lines
                              <= {G.MAX_BULLET_PERMILLE} * n_lines
                          AND 1000 * n_ellipsis_lines
                              <= {G.MAX_ELLIPSIS_PERMILLE} * n_lines
                          AND 1000 * n_alpha_words
                              >= {G.MIN_ALPHA_PERMILLE} * n_words
                          AND n_stop_hits >= {G.MIN_STOP_HITS}
                     THEN 1 ELSE 0 END AS BIGINT) AS pass_gopher
        FROM f"""


def _classifier_sql(src: str = 'documents') -> str:
    """Hashed-linear-classifier mirror: the weight CTE derives the exact
    int64 table ``classifier.hashed_weights`` builds (md5-high-64 of the
    bucket id, repo convention) and the token buckets use the same
    md5-high-64 of the token; the doc score is an integer SUM, the keep
    rule an integer cross-multiplication — hash compare is exact."""
    from pero_ocr_ray.functions import classifier as C
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                   AS token
          FROM {src}),
        bk AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(token), 1, 16))::UBIGINT
                      % {C.N_BUCKETS} AS BIGINT) AS bucket
          FROM tok),
        w AS (
          SELECT CAST(b AS BIGINT) AS bucket,
                 CAST(('0x' || substr(md5(CAST(b AS VARCHAR)), 1, 16))
                      ::UBIGINT % {C.WEIGHT_MOD} AS BIGINT)
                   - {C.WEIGHT_SHIFT} AS wt
          FROM generate_series(0, {C.N_BUCKETS - 1}) AS t(b)),
        s AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(w.wt) AS BIGINT) AS clf_score
          FROM bk JOIN w USING (bucket) GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(s.n_tokens, 0) AS n_tokens,
               coalesce(s.clf_score, 0) AS clf_score,
               CAST(CASE WHEN coalesce(s.clf_score, 0) * 1000
                          >= {C.DEFAULT_THR_MILLI}
                             * coalesce(s.n_tokens, 0)
                    THEN 1 ELSE 0 END AS BIGINT) AS keep_doc
        FROM {src} d LEFT JOIN s USING (doc_id)"""


def _c4_sql(src: str = 'documents') -> str:
    """C4 line-filter mirror. Constants come from
    ``functions/linefilter.py`` (one rule list drives both engines). The
    line-synthesis CTE regroups the flat corpus into 8-word lines exactly
    as ``synthesize_lines`` does (regexp token split skips empty tokens on
    both sides); predicates are pure-integer / literal-regex so the hash
    compare is exact. Stacked CTEs keep DuckDB's 128-deep binder happy."""
    from pero_ocr_ray.functions import linefilter as L
    wpl = L.GATE_WORDS_PER_LINE
    ban_re = L.banned_word_re("spark")
    doc_bans = " AND ".join(
        f"NOT contains(lower(text), '{s.replace(chr(39), chr(39)*2)}')"
        for s in L.DOC_BAN_SUBSTRINGS)
    return f"""
        WITH toks AS (
          SELECT doc_id, text,
                 regexp_extract_all(text, '{L.WORD_RE}') AS w
          FROM {src}),
        ln AS (
          SELECT doc_id, text,
                 list_transform(
                   generate_series(1, greatest((len(w)+{wpl - 1})//{wpl}, 1)),
                   i -> coalesce(array_to_string(
                          w[((i-1)*{wpl}+1):(i*{wpl})], ' '), '')) AS lines
          FROM toks),
        k AS (
          SELECT doc_id, text, lines,
                 list_filter(lines,
                   l -> len(regexp_extract_all(l, '{L.WORD_RE}'))
                          >= {L.MIN_WORDS_PER_LINE}
                        AND NOT regexp_matches(lower(l), '{ban_re}'))
                 AS kept
          FROM ln)
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_kept,
               coalesce(array_to_string(kept, chr(10)), '') AS text_clean,
               CAST(CASE WHEN len(kept) >= {L.MIN_KEPT_LINES}
                          AND {doc_bans}
                    THEN 1 ELSE 0 END AS BIGINT) AS pass_c4
        FROM k"""


def _funnel_sql() -> str:
    """Whole-chain mirror of pipelines.training_data.quality_funnel: each
    stage's own builder (parametrized by source table) is embedded as a
    CTE body, so the composed oracle is BUILT FROM the per-stage oracles
    — no second implementation to drift."""
    return f"""
        WITH gf AS ({_gopher_sql('documents')}),
        s1 AS (SELECT d.doc_id, d.text
               FROM documents d JOIN gf USING (doc_id)
               WHERE gf.pass_gopher = 1),
        c4 AS ({_c4_sql('s1')}),
        s2 AS (SELECT doc_id, text_clean AS text
               FROM c4 WHERE pass_c4 = 1),
        clf AS ({_classifier_sql('s2')})
        SELECT doc_id, n_tokens, clf_score
        FROM clf WHERE keep_doc = 1"""


def _host_quality_sql(thr_micro: int = 0) -> str:
    """Whole-chain mirror of `_q_host_quality`: extraction text (the
    simple-template closed form), the classifier CTE builder, the
    urlnorm chain, the shared host regex, and the integer
    cross-multiplied keep rule — built from the per-stage oracles."""
    from pero_ocr_ray.functions.domains import HOST_RE_STR
    return f"""
        WITH src AS (
          SELECT doc_id, {_URL_SQL} AS url, {_CANON_SQL} AS text
          FROM documents),
        scored AS ({_classifier_sql('src')}),
        h AS (
          SELECT regexp_extract({_canon_url_sql_expr('u.url')},
                                '{HOST_RE_STR}', 1) AS host,
                 s.clf_score
          FROM scored s JOIN src u USING (doc_id))
        SELECT host,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(clf_score) AS BIGINT) AS sum_score,
               CAST(CASE WHEN sum(clf_score) >= {thr_micro} * count(*)
                    THEN 1 ELSE 0 END AS BIGINT) AS keep_host
        FROM h GROUP BY host"""


def _quality_upsample_sql(hi_milli: int = 500, hi_repeats: int = 2,
                          seed: int = 42) -> str:
    """Mirror of `functions/sampling.py:quality_upsample`: the classifier
    CTE builder + integer tier rule + generate_series row expansion +
    the seeded md5 order-key convention."""
    return f"""
        WITH scored AS ({_classifier_sql('documents')}),
        r AS (
          SELECT doc_id,
                 CASE WHEN clf_score * 1000 >= {hi_milli} * n_tokens
                           AND n_tokens > 0 THEN {hi_repeats}
                      WHEN clf_score >= 0 THEN 1
                      ELSE 0 END AS reps
          FROM scored),
        e AS (
          SELECT r.doc_id, gs.g AS copy_idx
          FROM r JOIN generate_series(0, {hi_repeats - 1}) gs(g)
            ON gs.g < r.reps)
        SELECT doc_id, CAST(copy_idx AS BIGINT) AS copy_idx,
               md5('epoch{seed}:' || CAST(doc_id AS VARCHAR) || ':'
                   || CAST(copy_idx AS VARCHAR)) AS order_key
        FROM e"""


def _bitext_sql_base(src_lang: str, tgt_lang: str, scale_pow: int,
                     margin: str, proj: str, frm: str,
                     where: str) -> str:
    """Mirror of `functions/bitext.py`: floor(x * 2^scale_pow) is
    bit-exact on both engines (power-of-two multiply), the dot product
    of the quantized vectors is < 2^31 so DuckDB's double-summing
    list_dot_product is integer-exact, and the mutual-best criterion is
    two row_number windows with the shared (dot DESC, id ASC) tie-break."""
    q = (f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) "
         f"* {1 << scale_pow}) AS BIGINT))")
    return f"""
        WITH e AS (
          SELECT em.vec_id, d.lang, {q} AS q
          FROM embeddings em JOIN documents d ON d.doc_id = em.vec_id),
        s AS (
          SELECT a.vec_id AS src_id, b.vec_id AS tgt_id,
                 CAST(list_dot_product(a.q, b.q) AS BIGINT) AS dot_q
          FROM e a JOIN e b ON a.lang = '{src_lang}'
                           AND b.lang = '{tgt_lang}'),
        f AS (SELECT *, row_number() OVER (PARTITION BY src_id
                        ORDER BY dot_q DESC, tgt_id) AS rf FROM s),
        g AS (SELECT *, row_number() OVER (PARTITION BY tgt_id
                        ORDER BY dot_q DESC, src_id) AS rg FROM s){margin}
        SELECT {proj}
        FROM {frm}
        WHERE {where}"""


def _bitext_sql(src_lang: str = "en", tgt_lang: str = "de",
                scale_pow: int = 12) -> str:
    return _bitext_sql_base(src_lang, tgt_lang, scale_pow,
                            margin="",
                            proj="f.src_id, f.tgt_id, f.dot_q",
                            frm=("f JOIN g ON f.src_id = g.src_id "
                                 "AND f.tgt_id = g.tgt_id"),
                            where="f.rf = 1 AND g.rg = 1")


def _bitext_margin_sql(src_lang: str = "en", tgt_lang: str = "de",
                       scale_pow: int = 12, k: int = 4,
                       thr_milli: int = 1200) -> str:
    """Ratio-margin mirror: top-k sums via the same (dot DESC, id) rank
    windows (a k-boundary tie contributes the same VALUE whichever
    partner wins the rank, so the sums — and therefore the integer
    cross-multiplied keep rule — are engine-exact)."""
    margin = f""",
        m AS (SELECT f.src_id, f.tgt_id, f.dot_q
              FROM f JOIN g ON f.src_id = g.src_id
                           AND f.tgt_id = g.tgt_id
              WHERE f.rf = 1 AND g.rg = 1),
        kf AS (SELECT src_id, sum(dot_q) AS s FROM f
               WHERE rf <= {k} GROUP BY src_id),
        kg AS (SELECT tgt_id, sum(dot_q) AS s FROM g
               WHERE rg <= {k} GROUP BY tgt_id)"""
    return _bitext_sql_base(
        src_lang, tgt_lang, scale_pow, margin=margin,
        proj="m.src_id, m.tgt_id, m.dot_q",
        frm="m JOIN kf USING (src_id) JOIN kg USING (tgt_id)",
        where=(f"m.dot_q * {2 * k * 1000} >= {thr_milli} "
               f"* (kf.s + kg.s)"))


_ASOF_SQL = """
    SELECT p.event_id, p.user_id, p.ts, v.ts AS view_ts,
           CAST(ROUND(v.value * 100) AS BIGINT) AS view_value_cents
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts"""


_SESSIONIZE_SQL = """
    WITH d AS (
        SELECT user_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events)
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions
    FROM d GROUP BY user_id"""


def _lang_id_sql() -> str:
    """Mirror of kernels.textstats.lang_id: per-lang distinct-word profile
    scores, winner = alphabetically-first argmax if max > 0 else 'und'."""
    from pero_ocr_ray.kernels.textstats import LANG_PROFILES
    score_cols = []
    for code in sorted(LANG_PROFILES):
        words = ", ".join(f"'{w}'" for w in sorted(LANG_PROFILES[code]))
        score_cols.append(
            f"count(*) FILTER (WHERE w IN ({words})) AS {code}")
    cases = []
    codes = sorted(LANG_PROFILES)
    mx = f"greatest({', '.join(codes)})"
    for code in codes[:-1]:
        cases.append(f"WHEN {code} = {mx} THEN '{code}'")
    return f"""
        WITH w AS (
            SELECT doc_id,
                   unnest(list_distinct(regexp_extract_all(lower(text),
                                                           '[a-z]+'))) AS w
            FROM documents),
        s AS (SELECT doc_id, {', '.join(score_cols)} FROM w GROUP BY doc_id)
        SELECT d.doc_id,
               CASE WHEN COALESCE({mx}, 0) = 0 THEN 'und'
                    {' '.join(cases)}
                    ELSE '{codes[-1]}' END AS lang_pred
        FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id"""


def _fingerprint_sql() -> str:
    """Mirror of kernels.textstats.rolling_fingerprint: min of polynomial
    rolling hashes over 64-char windows (winnowing), HUGEINT arithmetic,
    short-text polynomial branch; powers of the base inlined."""
    from pero_ocr_ray.kernels.textstats import _FP_BASE, _FP_MOD
    pw_rows = ", ".join(f"({k}, {pow(_FP_BASE, k, _FP_MOD)})"
                        for k in range(64))
    return f"""
        WITH pw(k, p) AS (VALUES {pw_rows}),
        t AS (SELECT doc_id, regexp_extract_all(text, '(?s).') AS cs
              FROM documents),
        c AS (SELECT doc_id, unnest(cs) AS ch,
                     generate_subscripts(cs, 1) AS i, len(cs) AS n FROM t),
        longterms AS (
            SELECT c.doc_id, c.i + pw.k - 63 AS s,
                   CAST(ord(c.ch) AS HUGEINT) * pw.p AS term, c.n
            FROM c CROSS JOIN pw WHERE c.n >= 64),
        wh AS (SELECT doc_id, s, SUM(term) % {_FP_MOD} AS h
               FROM longterms WHERE s >= 1 AND s + 63 <= n
               GROUP BY doc_id, s),
        longfp AS (SELECT doc_id, CAST(MIN(h) AS BIGINT) AS fingerprint
                   FROM wh GROUP BY doc_id),
        shortfp AS (SELECT c.doc_id,
                           CAST(SUM(CAST(ord(c.ch) AS HUGEINT) * pw.p)
                                % {_FP_MOD} AS BIGINT) AS fingerprint
                    FROM c JOIN pw ON pw.k = c.n - c.i WHERE c.n < 64
                    GROUP BY c.doc_id),
        allfp AS (SELECT * FROM longfp UNION ALL SELECT * FROM shortfp)
        SELECT d.doc_id, COALESCE(allfp.fingerprint, 0) AS fingerprint
        FROM documents d LEFT JOIN allfp ON d.doc_id = allfp.doc_id"""


def _page_quality_sql() -> str:
    """SQL mirror of PageQualityStage over the 'chunks' template: 10-token
    <p> chunks -> block score ln(1+n_chars) + content bonus (depth 4 is
    under the soft-depth limit; no links, no boilerplate) -> keep mask with
    the edge filter (first/last chunk short and non-heading) and the
    whole-page minimum -> logistic confidence -> power mean p=6 ->
    floor(q * 1e6)."""
    from pero_ocr_ray.kernels.config import DEFAULT_CONFIG as C
    return rf"""
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS w,
                       generate_subscripts(toks, 1) AS i FROM t),
        chunk AS (SELECT doc_id, (i - 1) // 10 AS ci,
                         length(string_agg(w, ' ' ORDER BY i)) AS n_chars
                  FROM tok GROUP BY doc_id, (i - 1) // 10),
        feat AS (SELECT doc_id, ci, n_chars,
                        max(ci) OVER (PARTITION BY doc_id) AS last_ci,
                        {C.len_weight} * ln(1.0 + n_chars)
                            + {C.kind_bonus_content} AS score
                 FROM chunk),
        kept AS (SELECT doc_id, ci, n_chars, score,
                        (score >= {C.score_threshold}
                         AND NOT ((ci = 0 OR ci = last_ci)
                                  AND n_chars < {C.edge_min_chars})) AS keep
                 FROM feat),
        page AS (SELECT doc_id,
                        max(CASE WHEN keep AND n_chars >= {C.page_min_chars}
                                 THEN 1 ELSE 0 END) AS page_ok
                 FROM kept GROUP BY doc_id),
        conf AS (SELECT k.doc_id, 1.0 / (1.0 + exp(-k.score)) AS c
                 FROM kept k JOIN page p ON p.doc_id = k.doc_id
                 WHERE k.keep AND p.page_ok = 1),
        q AS (SELECT doc_id,
                     pow(SUM(pow(c, 6)) / COUNT(*), 1.0 / 6.0) AS quality
              FROM conf GROUP BY doc_id)
        SELECT {_URL_SQL.replace("doc_id", "d.doc_id")} AS url,
               CAST(floor(COALESCE(q.quality, 0.0) * 1000000) AS BIGINT)
                   AS quality_e6
        FROM documents d LEFT JOIN q ON q.doc_id = d.doc_id"""


def _select_config_sql() -> str:
    """SQL mirror of _q_select_config over the 'simple' template: the
    representative-candidate indices come from the same deterministic
    farthest-point selection (inlined at build time, like the minhash
    permutation constants); per-candidate CER is recomputed from the
    config semantics — the default and link-weight candidates extract the
    canonical text exactly (CER 0, the extract_simple invariant), the
    page_min_chars=10000 candidate drops every page shorter than that
    (per-doc errors = full reference length); best = (cer, index) argmin."""
    from pero_ocr_ray.functions.select_config import (
        select_representative_configs,
    )
    from pero_ocr_ray.kernels.config import ExtractConfig
    cands = [ExtractConfig(), ExtractConfig(page_min_chars=10_000),
             ExtractConfig(score_threshold=-5.0), ExtractConfig(link_weight=2.0)]
    reps = select_representative_configs(cands, 3)
    rows = []
    for i in reps:
        if cands[i].page_min_chars >= 10_000:
            rows.append(f"SELECT {i} AS candidate, "
                        f"(SELECT SUM(CASE WHEN length(ct) < "
                        f"{cands[i].page_min_chars} THEN length(ct) "
                        f"ELSE 0 END) * 1.0 / SUM(length(ct)) FROM s) AS cer")
        else:
            rows.append(f"SELECT {i} AS candidate, 0.0 AS cer")
    return rf"""
        WITH s AS (SELECT trim(regexp_replace(text, '\s+', ' ', 'g')) AS ct
                   FROM documents ORDER BY doc_id LIMIT 100),
        cers AS ({' UNION ALL '.join(rows)})
        SELECT candidate, cer,
               candidate = (SELECT candidate FROM cers
                            ORDER BY cer, candidate LIMIT 1) AS is_best
        FROM cers"""


def _training_v2_sql() -> str:
    """Whole-chain oracle for training_corpus_v2: one DuckDB query that
    replays exact dedup, MinHash-LSH pairs over the survivors, the
    transitive closure (recursive CTE), cluster-minima near-dup drops, the
    quality filter, the md5-permille stratified sample, and the per-lang
    token/subword budgets."""
    from pero_ocr_ray.kernels.textstats import SUBWORD_RE_STR
    sub_pat = SUBWORD_RE_STR.replace("'", "''")
    return rf"""
        WITH RECURSIVE
        surv AS (SELECT min(doc_id) AS doc_id, text
                 FROM documents GROUP BY text),
        svd AS (SELECT s.doc_id, s.text, d.lang
                FROM surv s JOIN documents d ON d.doc_id = s.doc_id),
        prs AS ({_minhash_sql(0.7, "svd")}),
        edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
                  UNION ALL SELECT doc_b, doc_a FROM prs),
        nodes AS (SELECT DISTINCT a AS d FROM edges),
        reach(d, n) AS (
            SELECT d, d FROM nodes
            UNION
            SELECT r.d, e.b FROM reach r JOIN edges e ON e.a = r.n),
        clusters AS (SELECT d AS doc_id, MIN(n) AS cluster_id
                     FROM reach GROUP BY d),
        drops AS (SELECT doc_id FROM clusters WHERE doc_id != cluster_id),
        kept0 AS (SELECT * FROM svd
                  WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
        feat AS (SELECT doc_id, lang,
                        CAST(length(regexp_extract_all(text, '\S+'))
                             AS BIGINT) AS n_tokens,
                        CAST(length(regexp_extract_all(text, '{sub_pat}'))
                             AS BIGINT) AS n_subwords,
                        CAST(length(regexp_extract_all(lower(text),
                             '{_STOPWORD_SQL}')) AS BIGINT) AS n_stop
                 FROM kept0),
        kept AS (SELECT * FROM feat
                 WHERE n_tokens >= 20 AND n_stop <= 0.5 * n_tokens),
        sampled AS (SELECT * FROM kept
                    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                          1, 8))::UBIGINT % 1000
                          < CASE lang WHEN 'en' THEN 600
                                      WHEN 'de' THEN 800 ELSE 700 END)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(SUM(n_subwords) AS BIGINT) AS sum_subwords
        FROM sampled GROUP BY lang"""


def _host_re_sql() -> str:
    from pero_ocr_ray.functions.domains import HOST_RE_STR
    return HOST_RE_STR.replace("'", "''")


_HOST_RE_SQL = _host_re_sql()


def _domain_counts_sql() -> str:
    """Pages per host with the identical host-extraction regex."""
    return f"""
        WITH h AS (SELECT COALESCE(regexp_extract(
                       'https://site' || CAST(doc_id % 97 AS VARCHAR)
                           || '.example/d/' || CAST(doc_id AS VARCHAR),
                       '{_HOST_RE_SQL}', 1), '') AS host
                   FROM documents)
        SELECT host, CAST(count(*) AS BIGINT) AS n_pages
        FROM h GROUP BY host"""


def _pii_sql() -> str:
    """PII-redaction oracle: the identical injected text, then the same
    regexp_replace chain in PII_PATTERNS order (count before replace per
    category, exactly re.subn's semantics)."""
    from pero_ocr_ray.functions.pii import PII_PATTERNS
    pats = {name: pat.replace("'", "''") for name, pat in PII_PATTERNS}
    return f"""
        WITH d2 AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0
                        THEN text || ' contact user'
                             || CAST(doc_id AS VARCHAR)
                             || '@example.com or call +1 (555) 123-4567'
                             || ' from 10.0.0.1'
                        ELSE text END AS text
            FROM documents),
        r1 AS (SELECT doc_id,
                      regexp_replace(text, '{pats["email"]}', '<email>',
                                     'g') AS text,
                      CAST(length(regexp_extract_all(text,
                           '{pats["email"]}')) AS BIGINT) AS n_emails
               FROM d2),
        r2 AS (SELECT doc_id,
                      regexp_replace(text, '{pats["phone"]}', '<phone>',
                                     'g') AS text, n_emails,
                      CAST(length(regexp_extract_all(text,
                           '{pats["phone"]}')) AS BIGINT) AS n_phones
               FROM r1)
        SELECT doc_id,
               regexp_replace(text, '{pats["ip"]}', '<ip>', 'g') AS text,
               n_emails, n_phones,
               CAST(length(regexp_extract_all(text, '{pats["ip"]}'))
                    AS BIGINT) AS n_ips
        FROM r2"""


_REPETITION_SQL = r"""
    WITH t AS (SELECT doc_id,
                      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    base AS (SELECT doc_id, len(toks) AS n,
                    length(list_distinct(toks)) AS d FROM t),
    tok AS (SELECT doc_id, unnest(toks) AS w,
                   generate_subscripts(toks, 1) AS i FROM t),
    bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS bg
           FROM tok a JOIN tok b
             ON b.doc_id = a.doc_id AND b.i = a.i + 1),
    bgc AS (SELECT doc_id, MAX(c) AS mx FROM (
                SELECT doc_id, bg, count(*) AS c FROM bg
                GROUP BY doc_id, bg) GROUP BY doc_id)
    SELECT base.doc_id,
           CAST(CASE WHEN n = 0 THEN 0
                     ELSE (n - d) * 1000000 // n END AS BIGINT)
               AS dup_word_frac_e6,
           CAST(CASE WHEN n < 2 THEN 0
                     ELSE COALESCE(bgc.mx, 0) * 1000000 // (n - 1) END
                AS BIGINT) AS top_bigram_frac_e6
    FROM base LEFT JOIN bgc ON bgc.doc_id = base.doc_id"""


def _subword_sql() -> str:
    """BPE-ish subword counts: the exact kernel regex (RE2/Python-re
    compatible by construction) evaluated by DuckDB."""
    from pero_ocr_ray.kernels.textstats import SUBWORD_RE_STR
    pat = SUBWORD_RE_STR.replace("'", "''")
    return (f"SELECT doc_id, CAST(length(regexp_extract_all(text, "
            f"'{pat}')) AS BIGINT) AS n_subwords FROM documents")


def _bpe_sql() -> str:
    """Real-BPE subword counts: the DuckDB side replays the fixture
    tokenizer (kernels/bpe.py) by applying the SHARED merges table
    exhaustively in rank order — an unrolled chain of sentinel-spaced
    ``replace(' a b ', ' ab ')`` passes (``_PASSES_SQL`` passes per merge
    so runs of adjacent repeats converge). Exact vs the Ray side's
    canonical encoder by the trained-merges equivalence theorem (pair
    parts are created by strictly lower-ranked merges). Only the merges
    DATA is shared; the encoding logic is independent on each side."""
    from pero_ocr_ray.kernels.bpe import _PASSES_SQL, fixture_merges
    # one CTE layer per merge (DuckDB caps expression nesting at 128, so
    # the replace chain cannot be one expression): layer i applies merge i
    # _PASSES_SQL times (8-deep nesting, well under the cap)
    parts = [r"""
        WITH words AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
            FROM documents),
        enc0 AS (SELECT doc_id,
                        ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS s
                 FROM words)"""]
    merges = list(fixture_merges())
    for i, (a, b) in enumerate(merges, start=1):
        expr = "s"
        for _ in range(_PASSES_SQL):
            expr = f"replace({expr}, ' {a} {b} ', ' {a}{b} ')"
        parts.append(f""",
        enc{i} AS (SELECT doc_id, {expr} AS s FROM enc{i - 1})""")
    parts.append(f"""
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(len(string_split(trim(s), ' '))) AS BIGINT)
                   AS n_bpe_tokens
        FROM enc{len(merges)} GROUP BY doc_id""")
    return "".join(parts)


def _hll_sql() -> str:
    """SQL rebuild of the engine's HyperLogLog sketch (kernels/hll.py):
    distinct whitespace tokens -> md5-high-64 hash -> register idx = top 12
    bits, rank = 53 - bit_length(low 52 bits) (integer-exact via a powers
    table) -> per-register max -> the standard estimator with linear
    counting. The estimate is approximate vs truth but DETERMINISTIC given
    the hash, so SQL lands on the same integer."""
    from pero_ocr_ray.kernels import hll
    m = hll.M
    alpha = hll._ALPHA
    pw_rows = ", ".join(f"({k}, {1 << k}::BIGINT)" for k in range(53))
    return rf"""
        WITH pw(k, v) AS (VALUES {pw_rows}),
        toks AS (SELECT DISTINCT unnest(regexp_extract_all(text, '\S+')) AS w
                 FROM documents),
        h AS (SELECT ('0x' || substr(md5(w), 1, 16))::UBIGINT AS hv
              FROM toks),
        parts AS (SELECT CAST(hv >> 52 AS BIGINT) AS idx,
                         CAST(hv & ((1::UBIGINT << 52) - 1) AS BIGINT) AS lo
                  FROM h),
        rk AS (SELECT p.idx, p.lo, MIN(pw.k) AS bl
               FROM parts p JOIN pw ON p.lo < pw.v
               GROUP BY p.idx, p.lo),
        regs AS (SELECT idx, MAX(53 - bl) AS r FROM rk GROUP BY idx),
        stats AS (SELECT count(*) AS touched,
                         SUM(pow(2.0, -r)) AS s_touched FROM regs),
        e AS (SELECT CAST({alpha!r} AS DOUBLE) * {m * m}
                     / (({m} - touched) * 1.0 + s_touched) AS est,
                     {m} - touched AS zeros
              FROM stats)
        SELECT CAST(floor(CASE WHEN est <= {2.5 * m} AND zeros > 0
                               THEN {m} * ln({m} * 1.0 / zeros)
                               ELSE est END) AS BIGINT) AS estimate
        FROM e"""


def _minhash_sql(threshold: float = 0.7, source: str = "documents") -> str:
    """From-scratch SQL mirror of functions.dedup.minhash_near_dup_pairs:
    trigram shingles -> md5-high-64 hashes (the repo-wide
    ``('0x' || substr(md5(v), 1, 16))::UBIGINT`` convention, matching
    kernels.textstats._shingle_hashes) -> 64 permutations
    ``(a*x + b) mod p`` with the uint64 product wrap made explicit
    (HUGEINT ``% 2^64``) -> min per permutation = signature -> LSH bands of
    4 rows (docs sharing any identical band are candidates) -> estimated
    Jaccard = matching permutations / 64, thresholded. The 128 permutation
    constants are inlined from kernels.textstats._MH_A/_MH_B."""
    from pero_ocr_ray.functions.dedup import MAX_BUCKET as max_bucket
    from pero_ocr_ray.kernels.textstats import _MH_A, _MH_B
    perm_rows = ", ".join(f"({i}, {int(a)}::HUGEINT, {int(b)}::HUGEINT)"
                          for i, (a, b) in enumerate(zip(_MH_A, _MH_B)))
    two64 = 1 << 64
    p = (1 << 61) - 1
    return f"""
        WITH perms(i, a, b) AS (VALUES {perm_rows}),
        t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
              FROM {source}),
        tok AS (SELECT doc_id, unnest(toks) AS w,
                       generate_subscripts(toks, 1) AS i FROM t),
        tri AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
                FROM tok a
                JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
        shd AS (SELECT DISTINCT doc_id, s FROM tri),
        hx AS (SELECT doc_id,
                      CAST(('0x' || substr(md5(s), 1, 16))::UBIGINT
                           AS HUGEINT) AS x
               FROM shd),
        sig AS (SELECT doc_id, p.i,
                       MIN(((p.a * hx.x) % {two64} + p.b) % {two64} % {p})
                           AS v
                FROM hx CROSS JOIN perms p GROUP BY doc_id, p.i),
        band AS (SELECT doc_id, i // 4 AS band,
                        string_agg(CAST(v AS VARCHAR), ',' ORDER BY i)
                            AS bkey
                 FROM sig GROUP BY doc_id, i // 4),
        -- mirror the engine's deterministic hot-bucket cap (MAX_BUCKET):
        -- a bucket keeps only its {max_bucket} smallest doc_ids
        capped AS (SELECT doc_id, band, bkey FROM (
                       SELECT doc_id, band, bkey,
                              row_number() OVER (PARTITION BY band, bkey
                                                 ORDER BY doc_id) AS rn
                       FROM band)
                   WHERE rn <= {max_bucket}),
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                 FROM capped x JOIN capped y
                   ON y.band = x.band AND y.bkey = x.bkey
                  AND x.doc_id < y.doc_id),
        est AS (SELECT c.doc_a, c.doc_b,
                       SUM(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) / 64.0
                           AS est_jaccard
                FROM cand c
                JOIN sig sa ON sa.doc_id = c.doc_a
                JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
                GROUP BY c.doc_a, c.doc_b)
        SELECT doc_a, doc_b, est_jaccard FROM est
        WHERE est_jaccard >= {threshold}"""


def _simhash_base_sql(source: str = "documents") -> str:
    """SimHash signature computation over an arbitrary doc source CTE."""
    return rf"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM {source}),
    wc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
    h AS (SELECT doc_id, c,
                 ('0x' || substr(md5(w), 1, 16))::UBIGINT AS hv FROM wc),
    b AS (SELECT doc_id, bit,
                 SUM(CASE WHEN (hv >> bit) & 1 = 1 THEN c ELSE -c END) AS acc
          FROM h CROSS JOIN (SELECT unnest(range(64)) AS bit) bits
          GROUP BY doc_id, bit),
    s AS (SELECT doc_id,
                 SUM(CASE WHEN acc > 0 THEN
                       CASE WHEN bit = 63 THEN -9223372036854775807 - 1
                            ELSE (1::BIGINT << bit) END
                     ELSE 0 END) AS simhash
          FROM b GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(CAST(s.simhash AS BIGINT), 0) AS simhash
    FROM {source} d LEFT JOIN s ON d.doc_id = s.doc_id"""


def _simhash_pairs_sql(max_hamming: int = 3) -> str:
    """SimHash near-dup PAIRS oracle over documents + injected near-copies
    (docs 0..9 with a 3-word tail, ids +1e6): signatures via
    :func:`_simhash_base_sql`, 16-bit-block pigeonhole candidates with the
    engine's deterministic MAX_BUCKET cap, exact hamming via
    bit_count(xor) on the two's-complement BIGINT view."""
    from pero_ocr_ray.functions.dedup import MAX_BUCKET
    two64 = 1 << 64
    return f"""
        WITH docs2 AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text || ' extra tail words'
            FROM documents WHERE doc_id < 10),
        sigs AS ({_simhash_base_sql('docs2')}),
        u AS (SELECT doc_id, simhash,
                     (CAST(simhash AS HUGEINT) + {two64}) % {two64} AS us
              FROM sigs),
        pw(blk, dv) AS (VALUES (0, 1::HUGEINT), (1, 65536::HUGEINT),
                               (2, 4294967296::HUGEINT),
                               (3, 281474976710656::HUGEINT)),
        blocks AS (SELECT doc_id, simhash, pw.blk,
                          CAST((us // pw.dv) % 65536 AS BIGINT) AS part
                   FROM u CROSS JOIN pw),
        capped AS (SELECT * FROM (
                       SELECT doc_id, simhash, blk, part,
                              row_number() OVER (PARTITION BY blk, part
                                                 ORDER BY doc_id) AS rn
                       FROM blocks)
                   WHERE rn <= {MAX_BUCKET}),
        pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                         bit_count(xor(x.simhash, y.simhash)) AS hamming
                  FROM capped x JOIN capped y
                    ON y.blk = x.blk AND y.part = x.part
                   AND x.doc_id < y.doc_id)
        SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
        FROM pairs WHERE hamming <= {max_hamming}"""


_SIMHASH_SQL = _simhash_base_sql()

# Shared WITH-prefix for the paragraph-dedup oracles: rebuild _para_docs's
# 10-token chunking + boilerplate injection, explode to paragraph
# instances (idx 1-based; the packed winner key doc_id*2^20+idx is
# order-isomorphic to the kernel's 0-based form), and count copies per
# paragraph STRING (the Ray side joins md5-high-64 hashes — identical
# membership up to 2^-64 collisions).
_PARA_SQL = r"""
    WITH tk AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                FROM documents),
    tokn AS (SELECT doc_id, unnest(toks) AS w,
                    generate_subscripts(toks, 1) AS i FROM tk),
    chunk AS (SELECT doc_id, (i - 1) // 10 AS c,
                     string_agg(w, ' ' ORDER BY i) AS para
              FROM tokn GROUP BY doc_id, (i - 1) // 10),
    base0 AS (SELECT doc_id,
                     string_agg(para, chr(10) || chr(10) ORDER BY c) AS text
              FROM chunk GROUP BY doc_id),
    base AS (SELECT doc_id,
                    CASE WHEN doc_id % 7 = 0
                         THEN 'please accept all cookies to continue'
                              || chr(10) || chr(10) || text
                         ELSE text END AS text
             FROM base0),
    ps AS (SELECT doc_id,
                  string_split(text, chr(10) || chr(10)) AS paras
           FROM base),
    p AS (SELECT doc_id, unnest(paras) AS para,
                 generate_subscripts(paras, 1) AS idx FROM ps),
    cnt AS (SELECT para, CAST(count(*) AS BIGINT) AS n,
                   min(doc_id * 1048576 + idx) AS wkey
            FROM p GROUP BY para),
    keep AS (SELECT p.doc_id, p.idx, p.para
             FROM p JOIN cnt ON cnt.para = p.para
             WHERE cnt.n < 2 OR p.doc_id * 1048576 + p.idx = cnt.wkey),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS np
              FROM p GROUP BY doc_id)
"""

# Shared WITH-prefix for the contamination oracles: distinct word trigrams
# per doc (the jaccard oracle's tokenize/trigram pattern), the benchmark
# shingle set (docs with doc_id % 41 = 0 — same rule as _bench_texts), and
# per-doc sizes/hit counts. Built on n-gram STRINGS — the Ray side matches
# md5-high-64 hashes, identical membership up to 2^-64 collisions.
_CONTAM_SQL = """
    WITH t AS (SELECT doc_id,
                      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS w,
                   generate_subscripts(toks, 1) AS i FROM t),
    tri AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
            FROM tok a
            JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
    shd AS (SELECT DISTINCT doc_id, s FROM tri),
    bset AS (SELECT DISTINCT s FROM shd WHERE doc_id % 41 = 0),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
              FROM shd GROUP BY doc_id),
    hits AS (SELECT shd.doc_id, CAST(count(*) AS BIGINT) AS h
             FROM shd JOIN bset ON bset.s = shd.s
             GROUP BY shd.doc_id)
"""


def _lm_body(src: str) -> str:
    """The bounded top-4096 unigram LM scoring replay
    (tfidf.doc_lm_score) as a CTE body (no WITH) trained and scored over
    ``src(doc_id, text)``; per-token micro-nat quantization BEFORE
    summation keeps both engines order-exact; ends with
    lm(doc_id, n_tokens, lm_score_e6)."""
    return f"""
    tok AS (SELECT doc_id,
                   unnest(regexp_extract_all(lower(text),
                                             '[a-z0-9]+')) AS token
            FROM {src}),
    cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n
            FROM tok GROUP BY token),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) + 4097.0 AS tp FROM cnt),
    voc AS (SELECT token, n FROM
              (SELECT token, n, row_number() OVER
                 (ORDER BY n DESC, token) AS rk FROM cnt)
            WHERE rk <= 4096),
    sc AS (SELECT token,
                  CAST(floor(ln((n + 1) / (SELECT tp FROM tot))
                             * 1e6) AS BIGINT) AS s_e6 FROM voc),
    scored AS (SELECT t.doc_id,
                      coalesce(sc.s_e6,
                               CAST(floor(ln(1.0 / (SELECT tp FROM tot))
                                          * 1e6) AS BIGINT)) AS s_e6
               FROM tok t LEFT JOIN sc USING (token)),
    lm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                  CAST(floor(CAST(sum(s_e6) AS DOUBLE) / count(*))
                       AS BIGINT) AS lm_score_e6
           FROM scored GROUP BY doc_id)
"""


_LM_SCORE_CTE = "WITH " + _lm_body("documents")


def _canon_url_sql_expr(col: str) -> str:
    """The urlnorm chain as nested DuckDB regexp_replace — generated from
    the SAME constants the kernel compiles (one source of truth)."""
    from pero_ocr_ray.kernels.urlnorm import URL_PREFIX_STR, URL_RULES
    pe = URL_PREFIX_STR.replace("'", "''")
    expr = (f"CASE WHEN regexp_matches({col}, '{pe}') THEN "
            f"lower(regexp_extract({col}, '{pe}', 1)) || "
            f"regexp_replace({col}, '{pe}', '') ELSE {col} END")
    for p, r in URL_RULES:
        p2, r2 = p.replace("'", "''"), r.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p2}', '{r2}', 'g')"
    return expr


# the dirty-url closed form of _dirty_urls, verbatim in SQL
_DIRTY_URL_SQL = """
    CASE doc_id % 5
      WHEN 0 THEN 'https://site' || CAST(doc_id % 7 AS VARCHAR)
                  || '.example/d/' || CAST(doc_id % 10 AS VARCHAR)
      WHEN 1 THEN 'HTTPS://SITE' || CAST(doc_id % 7 AS VARCHAR)
                  || '.EXAMPLE:443/d/' || CAST(doc_id % 10 AS VARCHAR)
                  || '?utm_source=feed&utm_medium=rss'
      WHEN 2 THEN 'http://site' || CAST(doc_id % 7 AS VARCHAR)
                  || '.example:80/d//' || CAST(doc_id % 10 AS VARCHAR)
                  || '#sec'
      WHEN 3 THEN 'https://site' || CAST(doc_id % 7 AS VARCHAR)
                  || '.example/d/' || CAST(doc_id % 10 AS VARCHAR)
                  || '?a=1&utm_campaign=x&b=2'
      ELSE 'https://site' || CAST(doc_id % 7 AS VARCHAR)
           || '.example/d/' || CAST(doc_id % 10 AS VARCHAR)
           || '?fbclid=c' || CAST(doc_id AS VARCHAR)
    END
"""


# two closed-form crawl snapshots (see _snapshot_sides): A drops
# doc_id%11==0, B drops doc_id%13==0 and appends ' v2' to doc_id%7==0
# texts; the diff is a FULL OUTER JOIN on url with md5-equality classes.
_SNAPDIFF_SQL = f"""
    WITH a AS (SELECT {_URL_SQL} AS url, md5(text) AS h
               FROM documents WHERE doc_id % 11 <> 0),
    b AS (SELECT {_URL_SQL} AS url,
                 md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                          ELSE text END) AS h
          FROM documents WHERE doc_id % 13 <> 0),
    diff AS (
        SELECT COALESCE(a.url, b.url) AS url,
               CASE WHEN a.url IS NULL THEN 'added'
                    WHEN b.url IS NULL THEN 'removed'
                    WHEN a.h <> b.h THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM a FULL OUTER JOIN b ON a.url = b.url)
"""


# linked-template out-links, regenerated in closed form from doc_id
# (sources/pages.py template='linked'): link k <= 1 + doc_id%5 targets host
# (doc_id*7+k)%97 at /p/{doc_id}-{k}; then one root-relative self link.
# The duplicate / fragment / mailto anchors the template also emits are
# dropped by the kernel and therefore absent here.
_LINKS_SQL = f"""
    WITH d AS (SELECT doc_id, 1 + doc_id % 5 AS n_out FROM documents),
    links AS (
        SELECT doc_id, CAST(k - 1 AS BIGINT) AS out_idx,
               'https://site' || CAST((doc_id * 7 + k) % 97 AS VARCHAR)
                   || '.example/p/' || CAST(doc_id AS VARCHAR)
                   || '-' || CAST(k AS VARCHAR) AS href
        FROM d CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS k) g
        WHERE k <= n_out
        UNION ALL
        SELECT doc_id, CAST(n_out AS BIGINT),
               'https://site' || CAST(doc_id % 97 AS VARCHAR)
                   || '.example/p/self-' || CAST(doc_id AS VARCHAR)
        FROM d)
"""

_HOST_EDGES_SQL = _LINKS_SQL + f"""
    , edges AS (
        SELECT 'site' || CAST(doc_id % 97 AS VARCHAR) || '.example'
                   AS src_host,
               regexp_extract(href, '{{host_re}}', 1) AS dst_host,
               CAST(count(*) AS BIGINT) AS weight
        FROM links GROUP BY 1, 2)
"""


def _pagerank_sql(n_iter: int = 5) -> str:
    """Unrolled-CTE replay of the exact integer PageRank iteration
    (functions/linkgraph.py): r0 = 1e6 for every host in the edge set;
    c_i = per-edge (r*w)//W summed per dst; r_i = 150000 + (85*S)//100.
    Every step is int64 floor arithmetic, so SQL == Ray bit-for-bit."""
    parts = [_HOST_EDGES_SQL.format(host_re=_HOST_RE_SQL)]
    parts.append("""
    , wt AS (SELECT src_host, CAST(SUM(weight) AS BIGINT) AS W
             FROM edges GROUP BY src_host),
    hosts AS (SELECT DISTINCT host FROM (
        SELECT src_host AS host FROM edges
        UNION SELECT dst_host FROM edges)),
    r0 AS (SELECT host, CAST(1000000 AS BIGINT) AS r FROM hosts)""")
    for i in range(1, n_iter + 1):
        parts.append(f"""
    , c{i} AS (SELECT e.dst_host AS host,
                      CAST(SUM((r.r * e.weight) // t.W) AS BIGINT) AS s
               FROM edges e
               JOIN r{i - 1} r ON r.host = e.src_host
               JOIN wt t ON t.src_host = e.src_host
               GROUP BY e.dst_host),
    r{i} AS (SELECT h.host,
                    CAST(150000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT)
                        AS r
             FROM hosts h LEFT JOIN c{i} c ON c.host = h.host)""")
    parts.append(f"""
    SELECT host, r AS rank_micro FROM r{n_iter}""")
    return "".join(parts)


def oracle_sql() -> dict[str, str]:
    from pero_ocr_ray.functions.validate import validate_sql
    return {
        "extract_simple": f"""
            SELECT {_URL_SQL} AS url, {_CANON_SQL} AS extracted_text
            FROM documents""",
        "extract_simple_metrics": f"""
            SELECT {_URL_SQL} AS url,
                   CAST(1 AS INTEGER) AS blocks_kept,
                   CAST(length({_CANON_SQL}) AS BIGINT) AS chars_emitted
            FROM documents""",
        "extract_staged": f"""
            SELECT {_URL_SQL} AS url, {_CANON_SQL} AS extracted_text
            FROM documents""",
        "doc_token_counts": r"""
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
            FROM documents""",
        "doc_subword_counts": _subword_sql(),
        "doc_bpe_counts": _bpe_sql(),
        # fertility compose: the per-doc BPE replay wrapped as a CTE,
        # lang joined back, integer micro-ratio per lang
        "bpe_fertility_by_lang": f"""
            WITH b AS ({_bpe_sql()})
            SELECT d.lang,
                   CAST(sum(b.n_words) AS BIGINT) AS n_words,
                   CAST(sum(b.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
                   CAST(sum(b.n_bpe_tokens) * 1000000
                        // sum(b.n_words) AS BIGINT) AS fertility_e6
            FROM b JOIN documents d USING (doc_id)
            GROUP BY d.lang""",
        "redact_pii": _pii_sql(),
        "repetition_stats": _REPETITION_SQL,
        "domain_counts": _domain_counts_sql(),
        "domain_cap": rf"""
            WITH u AS (SELECT doc_id, lang,
                              'https://site' || CAST(doc_id % 97 AS VARCHAR)
                                  || '.example/d/'
                                  || CAST(doc_id AS VARCHAR) AS url
                       FROM documents),
            r AS (SELECT doc_id, url, lang,
                         row_number() OVER (
                             PARTITION BY regexp_extract(url,
                                 '{_HOST_RE_SQL}', 1)
                             ORDER BY doc_id) AS rn
                  FROM u)
            SELECT doc_id, url, lang FROM r WHERE rn <= 3""",
        "top_tokens": """
            WITH t AS (SELECT unnest(regexp_extract_all(lower(text),
                                                        '[a-z0-9]+')) AS token
                       FROM documents)
            SELECT token, CAST(count(*) AS BIGINT) AS n
            FROM t GROUP BY token
            ORDER BY n DESC, token ASC LIMIT 50""",
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  )::UBIGINT % 1000
                  < CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 500
                              ELSE 250 END""",
        "doc_quality": rf"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
                   CAST(length(regexp_extract_all(lower(text), '{_STOPWORD_SQL}')) AS BIGINT) AS n_stopwords,
                   CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct
            FROM documents""",
        "gopher_quality_filter": _gopher_sql(),
        "c4_line_filter": _c4_sql(),
        "quality_classifier": _classifier_sql(),
        "quality_funnel": _funnel_sql(),
        "filter_agreement": f"""
            WITH gf AS ({_gopher_sql('documents')}),
            clf AS ({_classifier_sql('documents')})
            SELECT clf.keep_doc, gf.pass_gopher,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM clf JOIN gf USING (doc_id)
            GROUP BY clf.keep_doc, gf.pass_gopher""",
        "host_quality": _host_quality_sql(),
        "quality_upsample": _quality_upsample_sql(),
        "bitext_pairs": _bitext_sql(),
        "bitext_margin_pairs": _bitext_margin_sql(),
        "validate_corpus": validate_sql(),
        # inversion-sampling mirror: identical cumsum + u64-mod position
        # arithmetic (int64 end-to-end; UBIGINT mod == Python int mod on
        # non-negative operands)
        # span-decontamination mirror: positional trigrams (the _CONTAM_SQL
        # construction, positions kept), benchmark-set match on n-gram
        # STRINGS, window coverage via BETWEEN, kept tokens re-joined in
        # position order — identical string to the Ray side's token join
        "decontaminate_spans": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[a-z0-9]+')
                                  AS toks
                       FROM documents),
            tok AS (SELECT doc_id, unnest(toks) AS w,
                           generate_subscripts(toks, 1) AS i FROM t),
            tri AS (SELECT a.doc_id, a.i AS s,
                           a.w || ' ' || b.w || ' ' || c.w AS g
                    FROM tok a
                    JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                    JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            bset AS (SELECT DISTINCT g FROM tri WHERE doc_id % 41 = 0),
            m AS (SELECT doc_id, s FROM tri
                  WHERE g IN (SELECT g FROM bset)),
            cov AS (SELECT DISTINCT tok.doc_id, tok.i
                    FROM tok JOIN m ON m.doc_id = tok.doc_id
                                   AND tok.i BETWEEN m.s AND m.s + 2),
            kept AS (SELECT tok.doc_id, tok.w, tok.i
                     FROM tok LEFT JOIN cov
                       ON cov.doc_id = tok.doc_id AND cov.i = tok.i
                     WHERE cov.i IS NULL),
            agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                           string_agg(w, ' ' ORDER BY i) AS clean_text
                    FROM kept GROUP BY doc_id),
            tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
                    FROM tok GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(tot.n_tokens, 0) AS n_tokens,
                   coalesce(tot.n_tokens, 0) - coalesce(agg.n_kept, 0)
                       AS n_removed,
                   coalesce(agg.clean_text, '') AS clean_text
            FROM documents d
            LEFT JOIN tot USING (doc_id) LEFT JOIN agg USING (doc_id)""",
        # DSIR mirror: identical md5 buckets, identical micro-nat
        # quantization per bucket BEFORE the log-ratio subtraction, so
        # the weight table and integer doc sums are engine-exact
        "dsir_scores": r"""
            WITH tok AS (SELECT doc_id, source,
                                unnest(regexp_extract_all(lower(text),
                                       '[a-z0-9]+')) AS token
                         FROM documents),
            bk AS (SELECT doc_id, source,
                          CAST(('0x' || substr(md5(token), 1, 16))
                               ::UBIGINT % 4096 AS BIGINT) AS b
                   FROM tok),
            cnt AS (SELECT b, CAST(count(*) AS BIGINT) AS na,
                           CAST(count(*) FILTER (WHERE source = 'src0')
                                AS BIGINT) AS nt
                    FROM bk GROUP BY b),
            tots AS (SELECT CAST(sum(na) AS DOUBLE) + 4096.0 AS ta,
                            CAST(sum(nt) AS DOUBLE) + 4096.0 AS tt
                     FROM cnt),
            w AS (SELECT b,
                         CAST(floor(ln((nt + 1) / (SELECT tt FROM tots))
                                    * 1e6) AS BIGINT)
                         - CAST(floor(ln((na + 1) / (SELECT ta FROM tots))
                                      * 1e6) AS BIGINT) AS wt
                  FROM cnt),
            s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                         CAST(sum(w.wt) AS BIGINT) AS dsir_score_e6
                  FROM bk JOIN w USING (b) GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(s.n_tokens, 0) AS n_tokens,
                   coalesce(s.dsir_score_e6, 0) AS dsir_score_e6,
                   CAST(CASE WHEN coalesce(s.dsir_score_e6, 0) >= 0
                        THEN 1 ELSE 0 END AS BIGINT) AS keep_doc
            FROM documents d LEFT JOIN s USING (doc_id)""",
        "weighted_token_sample": r"""
            WITH f AS (SELECT doc_id,
                              CAST(length(regexp_extract_all(text, '\S+'))
                                   AS BIGINT) AS n_tokens
                       FROM documents),
            c AS (SELECT doc_id, n_tokens,
                         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum
                  FROM f),
            tot AS (SELECT CAST(sum(n_tokens) AS UBIGINT) AS w FROM f),
            p AS (SELECT CAST(('0x' || substr(md5('wsample42:'
                              || CAST(i AS VARCHAR)), 1, 16))::UBIGINT
                              % (SELECT w FROM tot) AS BIGINT) AS pos
                  FROM generate_series(0, 199) t(i))
            SELECT c.doc_id, c.n_tokens, CAST(count(*) AS BIGINT) AS n_hits
            FROM p JOIN c ON p.pos >= c.cum - c.n_tokens
                         AND p.pos < c.cum
            GROUP BY c.doc_id, c.n_tokens""",
        "mixed_stream": """
            WITH n AS (SELECT source, count(*) AS ns
                       FROM documents GROUP BY source),
            r AS (SELECT doc_id, source,
                         row_number() OVER (PARTITION BY source
                           ORDER BY md5('mix42:'
                                        || CAST(doc_id AS VARCHAR)),
                                    doc_id) - 1 AS rk
                  FROM documents),
            k AS (SELECT r.doc_id, r.source, r.rk,
                         (2 * r.rk + 1) * 1048576 // n.ns AS mix
                  FROM r JOIN n USING (source))
            SELECT doc_id, source, CAST(rk AS BIGINT) AS rk,
                   CAST(row_number() OVER
                          (ORDER BY mix, source, doc_id) - 1
                        AS BIGINT) AS pos
            FROM k""",
        "temperature_sample": """
            WITH c AS (SELECT lang, count(*) AS n
                       FROM documents GROUP BY lang),
            q AS (SELECT lang,
                         CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)
                           AS quota
                  FROM c),
            r AS (SELECT doc_id, lang,
                         row_number() OVER (PARTITION BY lang
                           ORDER BY ('0x' || substr(md5(
                                       CAST(doc_id AS VARCHAR)), 1, 16))
                                     ::UBIGINT, doc_id) AS rk
                  FROM documents)
            SELECT r.doc_id, r.lang, CAST(r.rk AS BIGINT) AS rk
            FROM r JOIN q USING (lang) WHERE r.rk <= q.quota""",
        "global_shuffle": """
            SELECT doc_id,
                   CAST(row_number() OVER (
                       ORDER BY md5('shuffle42:' || CAST(doc_id AS VARCHAR)),
                                doc_id) - 1 AS BIGINT) AS pos
            FROM documents""",
        "canonical_urls": f"""
            WITH u AS (SELECT doc_id, {_DIRTY_URL_SQL} AS url
                       FROM documents)
            SELECT doc_id, url,
                   {_canon_url_sql_expr('url')} AS canon_url
            FROM u""",
        "canonical_dedup": f"""
            WITH u AS (SELECT doc_id, {_DIRTY_URL_SQL} AS url
                       FROM documents)
            SELECT {_canon_url_sql_expr('url')} AS canon_url,
                   CAST(count(*) AS BIGINT) AS n_urls,
                   CAST(min(doc_id) AS BIGINT) AS min_id
            FROM u GROUP BY 1""",
        "snapshot_diff": _SNAPDIFF_SQL + """
            SELECT url, status FROM diff""",
        "snapshot_diff_counts": _SNAPDIFF_SQL + """
            SELECT status, CAST(count(*) AS BIGINT) AS n_urls
            FROM diff GROUP BY status""",
        "extract_links": _LINKS_SQL + f"""
            SELECT {_URL_SQL} AS src_url, out_idx, href FROM links""",
        "host_edges": _HOST_EDGES_SQL.format(host_re=_HOST_RE_SQL) + """
            SELECT src_host, dst_host, weight FROM edges""",
        "pagerank_hosts": _pagerank_sql(5),
        "top_hosts_by_rank": _pagerank_sql(5)
        + " ORDER BY rank_micro DESC, host ASC LIMIT 10",
        "anchor_texts": """
            WITH d AS (SELECT doc_id, 1 + doc_id % 5 AS n_out
                       FROM documents),
            occ AS (
                SELECT 'https://site'
                           || CAST((doc_id * 7 + k) % 97 AS VARCHAR)
                           || '.example/p/' || CAST(doc_id AS VARCHAR)
                           || '-' || CAST(k AS VARCHAR) AS href,
                       'l' || CAST(k AS VARCHAR) AS anchor_text
                FROM d CROSS JOIN
                     (SELECT unnest(generate_series(1, 5)) AS k) g
                WHERE k <= n_out
                UNION ALL
                SELECT 'https://site'
                           || CAST((doc_id * 7 + 1) % 97 AS VARCHAR)
                           || '.example/p/' || CAST(doc_id AS VARCHAR)
                           || '-1', 'l1'
                FROM d
                UNION ALL
                SELECT 'https://site' || CAST(doc_id % 97 AS VARCHAR)
                           || '.example/p/self-'
                           || CAST(doc_id AS VARCHAR), 'self'
                FROM d)
            SELECT href, anchor_text, CAST(count(*) AS BIGINT) AS n
            FROM occ GROUP BY 1, 2""",
        "doc_content_hash": "SELECT doc_id, md5(text) AS content_hash FROM documents",
        "doc_lang_id": _lang_id_sql(),
        "training_corpus_stats": r"""
            WITH surv AS (
                SELECT min(doc_id) AS doc_id, text
                FROM documents
                GROUP BY text
                ),
            surv2 AS (
                SELECT s.doc_id, d.lang, s.text
                FROM surv s JOIN documents d ON d.doc_id = s.doc_id),
            feat AS (
                SELECT doc_id, lang,
                       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT)
                           AS n_tokens,
                       CAST(length(regexp_extract_all(lower(text),
                            '\b(?:the|and|of|a|to|in|is|for|on|with)\b'))
                           AS BIGINT) AS n_stop
                FROM surv2),
            kept AS (SELECT * FROM feat
                     WHERE n_tokens >= 20 AND n_stop <= 0.5 * n_tokens)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
            FROM kept GROUP BY lang""",
        "jaccard_near_dup_pairs": """
            WITH docs2 AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text || ' extra tail words'
                FROM documents WHERE doc_id < 10),
            t AS (SELECT doc_id,
                         regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                  FROM docs2),
            tok AS (SELECT doc_id, unnest(toks) AS w,
                           generate_subscripts(toks, 1) AS i FROM t),
            tri AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
                    FROM tok a
                    JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                    JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            shd AS (SELECT DISTINCT doc_id, s FROM tri),
            sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                             count(*) AS i
                      FROM shd x JOIN shd y
                        ON x.s = y.s AND x.doc_id < y.doc_id
                      GROUP BY 1, 2)
            SELECT inter.doc_a, inter.doc_b,
                   CAST(inter.i AS DOUBLE) / (sa.n + sb.n - inter.i)
                       AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = inter.doc_a
            JOIN sizes sb ON sb.doc_id = inter.doc_b
            WHERE CAST(inter.i AS DOUBLE) / (sa.n + sb.n - inter.i) >= 0.6""",
        "ngram_contamination": _CONTAM_SQL + """
            SELECT d.doc_id,
                   COALESCE(sz.n, 0) AS n_ngrams,
                   COALESCE(h.h, 0) AS n_hits,
                   CASE WHEN COALESCE(sz.n, 0) > 0
                        THEN COALESCE(h.h, 0) * 1000000 // sz.n
                        ELSE 0 END AS contam_e6,
                   COALESCE(h.h, 0) > 0 AS is_contaminated
            FROM documents d
            LEFT JOIN sizes sz ON sz.doc_id = d.doc_id
            LEFT JOIN hits h ON h.doc_id = d.doc_id""",
        "decontaminate_corpus": _CONTAM_SQL + """
            SELECT d.doc_id
            FROM documents d
            LEFT JOIN hits h ON h.doc_id = d.doc_id
            WHERE COALESCE(h.h, 0) = 0""",
        "paragraph_dedup_docs": _PARA_SQL + """
            SELECT k.doc_id,
                   string_agg(k.para, chr(10) || chr(10)
                              ORDER BY k.idx) AS text,
                   s.np AS n_paras,
                   s.np - CAST(count(*) AS BIGINT) AS n_dropped
            FROM keep k JOIN sizes s ON s.doc_id = k.doc_id
            GROUP BY k.doc_id, s.np""",
        "duplicate_paragraphs": _PARA_SQL + """
            SELECT ('0x' || substr(md5(para), 1, 16))::UBIGINT AS para_hash,
                   n AS n_copies,
                   CAST(wkey // 1048576 AS BIGINT) AS winner_doc_id
            FROM cnt WHERE n >= 2""",
        "inverted_index": """
            WITH d2 AS (SELECT doc_id,
                               text || ' tag' || CAST(doc_id % 250 AS VARCHAR)
                                   AS text
                        FROM documents),
            tok AS (SELECT doc_id,
                           unnest(regexp_extract_all(lower(text),
                                                     '[a-z0-9]+')) AS w
                    FROM d2),
            tf AS (SELECT w AS token, doc_id,
                          CAST(count(*) AS BIGINT) AS tf
                   FROM tok GROUP BY w, doc_id),
            stats AS (SELECT token, CAST(count(*) AS BIGINT) AS doc_freq,
                             CAST(SUM(tf) AS BIGINT) AS total_tf
                      FROM tf GROUP BY token),
            top AS (SELECT token, doc_id AS top_doc FROM tf
                    QUALIFY row_number() OVER (PARTITION BY token
                                               ORDER BY tf DESC, doc_id) = 1),
            posts AS (SELECT tf.token,
                             string_agg(CAST(tf.doc_id AS VARCHAR), ','
                                        ORDER BY tf.doc_id) AS postings
                      FROM tf JOIN stats ON stats.token = tf.token
                      WHERE stats.doc_freq <= 32 GROUP BY tf.token)
            SELECT s.token, s.doc_freq, s.total_tf, t.top_doc,
                   COALESCE(p.postings, '') AS postings
            FROM stats s
            JOIN top t ON t.token = s.token
            LEFT JOIN posts p ON p.token = s.token""",
        "training_chunks": r"""
            WITH tk AS (SELECT doc_id,
                               regexp_extract_all(text, '\S+') AS toks
                        FROM documents),
            tokn AS (SELECT doc_id, unnest(toks) AS w,
                            generate_subscripts(toks, 1) AS i FROM tk),
            sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                   FROM tokn GROUP BY doc_id),
            cs AS (SELECT doc_id,
                          CASE WHEN n <= 64 THEN 0
                               ELSE (n - 64 + 55) // 56 END AS c_max
                   FROM sz),
            cc AS (SELECT doc_id, unnest(range(0, c_max + 1)) AS c FROM cs),
            j AS (SELECT cc.doc_id, cc.c, t.w, t.i
                  FROM cc JOIN tokn t ON t.doc_id = cc.doc_id
                   AND t.i - 1 >= cc.c * 56 AND t.i - 1 < cc.c * 56 + 64)
            SELECT doc_id, CAST(c AS BIGINT) AS chunk_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   string_agg(w, ' ' ORDER BY i) AS text
            FROM j GROUP BY doc_id, c""",
        "normalize_text": _normalize_sql(),
        # chunk sizes re-derived arithmetically (min(64, n - c*56)), then
        # the greedy running-fill recurrence replayed as a recursive CTE
        # (depth = max rows per bucket).
        "pack_sequences": r"""
            WITH RECURSIVE
            sz AS (SELECT doc_id,
                          CAST(length(regexp_extract_all(text, '\S+'))
                               AS BIGINT) AS n
                   FROM documents
                   WHERE length(regexp_extract_all(text, '\S+')) > 0),
            cs AS (SELECT doc_id, n,
                          CASE WHEN n <= 64 THEN 0
                               ELSE (n - 64 + 55) // 56 END AS c_max
                   FROM sz),
            ch0 AS (SELECT doc_id, unnest(range(0, c_max + 1)) AS c, n
                    FROM cs),
            ch AS (SELECT CAST(doc_id % 8 AS BIGINT) AS bucket, doc_id,
                          CAST(c AS BIGINT) AS chunk_id,
                          CAST(least(64, n - c * 56) AS BIGINT) AS n_tokens,
                          row_number() OVER (PARTITION BY doc_id % 8
                                             ORDER BY doc_id, c) AS rn
                   FROM ch0),
            rec AS (
                SELECT bucket, rn, doc_id, chunk_id, n_tokens,
                       CAST(0 AS BIGINT) AS seq_id, n_tokens AS seq_fill
                FROM ch WHERE rn = 1
                UNION ALL
                SELECT c.bucket, c.rn, c.doc_id, c.chunk_id, c.n_tokens,
                       CASE WHEN r.seq_fill + c.n_tokens <= 256
                            THEN r.seq_id ELSE r.seq_id + 1 END,
                       CASE WHEN r.seq_fill + c.n_tokens <= 256
                            THEN r.seq_fill + c.n_tokens
                            ELSE c.n_tokens END
                FROM rec r JOIN ch c
                  ON c.bucket = r.bucket AND c.rn = r.rn + 1)
            SELECT bucket, seq_id, doc_id, chunk_id, n_tokens, seq_fill
            FROM rec""",
        # tfidf_e6 = floor((tf * ln(N/df)) * 1e6): identical association
        # order to the numpy kernel; ranking/tie-break on the INTEGER
        # score so the top-5 cut is engine-independent.
        "doc_tfidf_topk": """
            WITH tok AS (SELECT doc_id,
                                unnest(regexp_extract_all(lower(text),
                                                          '[a-z0-9]+')) AS token
                         FROM documents),
            tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
                   FROM tok GROUP BY doc_id, token),
            dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df
                    FROM tf GROUP BY token),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
            s AS (SELECT tf.doc_id, tf.token, tf.tf, dfr.df,
                         CAST(floor((tf.tf * ln((SELECT n FROM n) / dfr.df))
                                    * 1e6) AS BIGINT) AS tfidf_e6
                  FROM tf JOIN dfr USING (token)),
            r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                             ORDER BY tfidf_e6 DESC, token) AS rk FROM s)
            SELECT doc_id, token, tf, df, tfidf_e6 FROM r WHERE rk <= 5""",
        # Bounded unigram LM: vocab = top 4096 tokens (count desc, token),
        # add-one smoothing over T + V + 1; every per-token log-prob is
        # quantized to int64 micro-nats BEFORE summation (exact integer
        # sums on both engines — no float-order divergence).
        "doc_lm_score": _LM_SCORE_CTE + """
            SELECT doc_id, n_tokens, lm_score_e6 FROM lm""",
        "index_search": """
            WITH tok AS (SELECT doc_id,
                                unnest(regexp_extract_all(lower(text),
                                                          '[a-z0-9]+'))
                                    AS token
                         FROM documents),
            g AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
                  FROM tok WHERE token IN ('batch', 'key')
                  GROUP BY doc_id, token)
            SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score
            FROM g GROUP BY doc_id HAVING count(*) = 2""",
        "url_blocklist_filter": f"""
            WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents)
            SELECT doc_id, url FROM u
            WHERE NOT ((doc_id % 97) % 10 = 3)
              AND NOT regexp_matches(url, '/d/[0-9]*0$')""",
        "url_seen_probe": f"""
            WITH corpus AS (SELECT {_URL_SQL} AS url FROM documents),
            cand AS (SELECT doc_id,
                            CASE WHEN doc_id % 3 = 0 THEN {_URL_SQL}
                                 ELSE 'https://absent'
                                      || CAST(doc_id AS VARCHAR)
                                      || '.example/x' END AS url
                     FROM documents WHERE doc_id % 3 < 2),
            pos AS (SELECT DISTINCT
                        ('0x' || substr(md5(url), 1 + 8 * j, 8))::UBIGINT
                            % 1048576 AS p
                    FROM corpus CROSS JOIN
                         (SELECT unnest([0, 1, 2, 3]) AS j) g),
            h AS (SELECT doc_id, url,
                         ('0x' || substr(md5(url), 1, 8))::UBIGINT
                             % 1048576 AS h0,
                         ('0x' || substr(md5(url), 9, 8))::UBIGINT
                             % 1048576 AS h1,
                         ('0x' || substr(md5(url), 17, 8))::UBIGINT
                             % 1048576 AS h2,
                         ('0x' || substr(md5(url), 25, 8))::UBIGINT
                             % 1048576 AS h3
                  FROM cand)
            SELECT doc_id, url,
                   CAST(CASE WHEN h0 IN (SELECT p FROM pos)
                              AND h1 IN (SELECT p FROM pos)
                              AND h2 IN (SELECT p FROM pos)
                              AND h3 IN (SELECT p FROM pos)
                        THEN 1 ELSE 0 END AS BIGINT) AS maybe_seen
            FROM h""",
        "training_corpus_v4": f"""
            WITH surv0 AS (SELECT min(doc_id) AS doc_id
                           FROM documents GROUP BY text),
            kept0 AS (SELECT d.doc_id, d.text, d.lang
                      FROM documents d JOIN surv0 USING (doc_id)),
            wt AS (SELECT doc_id,
                          regexp_extract_all(lower(text),
                                             '[a-z0-9]+') AS toks
                   FROM kept0),
            win AS (SELECT doc_id,
                           substr(md5(array_to_string(toks[k:k+7], ' ')),
                                  1, 16) AS whash
                    FROM wt CROSS JOIN
                         (SELECT unnest(generate_series(1,
                              (SELECT max(len(toks)) FROM wt))) AS k) g
                    WHERE k <= len(toks) - 7),
            wcnt AS (SELECT whash, count(*) AS n FROM win GROUP BY whash),
            wstat AS (SELECT w.doc_id, count(*) AS n_win,
                             sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END)
                                 AS n_dup
                      FROM win w JOIN wcnt c USING (whash)
                      GROUP BY w.doc_id),
            kept AS (SELECT k.* FROM kept0 k
                     LEFT JOIN wstat s USING (doc_id)
                     WHERE s.doc_id IS NULL OR 2 * s.n_dup <= s.n_win),
            {_lm_body('kept')},
            wl AS (SELECT lm.doc_id, k.lang, lm.lm_score_e6
                   FROM lm JOIN kept k USING (doc_id)),
            pb AS (SELECT doc_id, lang, lm_score_e6,
                          CASE NTILE(3) OVER (PARTITION BY lang
                                   ORDER BY lm_score_e6 DESC, doc_id)
                               WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                               ELSE 'tail' END AS bucket
                   FROM wl)
            SELECT doc_id, lang, lm_score_e6, bucket,
                   CAST(row_number() OVER (
                       ORDER BY md5('shuffle42:' || CAST(doc_id AS VARCHAR)),
                                doc_id) - 1 AS BIGINT) AS pos
            FROM pb WHERE bucket <> 'tail'""",
        "dup_window_stats": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text),
                                                 '[a-z0-9]+') AS toks
                       FROM documents),
            win AS (SELECT doc_id,
                           substr(md5(array_to_string(toks[k:k+7], ' ')),
                                  1, 16) AS whash
                    FROM t CROSS JOIN
                         (SELECT unnest(generate_series(1,
                              (SELECT max(len(toks)) FROM t))) AS k) g
                    WHERE k <= len(toks) - 7),
            cnt AS (SELECT whash, count(*) AS n FROM win GROUP BY whash)
            SELECT w.doc_id,
                   CAST(count(*) AS BIGINT) AS n_windows,
                   CAST(sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_windows
            FROM win w JOIN cnt c USING (whash)
            GROUP BY w.doc_id""",
        "perplexity_buckets": _LM_SCORE_CTE + """
            , wl AS (SELECT lm.doc_id, d.lang, lm.lm_score_e6
                     FROM lm JOIN documents d USING (doc_id))
            SELECT doc_id, lang, lm_score_e6,
                   CASE NTILE(3) OVER (PARTITION BY lang
                            ORDER BY lm_score_e6 DESC, doc_id)
                        WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM wl""",
        # histogram-split mirror: same bin rule (floor of an exact
        # double division — |score| << 2^53), same window cumsum over
        # bins DESC, same max-filter thresholds, same >= assignment
        "perplexity_buckets_hist": _LM_SCORE_CTE + """
            , wl AS (SELECT lm.doc_id, d.lang, lm.lm_score_e6
                     FROM lm JOIN documents d USING (doc_id)),
            q AS (SELECT doc_id, lang, lm_score_e6,
                         CAST(floor(CAST(lm_score_e6 AS DOUBLE) / 100000)
                              AS BIGINT) AS qs
                  FROM wl),
            h AS (SELECT lang, qs, CAST(count(*) AS BIGINT) AS n
                  FROM q GROUP BY lang, qs),
            c AS (SELECT lang, qs,
                         SUM(n) OVER (PARTITION BY lang ORDER BY qs DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum,
                         SUM(n) OVER (PARTITION BY lang) AS total
                  FROM h),
            t AS (SELECT lang,
                         max(qs) FILTER (WHERE cum >= (total + 2) // 3)
                             AS q1,
                         max(qs) FILTER (WHERE cum >= (2 * total + 2)
                                                      // 3) AS q2
                  FROM c GROUP BY lang)
            SELECT q.doc_id, q.lang, q.lm_score_e6,
                   CASE WHEN q.qs >= t.q1 THEN 'head'
                        WHEN q.qs >= t.q2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM q JOIN t USING (lang)""",
        "token_budget_cut": r"""
            WITH f AS (SELECT doc_id, lang,
                              CAST(length(regexp_extract_all(text, '\S+'))
                                   AS BIGINT) AS n_tokens
                       FROM documents),
            c AS (SELECT doc_id, lang, n_tokens,
                         SUM(n_tokens) OVER (PARTITION BY lang
                             ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum
                  FROM f)
            SELECT doc_id, lang, n_tokens FROM c WHERE cum <= 1500""",
        "docs_above_lang_median": r"""
            WITH f AS (SELECT doc_id, lang,
                              CAST(length(regexp_extract_all(text, '\S+'))
                                   AS BIGINT) AS n_tokens
                       FROM documents),
            med AS (SELECT lang,
                           CAST(quantile_disc(n_tokens, 0.5) AS BIGINT) AS m
                    FROM f GROUP BY lang)
            SELECT f.doc_id, f.lang, f.n_tokens
            FROM f JOIN med ON med.lang = f.lang
            WHERE f.n_tokens > med.m""",
        "simhash_signatures": _SIMHASH_SQL,
        "simhash_near_dup_pairs": _simhash_pairs_sql(3),
        "minhash_near_dup_pairs": _minhash_sql(0.7),
        "near_dup_clusters": f"""
            WITH RECURSIVE prs AS ({_minhash_sql(0.7)}),
            edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
                      UNION ALL SELECT doc_b, doc_a FROM prs),
            nodes AS (SELECT DISTINCT a AS d FROM edges),
            reach(d, n) AS (
                SELECT d, d FROM nodes
                UNION
                SELECT r.d, e.b FROM reach r JOIN edges e ON e.a = r.n)
            SELECT d AS doc_id, CAST(MIN(n) AS BIGINT) AS cluster_id
            FROM reach GROUP BY d""",
        # keep-best-copy compose: the recursive closure above + the
        # classifier CTE + an argmax window (score DESC, doc_id)
        "cluster_representatives": f"""
            WITH RECURSIVE prs AS ({_minhash_sql(0.7)}),
            edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
                      UNION ALL SELECT doc_b, doc_a FROM prs),
            nodes AS (SELECT DISTINCT a AS d FROM edges),
            reach(d, n) AS (
                SELECT d, d FROM nodes
                UNION
                SELECT r.d, e.b FROM reach r JOIN edges e ON e.a = r.n),
            cl AS (SELECT d AS doc_id, CAST(MIN(n) AS BIGINT)
                       AS cluster_id
                   FROM reach GROUP BY d),
            clf AS ({_classifier_sql('documents')}),
            j AS (SELECT cl.cluster_id, cl.doc_id, clf.clf_score
                  FROM cl JOIN clf USING (doc_id)),
            r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
                      ORDER BY clf_score DESC, doc_id) AS rn FROM j)
            SELECT cluster_id, doc_id AS rep_doc_id,
                   clf_score AS rep_score
            FROM r WHERE rn = 1""",
        "orders_per_segment": """
            SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment""",
        "approx_distinct_tokens": _hll_sql(),
        "select_config": _select_config_sql(),
        "training_corpus_v2": _training_v2_sql(),
        "training_corpus_v3": _PARA_SQL + r"""
            , rebuilt AS (
                SELECT k.doc_id,
                       string_agg(k.para, chr(10) || chr(10)
                                  ORDER BY k.idx) AS text,
                       s.np - CAST(count(*) AS BIGINT) AS n_dropped
                FROM keep k JOIN sizes s ON s.doc_id = k.doc_id
                GROUP BY k.doc_id, s.np),
            rt AS (SELECT doc_id,
                          regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM rebuilt),
            rtok AS (SELECT doc_id, unnest(toks) AS w,
                            generate_subscripts(toks, 1) AS i FROM rt),
            rtri AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
                     FROM rtok a
                     JOIN rtok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                     JOIN rtok c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
            rshd AS (SELECT DISTINCT doc_id, s FROM rtri),
            bt AS (SELECT doc_id,
                          regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents WHERE doc_id % 41 = 0),
            btok AS (SELECT doc_id, unnest(toks) AS w,
                            generate_subscripts(toks, 1) AS i FROM bt),
            btri AS (SELECT DISTINCT b1.w || ' ' || b2.w || ' ' || b3.w AS s
                     FROM btok b1
                     JOIN btok b2 ON b2.doc_id = b1.doc_id AND b2.i = b1.i + 1
                     JOIN btok b3 ON b3.doc_id = b1.doc_id AND b3.i = b1.i + 2),
            chits AS (SELECT rshd.doc_id, CAST(count(*) AS BIGINT) AS h
                      FROM rshd JOIN btri ON btri.s = rshd.s
                      GROUP BY rshd.doc_id),
            clean AS (SELECT r.* FROM rebuilt r
                      LEFT JOIN chits h ON h.doc_id = r.doc_id
                      WHERE COALESCE(h.h, 0) = 0),
            surv AS (SELECT * FROM clean
                     QUALIFY row_number() OVER (PARTITION BY text
                                                ORDER BY doc_id) = 1),
            lng AS (SELECT s.doc_id, s.text, s.n_dropped, d.lang
                    FROM surv s JOIN documents d ON d.doc_id = s.doc_id),
            feat AS (SELECT doc_id, lang, n_dropped,
                            CAST(length(regexp_extract_all(text, '\S+'))
                                 AS BIGINT) AS n_tokens,
                            CAST(length(regexp_extract_all(lower(text),
                                 '""" + _STOPWORD_SQL + r"""'))
                                 AS BIGINT) AS n_stop
                     FROM lng),
            kept2 AS (SELECT * FROM feat
                      WHERE n_tokens >= 20 AND n_stop <= 0.5 * n_tokens)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
                   CAST(SUM(n_dropped) AS BIGINT) AS sum_dropped_paras
            FROM kept2 GROUP BY lang""",
        "page_quality": _page_quality_sql(),
        "merge_best": rf"""
            WITH a AS (SELECT doc_id, {_URL_SQL} AS url,
                              {_CANON_SQL} AS ta
                       FROM documents),
            b AS (SELECT doc_id,
                         CASE WHEN doc_id % 2 = 0
                              THEN trim(regexp_replace(text || ' ' || text,
                                                       '\s+', ' ', 'g'))
                              ELSE trim(regexp_replace(
                                       regexp_replace(text, '[aeiou]', '',
                                                      'g'),
                                       '\s+', ' ', 'g'))
                         END AS tb
                  FROM documents)
            SELECT a.url,
                   CASE WHEN length(b.tb) > length(a.ta) THEN b.tb
                        ELSE a.ta END AS extracted_text,
                   CAST(CASE WHEN length(b.tb) > length(a.ta) THEN 1
                             ELSE 0 END AS BIGINT) AS engine_rank
            FROM a JOIN b ON a.doc_id = b.doc_id""",
        # Multimodal oracles: the fake containers are filled with the
        # closed-form pixel/sample formulas below, so DuckDB regenerates the
        # payload content arithmetically and checks the distributed
        # decode/feature path exactly (no parquet views needed).
        "image_features": """
            WITH px AS (
                SELECT i.range AS item_id,
                       ((i.range * 37 + j.range * 101) % 256) // 16 AS bin
                FROM range(200) i CROSS JOIN range(576) j),
            c AS (SELECT item_id, bin, count(*) AS n
                  FROM px GROUP BY item_id, bin),
            grid AS (SELECT i.range AS item_id, b.range AS bin
                     FROM range(200) i CROSS JOIN range(16) b)
            SELECT g.item_id, CAST(16 AS BIGINT) AS width,
                   CAST(12 AS BIGINT) AS height, CAST(3 AS BIGINT) AS channels,
                   g.bin, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
            FROM grid g LEFT JOIN c
              ON c.item_id = g.item_id AND c.bin = g.bin""",
        "image_resize": """
            WITH o AS (
                SELECT i.range AS item_id, y.range AS y, x.range AS x,
                       ch.range AS ch
                FROM range(200) i CROSS JOIN range(6) y
                CROSS JOIN range(8) x CROSS JOIN range(3) ch),
            v AS (SELECT item_id, y * 24 + x * 3 + ch AS k,
                         (item_id * 37
                          + ((y * 2) * 48 + (x * 2) * 3 + ch) * 101) % 256
                             AS val
                  FROM o)
            SELECT item_id, CAST(8 AS BIGINT) AS width,
                   CAST(6 AS BIGINT) AS height,
                   CAST(SUM(val * (k + 1)) AS BIGINT) AS checksum
            FROM v GROUP BY item_id""",
        "video_frame_samples": """
            WITH f AS (SELECT i.range AS item_id, fj.range * 4 AS frame_idx
                       FROM range(60) i CROSS JOIN range(3) fj),
            v AS (SELECT item_id, frame_idx,
                         (item_id * 37
                          + (frame_idx * 144 + p.range) * 101) % 256 AS val
                  FROM f CROSS JOIN range(144) p)
            SELECT item_id, frame_idx, CAST(SUM(val) AS BIGINT) AS frame_sum
            FROM v GROUP BY item_id, frame_idx""",
        "audio_features": """
            WITH s AS (SELECT i.range AS item_id, t.range AS t,
                              ((i.range * 7 + t.range * 13) % 24001) - 12000
                                  AS x
                       FROM range(100) i CROSS JOIN range(4000) t),
            d AS (SELECT item_id, t, x,
                         CASE WHEN x < 0 THEN 1 ELSE 0 END AS neg,
                         lag(CASE WHEN x < 0 THEN 1 ELSE 0 END)
                             OVER (PARTITION BY item_id ORDER BY t) AS pneg
                  FROM s)
            SELECT item_id, 0.5 AS duration_sec,
                   CAST(SUM(x * x) AS BIGINT) AS energy,
                   CAST(SUM(CASE WHEN pneg IS NULL THEN 0
                                 ELSE ABS(neg - pneg) END) AS BIGINT)
                       AS zero_crossings
            FROM d GROUP BY item_id""",
        "doc_fingerprints": _fingerprint_sql(),
        "embedding_near_dup": """
            WITH emb2 AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000, embedding FROM embeddings
                WHERE vec_id < 10)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM emb2 a JOIN emb2 b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95""",
        "dedup_pages_latest": f"""
            SELECT {_URL_SQL} AS url,
                   CAST(CASE WHEN doc_id % 10 = 0 THEN doc_id + 1000000
                             ELSE doc_id END AS BIGINT) AS row_id
            FROM documents""",
        # golden-fixture oracles: sequential single-process replay through
        # the SAME kernels (tools/make_cases_fixture.py; the reference's
        # golden-output E2E strategy, test/processing_test.sh:83-124).
        # corpus_len discriminates the sf dir (row counts collide across
        # sf0.001/sf0.01).
        "extract_cases": f"""
            SELECT url, payload_kind, blocks_kept, blocks_dropped,
                   chars_emitted, text_md5
            FROM read_parquet('{_REPO}/tests/golden/cases_oracle.parquet')
            WHERE corpus_len = (SELECT sum(length(text)) FROM documents)""",
        "refine_cases": f"""
            SELECT url, refined_md5, refined_chars
            FROM read_parquet('{_REPO}/tests/golden/cases_oracle.parquet')
            WHERE corpus_len = (SELECT sum(length(text)) FROM documents)""",
        # (tools/make_golden_fixtures.py: beam decode / PDF render / IVF
        # scan replayed sequentially through the same shared kernels)
        "beam_decode_docs": f"""
            SELECT doc_id, decoded_md5, conf_e6, n_lines
            FROM read_parquet('{_REPO}/tests/golden/beam_oracle.parquet')
            WHERE corpus_len = (SELECT sum(length(text)) FROM documents)""",
        "searchable_pdf": f"""
            SELECT url, pdf_md5, n_bytes, readback_ok, has_image_layer
            FROM read_parquet('{_REPO}/tests/golden/pdf_oracle.parquet')
            WHERE corpus_len = (SELECT sum(length(text)) FROM documents)""",
        "ivf_knn": f"""
            SELECT query_id, neighbor_id, rank
            FROM read_parquet('{_REPO}/tests/golden/ivf_oracle.parquet')
            WHERE corpus_len = (SELECT sum(length(text)) FROM documents)""",
        "kmeans_clusters": f"""
            SELECT vec_id, cluster_id, dist2_q
            FROM read_parquet('{_REPO}/tests/golden/kmeans_oracle.parquet')
            WHERE corpus_len = (SELECT sum(length(text)) FROM documents)""",
        "semantic_dedup": f"""
            SELECT vec_id, cluster_id, kept, dropped_by, capped
            FROM read_parquet('{_REPO}/tests/golden/semdedup_oracle.parquet')
            WHERE corpus_len = (SELECT sum(length(text)) FROM documents)""",
        "refine_dehyphenate": r"""
            SELECT 'https://site' || CAST(doc_id % 97 AS VARCHAR)
                       || '.example/d/' || CAST(doc_id AS VARCHAR) AS url,
                   regexp_replace(
                       regexp_replace(text, '([a-z]{2,}) ([a-z]{2,})',
                                      '\1-' || chr(10) || '\2', 'g'),
                       '([A-Za-z]{2,})-' || chr(10) || '([a-z]{2,})',
                       '\1\2', 'g') AS refined_text
            FROM documents""",
        "compare_runs_cer": rf"""
            WITH t AS (
                SELECT {_URL_SQL} AS url,
                       {_CANON_SQL} AS hyp,
                       trim(regexp_replace(
                            regexp_replace(text, '[aeiou]', '', 'g'),
                            '\s+', ' ', 'g')) AS ref
                FROM documents)
            SELECT url,
                   CAST(levenshtein(hyp, ref) AS BIGINT) AS char_errors,
                   CAST(length(ref) AS BIGINT) AS ref_chars
            FROM t""",
        "merge_linewise": f"""
            SELECT {_URL_SQL} AS url,
                   'b0000l000' AS line_id,
                   {_CANON_SQL} AS line_text,
                   CAST(0 AS BIGINT) AS engine_rank
            FROM documents""",
        "page_xml_roundtrip": f"""
            SELECT {_URL_SQL} AS url, {_CANON_SQL} AS extracted_text
            FROM documents""",
        "alto_lines": f"""
            SELECT {_URL_SQL} AS url, 'b0000' AS block_id,
                   {_CANON_SQL} AS line_text
            FROM documents""",
        "dedup_exact_groups": """
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
                   md5(text) AS content_hash,
                   CAST(count(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY text""",
        # vowel-strip + ws-recollapse only DELETES chars, so ref is a
        # subsequence of hyp, every minimal alignment is deletions-only,
        # and the confusion multiset == per-char count difference (see
        # _q_confusion_top docstring; cross-checked by
        # tools/make_confusion_fixture.py sequential replay)
        "confusion_top": rf"""
            WITH h AS (SELECT {_CANON_SQL} AS t FROM documents),
                 r AS (SELECT trim(regexp_replace(
                           regexp_replace(text, '[aeiou]', '', 'g'),
                           '\s+', ' ', 'g')) AS t FROM documents),
                 hc AS (SELECT ch, count(*) AS n
                        FROM (SELECT unnest(regexp_extract_all(t, '.')) AS ch
                              FROM h) GROUP BY ch),
                 rc AS (SELECT ch, count(*) AS n
                        FROM (SELECT unnest(regexp_extract_all(t, '.')) AS ch
                              FROM r) GROUP BY ch),
                 d AS (SELECT hc.ch, hc.n - coalesce(rc.n, 0) AS n
                       FROM hc LEFT JOIN rc USING (ch))
            SELECT ch AS hyp_char, '' AS ref_char, CAST(n AS BIGINT) AS n,
                   CAST(row_number() OVER (ORDER BY n DESC, ch) AS BIGINT)
                       AS rank
            FROM d WHERE n > 0 ORDER BY n DESC, ch LIMIT 20""",
        "knn_cosine": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe
                       FROM embeddings WHERE vec_id < 5),
                 s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                              list_cosine_similarity(q.qe, e.embedding) AS sim
                       FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
                 r AS (SELECT query_id, neighbor_id,
                              row_number() OVER (PARTITION BY query_id
                                                 ORDER BY sim DESC, neighbor_id) AS rank
                       FROM s)
            SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 10""",
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY event_type, date_trunc('hour', ts)""",
        # Monday-start week truncation on both engines (Arrow
        # floor_temporal(week) == DuckDB date_trunc('week')); offsets are
        # exact integer arithmetic on week-truncated stamps.
        "user_retention": """
            WITH c AS (SELECT user_id, date_trunc('week', min(ts))
                                            AS cohort_week
                       FROM events GROUP BY user_id),
            a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w
                  FROM events)
            SELECT CAST(c.cohort_week AS TIMESTAMP) AS cohort_week,
                   CAST(date_diff('day', c.cohort_week, a.w) // 7
                        AS BIGINT) AS week_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM a JOIN c USING (user_id)
            GROUP BY c.cohort_week, week_offset""",
        # step k = min ts of a step-k event STRICTLY after the user's
        # step-(k-1) time; one row per completed-prefix step.
        "event_funnel": """
            WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
                   WHERE e.event_type = 'click' GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
                   WHERE e.event_type = 'purchase' GROUP BY e.user_id)
            SELECT '1_view' AS step,
                   CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
            UNION ALL SELECT '2_click',
                   CAST((SELECT count(*) FROM s2) AS BIGINT)
            UNION ALL SELECT '3_purchase',
                   CAST((SELECT count(*) FROM s3) AS BIGINT)""",
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS sum_qty,
                   CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS sum_base_cents,
                   CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS sum_disc_cents,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
            GROUP BY l_returnflag, l_linestatus""",
        "q3_top_orders": """
            SELECT o.o_orderkey,
                   CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100) AS BIGINT)
                       AS revenue_cents,
                   o.o_orderdate
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
              AND l.l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY o.o_orderkey, o.o_orderdate
            ORDER BY revenue_cents DESC, o.o_orderkey ASC
            LIMIT 10""",
        "suppliers_per_nation": """
            SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_suppliers
            FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY n.n_name""",
        "doc_lang_counts": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang""",
        "events_sessionize": _SESSIONIZE_SQL,
        "events_sessionize_bucketed": _SESSIONIZE_SQL,
        "distinct_brands": "SELECT DISTINCT p_brand FROM part",
        "top_parts_by_price": """
            SELECT p_partkey,
                   CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
            FROM part
            ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 5""",
        "customer_segment_counts": """
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
            FROM customer GROUP BY c_mktsegment""",
        "token_quantiles_by_lang": r"""
            WITH t AS (
                SELECT lang,
                       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT)
                           AS n_tokens
                FROM documents)
            SELECT lang,
                   CAST(quantile_disc(n_tokens, 0.25) AS BIGINT) AS p25,
                   CAST(quantile_disc(n_tokens, 0.50) AS BIGINT) AS p50,
                   CAST(quantile_disc(n_tokens, 0.90) AS BIGINT) AS p90
            FROM t GROUP BY lang""",
        "asof_purchase_view": _ASOF_SQL,
        "asof_purchase_view_bucketed": _ASOF_SQL,
        "warc_extract": f"""
            SELECT 'https://warc.example/d/' || CAST(doc_id AS VARCHAR) AS url,
                   {_CANON_SQL} AS extracted_text
            FROM documents WHERE doc_id < 200""",
        "events_sliding": """
            WITH w AS (
                SELECT event_type,
                       unnest([date_trunc('hour', ts),
                               date_trunc('hour', ts) - INTERVAL 1 HOUR])
                           AS window_start
                FROM events)
            SELECT event_type, window_start,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM w GROUP BY event_type, window_start""",
        "extract_lines": rf"""
            SELECT {_URL_SQL} AS url,
                   'b0000' AS block_id, 'b0000l000' AS line_id,
                   CAST(length(text) - length(regexp_replace(text, '^\s+', ''))
                        AS BIGINT) AS char_start,
                   CAST(length(regexp_replace(text, '\s+$', ''))
                        AS BIGINT) AS char_end,
                   {_CANON_SQL} AS line_text
            FROM documents""",
    }
