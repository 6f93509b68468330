"""Text analysis over a ``documents`` table (doc_id, text, ...).

Vectorized pandas string kernels inside ``map_batches``; the language-ID
stage is an actor pool holding precompiled profiles (the reference's
warm-engine shape, /root/reference/pero_ocr/document_ocr/page_parser.py:302-335
LineFilter analog — a lightweight per-record classifier with loaded state).
"""

from __future__ import annotations

import hashlib

import pandas as pd

import ray.data as rd

from pero_ocr_ray.kernels import textstats as K


def token_counts(ds: rd.Dataset) -> rd.Dataset:
    """-> (doc_id, n_tokens). Vectorized regex count per batch."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": df["text"].str.count(K.TOKEN_RE).astype("int64"),
        })
    return ds.map_batches(fn, batch_format="pandas")


def subword_token_counts(ds: rd.Dataset) -> rd.Dataset:
    """-> (doc_id, n_subwords): BPE-ish pretoken counts (kernels.textstats
    SUBWORD_RE — the GPT-2-style token-budget estimator; identical regex
    evaluated by the DuckDB oracle). Vectorized str.count per batch."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_subwords": df["text"].str.count(K.SUBWORD_RE).astype("int64"),
        })
    return ds.map_batches(fn, batch_format="pandas")


def bpe_doc_counts(ds: rd.Dataset,
                   carry_cols: tuple[str, ...] = ()) -> rd.Dataset:
    """-> (doc_id, n_words, n_bpe_tokens): REAL merges-table BPE subword
    budget per document (kernels/bpe.py fixture tokenizer) — the round-5
    upgrade over the ``SUBWORD_RE`` pretoken estimate. Vectorized: words
    explode per batch, each DISTINCT word encodes once (memoized canonical
    BPE), per-doc sums are a pandas groupby. Token-less docs are omitted
    (matches the SQL mirror's inner GROUP BY). The DuckDB oracle replays
    encoding as an unrolled rank-order replace chain over the SAME merges
    table — exact by the trained-merges equivalence theorem
    (kernels/bpe.py module docstring)."""
    import pyarrow as pa
    from pero_ocr_ray.kernels.bpe import bpe_token_count

    def fn(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].str.lower().str.findall(K.SHINGLE_RE)
        ex = pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "w": toks,
        }).explode("w", ignore_index=True).dropna(subset=["w"])
        if len(ex) == 0:
            empty = {"doc_id": pa.array([], pa.int64()),
                     "n_words": pa.array([], pa.int64()),
                     "n_bpe_tokens": pa.array([], pa.int64())}
            for c in carry_cols:
                empty[c] = pa.array([], pa.string())
            return pa.table(empty)
        counts = {w: bpe_token_count(w) for w in ex["w"].unique()}
        ex["t"] = ex["w"].map(counts).astype("int64")
        g = (ex.groupby("doc_id", as_index=False)
             .agg(n_words=("t", "size"), n_bpe_tokens=("t", "sum")))
        out = {
            "doc_id": pa.array(g["doc_id"].to_numpy("int64"), pa.int64()),
            "n_words": pa.array(g["n_words"].to_numpy("int64"), pa.int64()),
            "n_bpe_tokens": pa.array(g["n_bpe_tokens"].to_numpy("int64"),
                                     pa.int64()),
        }
        if carry_cols:  # one value per doc row rides along (no join)
            side = (df.assign(doc_id=df["doc_id"].astype("int64"))
                    [["doc_id", *carry_cols]].drop_duplicates("doc_id"))
            m = g[["doc_id"]].merge(side, on="doc_id")
            for c in carry_cols:
                out[c] = pa.array(m[c], pa.string())
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pandas")


def train_bpe_corpus(ds: rd.Dataset, n_merges: int = 1024,
                     vocab_cap: int = 65536) -> list[tuple[str, str]]:
    """Corpus-scale BPE training -> ordered merges table.

    Scale shape: the trainer's input is a (word, count) table, NOT the
    corpus — word counts come from the per-batch value-counts combiner +
    one ``groupby(token).Sum`` (a hot word crosses the shuffle as one
    partial per block), the vocabulary is cut to the ``vocab_cap`` most
    frequent words by a distributed top-k (batch-local head + one tiny
    final — only ``vocab_cap`` rows ever reach the driver), and the merge
    loop itself runs driver-side on that bounded table (inherently
    sequential: merge k+1's pair statistics depend on merge k). This is
    how production tokenizers are trained on web corpora — the vocabulary
    cut, not the corpus size, bounds the trainer.

    Deterministic: the top-k cut orders (count desc, token asc) and the
    trainer's tie-break is (count desc, pair asc) — partitioning-invariant
    end-to-end (pytest-verified against the sequential trainer)."""
    from pero_ocr_ray.functions.tfidf import _token_counts
    from pero_ocr_ray.kernels.bpe import train_bpe

    counts = _token_counts(ds)

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "token"],
                              ascending=[False, True]).head(vocab_cap)

    vocab = (counts.map_batches(local_top, batch_format="pandas")
             .repartition(1)
             .map_batches(local_top, batch_format="pandas",
                          batch_size=None)
             .take_all())  # bounded: <= vocab_cap rows
    return train_bpe({r["token"]: int(r["n"]) for r in vocab}, n_merges)


def top_tokens(ds: rd.Dataset, k: int = 50) -> rd.Dataset:
    """-> (token, n) the corpus-wide k most frequent lowercase alnum
    tokens (count desc, token asc tie-break).

    Scale shape: per-batch vectorized token value-counts (combiner — the
    shuffle moves per-token partials, bounded by the batch vocabulary, not
    the token stream), one groupby(token) Sum, then a distributed top-k
    (batch-local head + one tiny final) — never a full sort of the
    vocabulary."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        counts = (df["text"].str.lower().str.findall(K.SHINGLE_RE)
                  .explode().value_counts())
        return pd.DataFrame({"token": counts.index.astype(str),
                             "n_partial": counts.values.astype("int64")})

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("token").aggregate(Sum("n_partial", alias_name="n")))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "token"],
                              ascending=[False, True]).head(k)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n", "token"],
                            ascending=[False, True]).head(k)
        return pd.DataFrame({"token": df["token"].astype(str),
                             "n": df["n"].astype("int64")})

    return (agg.map_batches(local_topk, batch_format="pandas")
               .repartition(1)
               .map_batches(final_topk, batch_format="pandas",
                            batch_size=None))


def quality_scores(ds: rd.Dataset) -> rd.Dataset:
    """-> integer quality features per doc (SQL-checkable)."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"]
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_chars": text.str.len().astype("int64"),
            "n_tokens": text.str.count(K.TOKEN_RE).astype("int64"),
            "n_stopwords": text.str.lower().str.count(K.STOPWORD_RE).astype("int64"),
            "n_punct": text.str.count(K.PUNCT_RE).astype("int64"),
        })
    return ds.map_batches(fn, batch_format="pandas")


# text-normalization chain (C4-style cleanup), applied IN ORDER. Each rule
# is an (RE2-compatible regex, replacement) pair evaluated identically by
# Python re and DuckDB regexp_replace(..., 'g') — explicit ASCII classes
# (RE2's \s is ASCII), no lookaround, no backrefs in patterns.
NORMALIZE_RULES: tuple[tuple[str, str], ...] = (
    (r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", ""),   # control chars (keep \t\n\r)
    ("[‘’‚‛]", "'"),          # curly single quotes
    ("[“”„‟]", '"'),          # curly double quotes
    ("[–—―]", "-"),                # en/em/horizontal dashes
    (" ", " "),                              # no-break space
    (r"[ \t]+", " "),                             # horizontal ws runs
    (r" ?\r?\n ?", "\n"),                         # strip ws around newlines
    (r"\n{3,}", "\n\n"),                          # >2 blank lines collapse
    (r"^[ \n]+|[ \n]+$", ""),                     # trim
)


def normalize_text(ds: rd.Dataset) -> rd.Dataset:
    """-> (doc_id, norm_text, n_chars_removed): the deterministic
    normalization chain above, vectorized (pandas str.replace per rule);
    ``n_chars_removed = len(text) - len(norm_text)``. Pure streaming map —
    no shuffle; the DuckDB oracle nests the same regexp_replace chain."""
    import re as _re
    compiled = [(_re.compile(p), r) for p, r in NORMALIZE_RULES]

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        norm = df["text"].fillna("")
        orig_len = norm.str.len().astype("int64")
        for pat, rep in compiled:
            norm = norm.str.replace(pat, rep, regex=True)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "norm_text": norm,
            "n_chars_removed": (orig_len
                                - norm.str.len().astype("int64")),
        })

    return ds.map_batches(fn, batch_format="pandas")


class LangIdStage:
    """Actor-pool language identifier (profiles compiled once per actor)."""

    def __init__(self):
        self.profiles = {code: frozenset(words)
                         for code, words in K.LANG_PROFILES.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "lang_pred": [K.lang_id(t) for t in df["text"]],
        })


def lang_ids(ds: rd.Dataset, concurrency: int = 2) -> rd.Dataset:
    return ds.map_batches(LangIdStage, batch_format="pandas",
                          concurrency=concurrency)


def content_hashes(ds: rd.Dataset) -> rd.Dataset:
    """-> (doc_id, content_hash) md5 — matches DuckDB ``md5(text)``."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "content_hash": [hashlib.md5(t.encode("utf-8")).hexdigest()
                             for t in df["text"]],
        })
    return ds.map_batches(fn, batch_format="pandas")


def approx_distinct(ds: rd.Dataset, column: str,
                    tokenize: bool = False) -> dict:
    """HLL approximate distinct count of ``column`` (or of its whitespace
    tokens when ``tokenize``), as a native Ray ``AggregateFn``: each block
    accumulates into a 4 KB sketch, sketches tree-merge inside the
    aggregation — no raw values and no sketch list ever reach the driver."""
    from ray.data.aggregate import AggregateFn
    from pero_ocr_ray.kernels import hll

    # State is ONE bytes blob (sketch ++ uint64 block count): a plain
    # Arrow binary column. A (bytes, int) tuple state made every
    # aggregate task fall back to pickled-object blocks with a loud
    # ArrowConversionError warning per task — thousands of log lines and
    # a slower shuffle on a real corpus.
    def pack(sk, n: int) -> bytes:
        return hll.serialize(sk) + n.to_bytes(8, "big")

    def unpack(state: bytes):
        return hll.deserialize(state[:-8]), int.from_bytes(state[-8:], "big")

    def accumulate(state, block) -> bytes:
        sk, n = unpack(state)
        col = (block[column].to_pylist() if hasattr(block, "column_names")
               else list(block[column]))
        if tokenize:
            for text in col:
                hll.add_many(sk, K.TOKEN_RE.findall(text))
        else:
            hll.add_many(sk, (str(v) for v in col))
        return pack(sk, n + 1)

    def merge(a, b) -> bytes:
        sa, na = unpack(a)
        sb, nb = unpack(b)
        return pack(hll.merge(sa, sb), na + nb)

    def finalize(state) -> bytes:
        sk, n = unpack(state)
        return hll.estimate(sk).to_bytes(8, "big") + n.to_bytes(8, "big")

    agg = ds.aggregate(AggregateFn(
        init=lambda k: pack(hll.empty_sketch(), 0),
        merge=merge,
        accumulate_block=accumulate,
        finalize=finalize,
        name="hll",
    ))
    out = agg["hll"]
    return {"estimate": int.from_bytes(out[:8], "big"),
            "sketches_merged": int.from_bytes(out[8:], "big")}


def fingerprints(ds: rd.Dataset) -> rd.Dataset:
    """-> (doc_id, fingerprint) rolling-hash document fingerprint."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "fingerprint": [K.rolling_fingerprint(t) for t in df["text"]],
        })
    return ds.map_batches(fn, batch_format="pandas")


def bpe_fertility_by_lang(ds: rd.Dataset) -> rd.Dataset:
    """-> (lang, n_words, n_bpe_tokens, fertility_e6): the tokenizer-eval
    fertility metric (BPE subwords per whitespace word) per language, as
    the exact integer micro-ratio ``sum_bpe * 1e6 // sum_words``. High
    fertility flags languages the tokenizer fragments — the standard
    signal for rebalancing a multilingual vocab. Combiner shape: per-doc
    BPE counts (lang carried) -> per-batch (lang, sums) partials -> one
    tiny groupby(lang)."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    counts = bpe_doc_counts(ds, carry_cols=("lang",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("lang", as_index=False)
                .agg(w_partial=("n_words", "sum"),
                     b_partial=("n_bpe_tokens", "sum")))

    agg = (counts.map_batches(partial, batch_format="pandas")
           .groupby("lang").aggregate(Sum("w_partial", alias_name="n_words"),
                                      Sum("b_partial",
                                          alias_name="n_bpe_tokens")))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        w = df["n_words"].astype("int64")
        b = df["n_bpe_tokens"].astype("int64")
        return pd.DataFrame({
            "lang": df["lang"].astype(str),
            "n_words": w,
            "n_bpe_tokens": b,
            "fertility_e6": (b * 1_000_000 // w).astype("int64"),
        })

    return agg.map_batches(finalize, batch_format="pandas")
