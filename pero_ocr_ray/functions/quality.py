"""Quality metrics over extraction outputs.

* ``page_quality``: power-mean (p=6) of per-block logistic confidences over
  the KEPT blocks of each page — the analog of the reference's page
  confidence summary (/root/reference/pero_ocr/core/layout.py:778-847,
  power-mean over word confidences with a bbox filter; here the keep mask
  is the filter and the block keep-score is the confidence source). Runs
  the parse→segment→classify kernels directly over the pages table (the
  reference's ``get_quality`` is likewise computed from the layout tree,
  not from the emitted text).
* ``compare_runs`` / ``compare_extractions``: corpus CER/WER between two
  extraction runs — the compare_txt / error_summary analog
  (/root/reference/user_scripts/compare_txt.py:59-169,
  pero_ocr/error_summary.py:101-163). Cluster-correct shape: tag both runs,
  union, ONE hash shuffle keyed on url collapses duplicates and aligns
  hyp↔ref inside the group, per-doc stats stream out, one tiny global
  aggregate. Neither side is ever materialized on the driver — both runs
  scale with the corpus.
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd
from ray.data.aggregate import Sum

from pero_ocr_ray.kernels.align import (
    levenshtein_alignment, levenshtein_distance,
)


def power_mean(values: list[float], p: int = 6) -> float:
    """Power mean; emphasises the worst values for p<0 / best for p>0."""
    if not values:
        return 0.0
    return (sum(v ** p for v in values) / len(values)) ** (1.0 / p)


class PageQualityStage:
    """Actor-pool stage: pages (url, html) -> (url, quality_e6).

    Per row: parse → segment → classify (the same shared kernels the
    extraction chain runs), then power-mean the kept blocks' logistic
    confidences (:func:`pero_ocr_ray.kernels.score.page_quality_score`).
    Emitted as ``floor(quality * 1e6)`` int64 so the correctness gate's
    value hash is immune to last-ulp libm differences vs the SQL oracle."""

    def __init__(self, cfg: dict | None = None, p: int = 6):
        from pero_ocr_ray.kernels.config import ExtractConfig
        self.cfg = ExtractConfig(**cfg) if cfg else ExtractConfig()
        self.p = p

    def __call__(self, batch):
        import math
        import pyarrow as pa
        from pero_ocr_ray.kernels.emit import parse_payload, segment_blocks
        from pero_ocr_ray.kernels.score import (
            classify_blocks, page_quality_score,
        )
        urls, quals = [], []
        for url, raw in zip(batch.column("url").to_pylist(),
                            batch.column("html").to_pylist()):
            try:
                blocks, _, _, _ = parse_payload(raw, self.cfg)
                segment_blocks(blocks)
                classify_blocks(blocks, self.cfg)
                q = page_quality_score(blocks, self.p)
            except Exception:  # skip-and-continue: poison row -> quality 0
                q = 0.0
            urls.append(url)
            quals.append(int(math.floor(q * 1_000_000)))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "quality_e6": pa.array(quals, pa.int64())})


def page_quality(pages: rd.Dataset, p: int = 6,
                 concurrency: int = 2) -> rd.Dataset:
    """-> (url, quality_e6): per-page quality power-mean over a pages table
    (url, html). See :class:`PageQualityStage`."""
    return pages.map_batches(
        PageQualityStage, fn_constructor_kwargs={"p": p},
        batch_format="pyarrow", concurrency=concurrency)


def _normalize_ws(text: str) -> str:
    """compare_txt.py:54-56 analog."""
    return " ".join(text.split())


def _tag_union(a: rd.Dataset, b: rd.Dataset) -> rd.Dataset:
    """(url, extracted_text, side) union of two runs — the single-shuffle
    input shared by the comparison operators."""
    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "url": df["url"].astype("string").astype(object),
                "extracted_text": df["extracted_text"],
                "side": pd.Series([side] * len(df), dtype="int64"),
            })
        return fn
    return (a.select_columns(["url", "extracted_text"])
             .map_batches(tag(0), batch_format="pandas")
             .union(b.select_columns(["url", "extracted_text"])
                     .map_batches(tag(1), batch_format="pandas")))


def _collapse_pair(g: pd.DataFrame) -> tuple[str, str] | None:
    """Duplicate urls (recrawls) collapse on BOTH sides with the same
    deterministic rule — keep the lexicographically largest text — so a
    self-compare is exactly 0. Returns (hyp, ref) or None if either side
    is absent (inner-join semantics)."""
    hyps = g.loc[g["side"] == 0, "extracted_text"]
    refs = g.loc[g["side"] == 1, "extracted_text"]
    if hyps.empty or refs.empty:
        return None
    return hyps.max(), refs.max()


def compare_runs(a: rd.Dataset, b: rd.Dataset,
                 normalize: bool = True,
                 max_chars: int | None = None) -> rd.Dataset:
    """Per-url error stats of run ``a`` (hyp) vs run ``b`` (ref) ->
    (url, char_errors, ref_chars, word_errors, ref_words). One url-keyed
    shuffle; streams at corpus scale.

    ``max_chars`` is the skew guard for web-scale corpora: Levenshtein is
    quadratic for DISSIMILAR documents (the prefix/suffix trim only helps
    near-identical pairs), so a single divergent multi-MB page can consume
    a worker for minutes. When set, both sides are truncated to
    ``max_chars`` before the edit stats (deterministic; documented
    approximation — corpus CER over truncated prefixes). Unset = exact
    (the gate/oracle configuration)."""
    def per_url(g: pd.DataFrame) -> pd.DataFrame:
        pair = _collapse_pair(g)
        if pair is None:
            return pd.DataFrame({
                "url": pd.Series([], dtype=object),
                **{c: pd.Series([], dtype="int64") for c in
                   ("char_errors", "ref_chars", "word_errors", "ref_words")},
            })
        hyp, ref = pair
        if normalize:
            hyp, ref = _normalize_ws(hyp), _normalize_ws(ref)
        if max_chars is not None:
            hyp, ref = hyp[:max_chars], ref[:max_chars]
        return pd.DataFrame({
            "url": [g["url"].iloc[0]],
            "char_errors": pd.Series(
                [levenshtein_distance(hyp, ref)], dtype="int64"),
            "ref_chars": pd.Series([len(ref)], dtype="int64"),
            "word_errors": pd.Series(
                [levenshtein_distance(hyp.split(), ref.split())],
                dtype="int64"),
            "ref_words": pd.Series([len(ref.split())], dtype="int64"),
        })

    return _tag_union(a, b).groupby("url").map_groups(
        per_url, batch_format="pandas")


def compare_extractions(a: rd.Dataset, b: rd.Dataset,
                        normalize: bool = True,
                        max_chars: int | None = None) -> dict:
    """Corpus CER/WER of run ``a`` (hyp) against run ``b`` (ref), joined on
    url. Returns the aggregated stats dict (small driver-side result; the
    per-doc work is fully distributed — see :func:`compare_runs`, incl.
    the ``max_chars`` skew guard)."""
    per = compare_runs(a, b, normalize=normalize, max_chars=max_chars)

    def add_count(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_docs"] = pd.Series([1] * len(df), dtype="int64")
        return df

    agg = (per.map_batches(add_count, batch_format="pandas")
              .aggregate(Sum("char_errors"), Sum("ref_chars"),
                         Sum("word_errors"), Sum("ref_words"), Sum("n_docs")))
    out = {k.replace("sum(", "").replace(")", ""): (v or 0)
           for k, v in (agg or {}).items()}
    for k in ("char_errors", "ref_chars", "word_errors", "ref_words", "n_docs"):
        out.setdefault(k, 0)
    out["cer"] = (out["char_errors"] / out["ref_chars"]) if out["ref_chars"] else 0.0
    out["wer"] = (out["word_errors"] / out["ref_words"]) if out["ref_words"] else 0.0
    return out


def compare_pagexml_dirs(hyp_paths, ref_paths,
                         normalize: bool = True) -> dict:
    """Corpus CER/WER between two on-disk PAGE-XML corpora — the
    compare_page_xml_texts analog
    (/root/reference/user_scripts/compare_page_xml_texts.py:30-83), built
    on the real PAGE-XML reader: both corpora stream through
    ``read_pagexml_files`` → ``emit`` and meet in the distributed
    url-keyed comparison (:func:`compare_extractions`)."""
    import functools
    from pero_ocr_ray.kernels.config import DEFAULT_CONFIG
    from pero_ocr_ray.sources.pagexml import read_pagexml_files
    from pero_ocr_ray.stages.extract import emit_stage

    def load(paths):
        ds = read_pagexml_files(paths)
        return ds.map_batches(
            functools.partial(emit_stage, cfg=DEFAULT_CONFIG),
            batch_format="pyarrow")

    return compare_extractions(load(hyp_paths), load(ref_paths),
                               normalize=normalize)


def confusion_counts(a: rd.Dataset, b: rd.Dataset, top_k: int = 50,
                     normalize: bool = True) -> rd.Dataset:
    """Character confusion tallies between two runs joined on url — the
    reference's confusion-Counter merge
    (/root/reference/pero_ocr/error_summary.py:101-163). Per-url alignment
    emits (hyp_char, ref_char, n) partials inside the url-keyed group; one
    small groupby sums the tallies; top_k by count. Insertions/deletions
    appear with the empty string on one side."""
    def per_url(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"pair": pd.Series([], dtype=object),
                              "n_partial": pd.Series([], dtype="int64")})
        pair = _collapse_pair(g)
        if pair is None:
            return empty
        hyp, ref = pair
        if normalize:
            hyp, ref = _normalize_ws(hyp), _normalize_ws(ref)
        if hyp == ref:
            return empty
        counts: dict[tuple[str, str], int] = {}
        for h_ch, r_ch in levenshtein_alignment(hyp, ref):
            if h_ch != r_ch:
                key = (h_ch or "", r_ch or "")
                counts[key] = counts.get(key, 0) + 1
        if not counts:
            return empty
        return pd.DataFrame({
            "pair": [f"{h}\x00{r}" for h, r in counts],
            "n_partial": pd.Series(list(counts.values()), dtype="int64"),
        })

    agg = (_tag_union(a, b).groupby("url")
           .map_groups(per_url, batch_format="pandas")
           .groupby("pair").aggregate(Sum("n_partial", alias_name="n")))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["pair"].str.split("\x00", n=1, expand=True)
        return pd.DataFrame({
            "hyp_char": parts[0],
            "ref_char": parts[1] if 1 in parts else "",
            "n": df["n"].astype("int64"),
        })

    out = agg.map_batches(finalize, batch_format="pandas")

    def add_rank(df: pd.DataFrame) -> pd.DataFrame:
        # fully key-determined total order (n desc, hyp_char, ref_char):
        # ties at the top_k boundary resolve identically on every run and
        # in the sequential replay, and the emitted rank pins each row
        df = df.sort_values(["n", "hyp_char", "ref_char"],
                            ascending=[False, True, True],
                            ignore_index=True)
        df["rank"] = pd.Series(range(1, len(df) + 1), dtype="int64")
        return df

    return (out.sort(["n", "hyp_char", "ref_char"],
                     descending=[True, False, False])
               .limit(top_k)
               .repartition(1)
               .map_batches(add_rank, batch_format="pandas",
                            batch_size=None))
