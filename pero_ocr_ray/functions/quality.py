"""Quality metrics over extraction outputs.

* ``page_quality``: power-mean (p=6) of per-block keep-scores — the analog
  of the reference's page confidence summary
  (/root/reference/pero_ocr/core/layout.py:778-847, power-mean over word
  confidences).
* ``compare_extractions``: corpus CER/WER between two extraction runs —
  the compare_txt / error_summary analog
  (/root/reference/user_scripts/compare_txt.py:59-169,
  pero_ocr/error_summary.py:101-163), as the classic partial+final shape:
  per-doc stats in ``map_batches``, one tiny global aggregate.
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd
from ray.data.aggregate import Sum

from pero_ocr_ray.kernels.align import levenshtein_distance


def power_mean(values: list[float], p: int = 6) -> float:
    """Power mean; emphasises the worst values for p<0 / best for p>0."""
    if not values:
        return 0.0
    return (sum(v ** p for v in values) / len(values)) ** (1.0 / p)


def page_quality(extracted: rd.Dataset, p: int = 6) -> rd.Dataset:
    """-> (url, quality): power-mean of kept-block share signals per page."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        quality = []
        for m in df["metrics"]:
            total = max(1, m["blocks_total"])
            kept_share = m["blocks_kept"] / total
            quality.append(round(power_mean([kept_share], p), 6))
        return pd.DataFrame({"url": df["url"], "quality": quality})
    return extracted.map_batches(fn, batch_format="pandas")


def _normalize_ws(text: str) -> str:
    """compare_txt.py:54-56 analog."""
    return " ".join(text.split())


def confusion_counts(a: rd.Dataset, b: rd.Dataset, top_k: int = 50,
                     normalize: bool = True) -> rd.Dataset:
    """Character confusion tallies between two runs joined on url — the
    reference's confusion-Counter merge
    (/root/reference/pero_ocr/error_summary.py:101-163) as partial+final:
    per-doc alignment emits (hyp_char, ref_char, n) rows inside
    ``map_batches``; one small groupby sums them; top_k by count.
    Insertions/deletions appear with the empty string on one side."""
    import ray
    from pero_ocr_ray.kernels.align import levenshtein_alignment

    ref_rows: dict[str, str] = {}
    for r in b.select_columns(["url", "extracted_text"]).take_all():
        prev = ref_rows.get(r["url"])
        if prev is None or r["extracted_text"] > prev:
            ref_rows[r["url"]] = r["extracted_text"]
    ref_ref = ray.put(ref_rows)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        refs = ray.get(ref_ref)
        counts: dict[tuple[str, str], int] = {}
        for url, hyp in zip(df["url"], df["extracted_text"]):
            ref = refs.get(url)
            if ref is None:
                continue
            if normalize:
                hyp, ref = _normalize_ws(hyp), _normalize_ws(ref)
            if hyp == ref:
                continue
            for h_ch, r_ch in levenshtein_alignment(hyp, ref):
                if h_ch != r_ch:
                    key = (h_ch or "", r_ch or "")
                    counts[key] = counts.get(key, 0) + 1
        if not counts:
            return pd.DataFrame({"pair": pd.Series([], dtype="object"),
                                 "n_partial": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "pair": [f"{h}\x00{r}" for h, r in counts],
            "n_partial": pd.Series(list(counts.values()), dtype="int64"),
        })

    from ray.data.aggregate import Sum
    agg = (a.map_batches(partial, batch_format="pandas")
            .groupby("pair").aggregate(Sum("n_partial", alias_name="n")))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["pair"].str.split("\x00", n=1, expand=True)
        return pd.DataFrame({
            "hyp_char": parts[0],
            "ref_char": parts[1] if 1 in parts else "",
            "n": df["n"].astype("int64"),
        })

    out = agg.map_batches(finalize, batch_format="pandas")
    return (out.sort(["n", "hyp_char"], descending=[True, False])
               .limit(top_k))


def compare_extractions(a: rd.Dataset, b: rd.Dataset,
                        normalize: bool = True) -> dict:
    """Corpus CER/WER of run ``a`` (hyp) against run ``b`` (ref), joined on
    url. Returns the aggregated stats dict (small driver-side result)."""
    # duplicate urls (recrawls): BOTH sides collapse per url with the same
    # deterministic rule — keep the lexicographically largest text — so the
    # comparison is run-vs-run keyed by url and a self-compare is exactly 0.
    ref_rows: dict[str, str] = {}
    for r in b.select_columns(["url", "extracted_text"]).take_all():
        prev = ref_rows.get(r["url"])
        if prev is None or r["extracted_text"] > prev:
            ref_rows[r["url"]] = r["extracted_text"]
    import ray
    ref_ref = ray.put(ref_rows)

    def collapse(group: pd.DataFrame) -> pd.DataFrame:
        return (group.sort_values("extracted_text").tail(1)
                [["url", "extracted_text"]])

    a = (a.select_columns(["url", "extracted_text"])
          .groupby("url").map_groups(collapse, batch_format="pandas"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        refs = ray.get(ref_ref)
        rows = []
        for url, hyp in zip(df["url"], df["extracted_text"]):
            ref = refs.get(url)
            if ref is None:
                continue
            if normalize:
                hyp, ref = _normalize_ws(hyp), _normalize_ws(ref)
            rows.append({
                "char_errors": levenshtein_distance(hyp, ref),
                "ref_chars": len(ref),
                "word_errors": levenshtein_distance(hyp.split(), ref.split()),
                "ref_words": len(ref.split()),
                "n_docs": 1,
            })
        if not rows:
            return pd.DataFrame({k: pd.Series([], dtype="int64") for k in
                                 ("char_errors", "ref_chars", "word_errors",
                                  "ref_words", "n_docs")})
        return pd.DataFrame(rows)

    agg = (a.map_batches(partial, batch_format="pandas")
            .aggregate(Sum("char_errors"), Sum("ref_chars"),
                       Sum("word_errors"), Sum("ref_words"), Sum("n_docs")))
    out = {k.replace("sum(", "").replace(")", ""): v for k, v in agg.items()}
    out["cer"] = (out["char_errors"] / out["ref_chars"]) if out.get("ref_chars") else 0.0
    out["wer"] = (out["word_errors"] / out["ref_words"]) if out.get("ref_words") else 0.0
    return out
