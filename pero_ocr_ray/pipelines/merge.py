"""N-way merge of extraction results (J2 analog).

The reference merges N parallel OCR outputs of the same pages by zipping
lines and keeping the max-confidence transcription per line
(/root/reference/user_scripts/merge_ocr_results.py:50-76). The Ray recast:
``union`` the result datasets, ``groupby(url)``, pick the best candidate per
url — here "best" = most chars emitted, tie-broken by engine priority
(input order), all deterministic.
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd


def merge_results_linewise(results: list[rd.Dataset]) -> rd.Dataset:
    """Line-level N-way merge — the reference's actual merge granularity
    (merge_ocr_results.py zips ``lines_iterator()`` across engines and keeps
    the max-confidence transcription per line, asserting line ids match).

    Here: explode each run to (url, line_seq, line_text), union, group by
    (url, line_seq), keep the longest text (tie: engine order). Assumes the
    runs share page structure (same extraction kernel, different
    refinement/config) — the reference makes the same assumption via its
    line-id assertion."""
    from pero_ocr_ray.stages.extract import explode_lines

    tagged = []
    for i, ds in enumerate(results):
        flat = explode_lines(ds)

        def tag(df: pd.DataFrame, _i=i) -> pd.DataFrame:
            df = df.copy()
            df["engine_rank"] = _i
            df["line_key"] = df["url"] + "#" + df["line_id"]
            return df[["line_key", "url", "line_id", "line_text", "engine_rank"]]

        tagged.append(flat.map_batches(tag, batch_format="pandas"))
    unioned = tagged[0].union(*tagged[1:]) if len(tagged) > 1 else tagged[0]

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        g = group.assign(_len=group["line_text"].str.len())
        g = g.sort_values(["_len", "engine_rank"], ascending=[False, True])
        return g.head(1).drop(columns=["_len", "line_key"])

    return unioned.groupby("line_key").map_groups(pick, batch_format="pandas")


def merge_results(results: list[rd.Dataset]) -> rd.Dataset:
    """Union N extraction outputs, keep the best row per url."""
    tagged = []
    for i, ds in enumerate(results):
        def tag(df: pd.DataFrame, _i=i) -> pd.DataFrame:
            df = df.copy()
            df["engine_rank"] = _i
            return df
        tagged.append(ds.map_batches(tag, batch_format="pandas"))
    unioned = tagged[0].union(*tagged[1:]) if len(tagged) > 1 else tagged[0]

    def pick_best(group: pd.DataFrame) -> pd.DataFrame:
        g = group.assign(_chars=group["extracted_text"].str.len())
        g = g.sort_values(["_chars", "engine_rank"], ascending=[False, True])
        return g.head(1).drop(columns=["_chars"])

    return unioned.groupby("url").map_groups(pick_best, batch_format="pandas")
