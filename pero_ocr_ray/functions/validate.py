"""Corpus expectation checks — the data-quality monitor stage.

Production training-data pipelines gate every ingest behind schema /
invariant monitors (Great-Expectations-style): null keys, empty or
whitespace-only payloads, metadata that disagrees with the payload
(n_chars vs the text), out-of-whitelist languages, short documents,
duplicate primary keys. This operator evaluates a fixed rule list in
ONE streaming pass and returns per-rule violation counts.

Scale shape: row-local rules produce per-batch partial counts (one row
per rule per batch — the combiner pattern; the exchange moves rule
partials, never documents). The one non-local rule (duplicate ids)
adds a (doc_id, n) partial-count groupby — the exact-dedup combiner
shape — whose over-1 groups fold into the same (rule, n) stream. Both
streams union (arrow-native) into one tiny final groupby(rule).

Rule semantics are defined ONCE below; ``validate_sql`` generates the
DuckDB mirror from the same list so both engines agree on NULL
handling (a NULL comparison counts as no violation, matching SQL
filter semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

DEFAULT_LANG_WHITELIST = ("en", "de", "fr", "es")
SHORT_TEXT_CHARS = 100

_PART_SCHEMA = pa.schema([("rule", pa.string()), ("n_partial", pa.int64())])


def _row_rules(whitelist: tuple, short_chars: int):
    """(name, pandas_mask_fn, sql_filter) triples — one source of truth.

    Every mask treats NULL like SQL's count(*) FILTER (WHERE ...): a
    NULL-valued comparison is NOT a violation.
    """
    wl_sql = ", ".join(f"'{w}'" for w in whitelist)
    return [
        ("null_or_empty_text",
         lambda df: df["text"].isna() | (df["text"] == ""),
         "text IS NULL OR text = ''"),
        ("whitespace_only_text",
         lambda df: df["text"].notna() & (df["text"] != "")
         & (df["text"].str.strip(" \t\r\n") == ""),
         "text IS NOT NULL AND text <> '' "
         "AND trim(text, ' ' || chr(9) || chr(13) || chr(10)) = ''"),
        ("n_chars_mismatch",
         lambda df: df["text"].notna()
         & (df["n_chars"].astype("int64") != df["text"].str.len()),
         "text IS NOT NULL AND n_chars <> length(text)"),
        ("lang_not_in_whitelist",
         lambda df: df["lang"].notna() & ~df["lang"].isin(list(whitelist)),
         f"lang IS NOT NULL AND lang NOT IN ({wl_sql})"),
        (f"text_under_{short_chars}_chars",
         lambda df: df["text"].notna()
         & (df["text"].str.len() < short_chars),
         f"text IS NOT NULL AND length(text) < {short_chars}"),
        ("negative_doc_id",
         lambda df: df["doc_id"].astype("int64") < 0,
         "doc_id < 0"),
    ]


def validate_corpus(ds: rd.Dataset,
                    whitelist: tuple = DEFAULT_LANG_WHITELIST,
                    short_chars: int = SHORT_TEXT_CHARS) -> rd.Dataset:
    """documents -> (rule, n_bad): violation counts per expectation."""
    rules = _row_rules(whitelist, short_chars)

    def partial(df: pd.DataFrame) -> pa.Table:
        names = [name for name, _, _ in rules]
        counts = [int(mask(df).sum()) for _, mask, _ in rules]
        return pa.table({"rule": pa.array(names, pa.string()),
                         "n_partial": pa.array(counts, pa.int64())})

    def id_partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("doc_id", as_index=False).size()
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy("int64"), pa.int64()),
            "n": pa.array(g["size"].to_numpy("int64"), pa.int64()),
        })

    def dup_partial(df: pd.DataFrame) -> pa.Table:
        n = df["n"].astype("int64")
        bad = int(n[n > 1].sum())
        return pa.table({"rule": pa.array(["duplicate_doc_id"],
                                          pa.string()),
                         "n_partial": pa.array([bad], pa.int64())})

    local = ds.map_batches(partial, batch_format="pandas")
    dup = (ds.select_columns(["doc_id"])
           .map_batches(id_partial, batch_format="pandas")
           .groupby("doc_id").aggregate(Sum("n", alias_name="n"))
           .map_batches(dup_partial, batch_format="pandas"))
    # zero row for the dup rule so it appears even on a dup-free corpus
    # whose aggregate emitted only empty-skipping blocks
    zero = rd.from_arrow(pa.table(
        {"rule": pa.array(["duplicate_doc_id"], pa.string()),
         "n_partial": pa.array([0], pa.int64())}))
    agg = (local.union(dup, zero)
           .groupby("rule").aggregate(Sum("n_partial",
                                          alias_name="n_bad")))
    return agg.map_batches(
        lambda df: pd.DataFrame({"rule": df["rule"].astype(str),
                                 "n_bad": df["n_bad"].astype("int64")}),
        batch_format="pandas")


def validate_sql(src: str = "documents",
                 whitelist: tuple = DEFAULT_LANG_WHITELIST,
                 short_chars: int = SHORT_TEXT_CHARS) -> str:
    """DuckDB mirror generated from the SAME rule list."""
    parts = [
        f"SELECT '{name}' AS rule, CAST(count(*) FILTER (WHERE {sql}) "
        f"AS BIGINT) AS n_bad FROM {src}"
        for name, _, sql in _row_rules(whitelist, short_chars)
    ]
    parts.append(
        "SELECT 'duplicate_doc_id' AS rule, "
        "CAST(coalesce(sum(n), 0) AS BIGINT) AS n_bad FROM "
        f"(SELECT count(*) AS n FROM {src} GROUP BY doc_id "
        "HAVING count(*) > 1)")
    return " UNION ALL ".join(parts)
