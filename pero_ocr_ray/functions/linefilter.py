"""C4/FineWeb-style line-level quality filtering with doc reassembly.

The standard webtext cleanup that complements the document-level Gopher
rules (``functions/gopher.py``): C4 (Raffel et al. 2020, §2.2) keeps only
lines that end in a terminal punctuation mark, drops lines with fewer than
three words, drops lines containing the word "javascript", reassembles each
page from its surviving lines, and then discards pages that end up too
short or contain code/boilerplate markers ("{", "lorem ipsum"). FineWeb
(Penedo et al. 2024) runs the same shape with tuned thresholds.

Scale shape: the whole operator is ONE streaming ``map_batches`` — every
rule is row-local, so there is no shuffle, no state, and no skew exposure;
at 100 TB it is embarrassingly parallel and reads only (doc_id, text).
The per-batch kernel is fully vectorized Arrow: ``pc.split_pattern``
explodes lines zero-copy, pandas ``.str`` kernels evaluate the line
predicates over the flattened line array, and the surviving lines are
re-listed with ``pa.ListArray.from_arrays`` + ``pc.binary_join`` — no
Python loop over rows or lines anywhere.

Determinism/oracle notes: every predicate is a literal regex match or an
integer comparison (no floats, no hashes); the regexes use explicit ASCII
classes so the RE2 (DuckDB) and Python ``re`` engines agree. The SQL
mirror lives in ``__ray_entry__._c4_sql`` and is driven by the module
constants below — one rule list drives both engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

# --- rule constants (shared with the SQL mirror; ASCII-only classes) ----
MIN_WORDS_PER_LINE = 3          # C4: "discarded any line with < 3 words"
MIN_KEPT_LINES = 3              # C4: "pages with fewer than 3 sentences"
TERMINAL_PUNCT_RE = r'[.!?"]$'  # C4: terminal punctuation requirement
WORD_RE = r"[^ ]+"              # space-delimited words (lines carry no \t)
BANNED_LINE_WORDS = ("javascript",)   # C4 line-level ban list
DOC_BAN_SUBSTRINGS = ("{", "lorem ipsum")  # C4 page-level ban list


def _as_array(a, typ=None):
    """ChunkedArray -> single contiguous Array (ListArray.from_arrays and
    from_arrays-fed binary_join need plain Arrays; table columns and
    split_pattern outputs arrive chunked in workers)."""
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
        if isinstance(a, pa.ChunkedArray):  # older pyarrow keeps the type
            a = a.chunk(0) if a.num_chunks == 1 else pa.concat_arrays(
                a.chunks)
    return a.cast(typ) if typ is not None else a


def banned_word_re(word: str) -> str:
    """Space-delimited word match, identical under Python re and RE2
    (explicit anchors instead of ``\\b``, whose charset is engine-
    dependent). Caller lowercases the line; ``word`` must be lowercase."""
    return rf"(?:^| ){word}(?: |$)"


def line_filter_docs(
    ds: rd.Dataset,
    *,
    min_words: int = MIN_WORDS_PER_LINE,
    require_terminal_punct: bool = True,
    banned: tuple[str, ...] = BANNED_LINE_WORDS,
    min_kept_lines: int = MIN_KEPT_LINES,
) -> rd.Dataset:
    """(doc_id, text) -> (doc_id, n_lines, n_kept, text_clean, pass_c4).

    ``text_clean`` is the doc reassembled from surviving lines (original
    order, '\\n'-joined; empty when no line survives). ``pass_c4`` is the
    C4 page-level verdict: enough surviving lines and no page-level banned
    substring. Column naming matches the ``c4_line_filter`` oracle.
    """

    def fn(t: pa.Table) -> pa.Table:
        texts = _as_array(t.column("text"))
        lines = pc.split_pattern(texts, "\n")
        n_docs = len(t)
        n_lines = pc.list_value_length(lines).cast(pa.int64())
        flat = _as_array(pc.list_flatten(lines))
        parents = _as_array(pc.list_parent_indices(lines))

        s = flat.to_pandas()
        low = s.str.lower()
        keep = s.str.count(WORD_RE).to_numpy() >= min_words
        if require_terminal_punct:
            keep &= s.str.contains(TERMINAL_PUNCT_RE, regex=True).to_numpy()
        for w in banned:
            keep &= ~low.str.contains(banned_word_re(w),
                                      regex=True).to_numpy()

        kept_vals = _as_array(flat.filter(pa.array(keep)),
                              pa.large_string())
        kept_par = parents.filter(pa.array(keep)).to_numpy(
            zero_copy_only=False)
        n_kept = np.bincount(kept_par, minlength=n_docs).astype("int64")
        offsets = np.zeros(n_docs + 1, dtype="int64")
        np.cumsum(n_kept, out=offsets[1:])
        clean = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                          kept_vals),
            pa.scalar("\n", pa.large_string()))

        doc_ok = n_kept >= min_kept_lines
        lower_all = pc.utf8_lower(texts)
        for sub in DOC_BAN_SUBSTRINGS:
            doc_ok &= np.invert(
                pc.match_substring(lower_all, sub).to_numpy(
                    zero_copy_only=False))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_lines": n_lines,
            "n_kept": pa.array(n_kept, pa.int64()),
            "text_clean": clean.cast(pa.string()),
            "pass_c4": pa.array(doc_ok.astype("int64"), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# --- deterministic line synthesis for flat single-line corpora ----------

GATE_WORDS_PER_LINE = 8


def synthesize_lines(ds: rd.Dataset,
                     words_per_line: int = GATE_WORDS_PER_LINE) -> rd.Dataset:
    """Regroup a flat space-separated text into '\\n'-joined lines of
    ``words_per_line`` words (last line ragged). The driver's ``documents``
    corpus is single-line; the gate query uses this shared deterministic
    synthesis on BOTH engines (SQL side: ``__ray_entry__._c4_sql``'s
    ``generate_series`` + list-slice CTE) so the filter is exercised on
    genuinely multi-line docs. Vectorized: one split + one re-list + one
    join per batch."""

    def fn(t: pa.Table) -> pa.Table:
        texts = _as_array(t.column("text"))
        toks = pc.split_pattern(texts, " ")
        # drop empty tokens (multi-space/leading/trailing) so the token
        # stream equals the SQL mirror's regexp_extract_all('[^ ]+')
        flat_all = _as_array(pc.list_flatten(toks))
        par_all = _as_array(pc.list_parent_indices(toks))
        nonempty = pc.not_equal(flat_all, "")
        flat = _as_array(flat_all.filter(nonempty), pa.large_string())
        n_tok = np.bincount(
            par_all.filter(nonempty).to_numpy(zero_copy_only=False),
            minlength=len(t)).astype("int64")
        n_groups = np.maximum((n_tok + words_per_line - 1) // words_per_line,
                              1).astype("int64")
        # line offsets within the flattened token array: for each doc,
        # line i covers tokens [i*wpl, min((i+1)*wpl, n_tok)) — built with
        # one repeat + one arange, no per-doc loop
        tok_starts = np.zeros(len(t) + 1, dtype="int64")
        np.cumsum(n_tok, out=tok_starts[1:])
        doc_off = np.zeros(len(t) + 1, dtype="int64")
        np.cumsum(n_groups, out=doc_off[1:])
        total_lines = int(doc_off[-1])
        doc_of_line = np.repeat(np.arange(len(t), dtype="int64"), n_groups)
        line_in_doc = (np.arange(total_lines, dtype="int64")
                       - doc_off[doc_of_line])
        starts = np.minimum(
            tok_starts[doc_of_line] + words_per_line * line_in_doc,
            tok_starts[doc_of_line + 1])
        line_off = np.concatenate(
            [starts, np.array([tok_starts[-1]], dtype="int64")])
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(line_off, pa.int64()),
                                          flat),
            pa.scalar(" ", pa.large_string()))
        text_ml = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(doc_off, pa.int64()),
                                          _as_array(joined,
                                                    pa.large_string())),
            pa.scalar("\n", pa.large_string()))
        out = t.drop_columns(["text"])
        return out.append_column("text", text_ml.cast(pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")
