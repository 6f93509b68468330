"""C4 line filter: edge-case semantics, DuckDB parity, Ray end-to-end."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from pero_ocr_ray.functions.linefilter import (
    GATE_WORDS_PER_LINE, line_filter_docs, synthesize_lines)


def _run(docs, **kw):
    out = line_filter_docs(rd.from_pandas(docs), **kw)
    return pa.table(out.take_batch(10_000, batch_format="pyarrow")) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


EDGE_DOCS = pd.DataFrame({
    "doc_id": list(range(7)),
    "text": [
        # all four rules hit at least once
        'Good line one here.\nshort\nAnother solid line!\n'
        'bad javascript line here.\nNo terminal punct on this line',
        # lorem ipsum kills the doc even though every line survives
        'lorem ipsum dolor sit.\nSecond fine line here.\n'
        'Third good line yes.\nFourth good line sure.',
        # exactly MIN_KEPT_LINES survivors -> passes
        'First good line here.\nSecond fine line here.\nThird good line?',
        # curly brace (code marker) kills the doc
        'function foo() {\nreturn bar baz qux.\nAnother proper line here.\n'
        'And one more good line.',
        # quote counts as terminal punctuation
        'He said "stop right there."\nShe answered "fine, you win."\n'
        'So they both left quietly.',
        # empty doc: one empty line, nothing survives
        '',
        # JavaScript is banned case-insensitively
        'This mentions JavaScript twice here.\nGood follow-up line here.\n'
        'Third decent line right here.\nFourth decent line right here.',
    ],
})


def test_rules_and_reassembly():
    out = _run(EDGE_DOCS).set_index("doc_id")
    assert out.loc[0, "n_lines"] == 5 and out.loc[0, "n_kept"] == 2
    assert out.loc[0, "text_clean"] == \
        "Good line one here.\nAnother solid line!"
    assert out.loc[0, "pass_c4"] == 0            # only 2 survivors
    assert out.loc[1, "n_kept"] == 4 and out.loc[1, "pass_c4"] == 0
    assert out.loc[2, "n_kept"] == 3 and out.loc[2, "pass_c4"] == 1
    assert out.loc[3, "pass_c4"] == 0            # '{'
    assert out.loc[4, "n_kept"] == 3 and out.loc[4, "pass_c4"] == 1
    assert out.loc[5, "n_lines"] == 1 and out.loc[5, "n_kept"] == 0
    assert out.loc[5, "text_clean"] == ""
    assert out.loc[6, "n_kept"] == 3             # JavaScript line dropped


def test_gate_query_matches_duckdb_on_multi_space_text():
    # flat corpus incl. multi-space runs + the banned gate word 'spark'
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            "a b  c d e f g h i j spark k l",      # double space
            " leading and trailing words here ",   # stripped empties
            ("w%d " % 7).join(str(i) for i in range(25)),
        ],
    })
    import importlib
    mod = importlib.import_module("__ray_entry__")
    con = duckdb.connect()
    con.register("documents", docs)
    sql = con.execute(mod._c4_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)

    ds = line_filter_docs(synthesize_lines(rd.from_pandas(docs)),
                          require_terminal_punct=False, banned=("spark",))
    ray_out = pa.table(ds.take_batch(100, batch_format="pyarrow")) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in ["n_lines", "n_kept", "pass_c4"]:
        assert ray_out[c].astype("int64").equals(sql[c].astype("int64")), c
    assert ray_out["text_clean"].equals(sql["text_clean"])


def test_synthesize_lines_shapes():
    docs = pd.DataFrame({"doc_id": [0, 1],
                         "text": ["a b c d e f g h i", ""]})
    out = pa.table(synthesize_lines(rd.from_pandas(docs))
                   .take_batch(10, batch_format="pyarrow")).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "text"] == "a b c d e f g h\ni"
    assert out.loc[1, "text"] == ""
    assert GATE_WORDS_PER_LINE == 8  # SQL mirror bakes this constant


def test_quality_funnel_composition():
    """Funnel = gopher ∘ c4 ∘ classifier with stage-boundary filters;
    verify survivors equal the brute-force per-stage composition."""
    import importlib

    import duckdb

    from pero_ocr_ray.pipelines.training_data import quality_funnel

    docs = pd.DataFrame({
        "doc_id": list(range(4)),
        "text": [
            # passes gopher (enough stopword-rich words), c4, classifier?
            ("the and of a to in is for on with data table row batch "
             "merge sort join scan key value index page line word ") * 3,
            "x",                                   # fails gopher (too short)
            ("the and of a to in is for on with spark spark spark spark "
             "spark spark spark spark spark spark spark spark ") * 4,
            ("the quick brown fox jumps over the lazy dog with a view "
             "to the sea and a is in on for of band ") * 4,
        ],
    })
    mod = importlib.import_module("__ray_entry__")
    con = duckdb.connect()
    con.register("documents", docs)
    sql = con.execute(mod._funnel_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    ray_out = pa.table(
        quality_funnel(rd.from_pandas(docs)).take_batch(
            100, batch_format="pyarrow")).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(ray_out) == len(sql) and len(ray_out) > 0
    for c in ["doc_id", "n_tokens", "clf_score"]:
        assert ray_out[c].astype("int64").equals(sql[c].astype("int64")), c
    assert 1 not in ray_out["doc_id"].tolist()  # gopher reject never scored
