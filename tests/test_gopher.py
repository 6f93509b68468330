"""Gopher-rules quality filter: kernel vs DuckDB parity + Ray end-to-end."""

import duckdb
import pandas as pd
import pytest

import ray.data as rd

from pero_ocr_ray.functions.gopher import _flags_frame, gopher_flags

# one row per rule branch: empty, short-mean-word-len, bullet lines,
# ellipsis lines + loose dots, symbol-heavy, 1-char words, giant words,
# all-numeric words, a passing doc, unicode bullets/ellipsis + nbsp
EDGE_DOCS = pd.DataFrame({
    "doc_id": list(range(10)),
    "text": [
        "",
        "the and of a to in is for on with " * 10,
        "- item\n- item\n- item\n",
        "first part...\nsecond trail...   \n....",
        "### # ## #hashtag " * 20,
        "w " * 200,
        "supercalifragilisticexpialidocious " * 60,
        "12345 67890 " * 60,
        ("the and of a to in is for on with lovely words here today "
         "making a reasonably normal document with enough tokens ") * 3,
        "x y • bullet\n• another\n… done…\n",
    ],
})


def _oracle_sql() -> str:
    import importlib
    mod = importlib.import_module("__ray_entry__")
    return mod._gopher_sql()


def test_kernel_matches_duckdb_on_edge_cases():
    ray_out = _flags_frame(EDGE_DOCS).sort_values("doc_id") \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", EDGE_DOCS)
    sql_out = con.execute(_oracle_sql()).df().sort_values("doc_id") \
        .reset_index(drop=True)
    for c in ray_out.columns:
        assert ray_out[c].astype("int64").equals(
            sql_out[c].astype("int64")), c
    # both outcomes exercised: exactly the "normal document" row passes
    assert ray_out["pass_gopher"].tolist() == [0] * 8 + [1, 0]


def test_every_rule_rejects_some_edge_doc():
    out = _flags_frame(EDGE_DOCS).set_index("doc_id")
    # doc 1: 100 words of mean length 2.4 -> mean-word-len lower bound
    assert out.loc[1, "word_chars"] < 3 * out.loc[1, "n_words"]
    # doc 4: 140 symbols vs 80 words -> symbol ratio
    assert 1000 * out.loc[4, "n_symbols"] >= 100 * out.loc[4, "n_words"]
    # doc 6: mean word length 34 -> upper bound
    assert out.loc[6, "word_chars"] > 10 * out.loc[6, "n_words"]
    # doc 7: zero alpha words
    assert out.loc[7, "n_alpha_words"] == 0 and out.loc[7, "n_words"] > 0
    # docs 2/9 count bullet lines, docs 3/9 count ellipsis lines
    assert out.loc[2, "n_bullet_lines"] == 3
    assert out.loc[3, "n_ellipsis_lines"] == 3
    assert out.loc[9, "n_bullet_lines"] == 1
    assert out.loc[9, "n_ellipsis_lines"] == 1


def test_ray_pipeline_matches_sequential():
    ds = rd.from_pandas(EDGE_DOCS).repartition(4)
    got = gopher_flags(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    want = _flags_frame(EDGE_DOCS).sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
