"""Corpus expectation monitors: rule semantics + SQL parity."""

import duckdb
import pandas as pd

import ray.data as rd

from pero_ocr_ray.functions.validate import validate_corpus, validate_sql


def _docs():
    return pd.DataFrame({
        "doc_id": [0, 1, 1, 2, 3, -4],
        "text": ["ok " * 40, "", "   \t\n", None,
                 "short", "long enough " * 10],
        "lang": ["en", "de", "xx", "fr", None, "es"],
        "n_chars": [120, 0, 5, 7, 99, 120],
    })


def _run(df):
    out = validate_corpus(rd.from_pandas(df)).to_pandas()
    return out.set_index("rule")["n_bad"].to_dict()


def test_rule_semantics():
    got = _run(_docs())
    # doc1 empty; doc2(None) is NULL -> only the empty row counts
    assert got["null_or_empty_text"] == 2  # "" and NULL
    assert got["whitespace_only_text"] == 1
    # mismatches where text NOT NULL: doc0 len=120 ok; doc1 len 0 == 0;
    # ws doc len 5 == 5; doc "short" len 5 != 99; last len 120 == 120
    assert got["n_chars_mismatch"] == 1
    assert got["lang_not_in_whitelist"] == 1  # 'xx'; NULL lang not counted
    assert got["text_under_100_chars"] == 3  # "", ws, "short"
    assert got["negative_doc_id"] == 1
    assert got["duplicate_doc_id"] == 2  # doc_id 1 appears twice


def test_sql_parity():
    df = _docs()
    con = duckdb.connect()
    con.register("documents", df)
    sql = con.execute(validate_sql()).df() \
        .set_index("rule")["n_bad"].astype("int64").to_dict()
    assert sql == _run(df)


def test_clean_corpus_all_zero_except_short():
    df = pd.DataFrame({
        "doc_id": [0, 1], "text": ["x " * 60, "y " * 70],
        "lang": ["en", "de"], "n_chars": [120, 140],
    })
    got = _run(df)
    assert all(v == 0 for v in got.values())
    assert set(got) == {
        "null_or_empty_text", "whitespace_only_text", "n_chars_mismatch",
        "lang_not_in_whitelist", "text_under_100_chars",
        "negative_doc_id", "duplicate_doc_id"}


# --- span-level decontamination (contamination.py) ---

def test_decontaminate_spans_cuts_windows_not_docs():
    import pyarrow as pa
    from pero_ocr_ray.functions.contamination import decontaminate_spans
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["the quick brown fox jumps high",
                 "clean words only here today",
                 "tiny"],
    })
    bench = ["quick brown fox runs"]  # contaminates tokens 1..3 of doc 0
    out = pa.table(decontaminate_spans(
        rd.from_pandas(docs), bench, n=3)
        .take_batch(10, batch_format="pyarrow")).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "clean_text"] == "the jumps high"
    assert out.loc[0, "n_removed"] == 3
    assert out.loc[1, "clean_text"] == "clean words only here today"
    assert out.loc[1, "n_removed"] == 0
    # sub-n docs have no shingles, survive whole
    assert out.loc[2, "clean_text"] == "tiny"
    # overlapping matches merge their coverage
    out2 = pa.table(decontaminate_spans(
        rd.from_pandas(docs),
        ["quick brown fox", "brown fox jumps"], n=3)
        .take_batch(10, batch_format="pyarrow")).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out2.loc[0, "clean_text"] == "the high"
    assert out2.loc[0, "n_removed"] == 4


# --- cluster representatives (dedup.py) ---

def test_cluster_representatives_argmax_and_ties():
    import pyarrow as pa
    from pero_ocr_ray.functions.dedup import cluster_representatives
    clusters = pd.DataFrame({"doc_id": [1, 2, 3, 7, 8],
                             "cluster_id": [1, 1, 1, 7, 7]})
    scored = pd.DataFrame({"doc_id": [1, 2, 3, 7, 8, 9],
                           "clf_score": [5, 9, 9, -2, -2, 100]})
    out = pa.table(cluster_representatives(
        rd.from_pandas(clusters), rd.from_pandas(scored))
        .take_batch(10, batch_format="pyarrow")).to_pandas() \
        .sort_values("cluster_id").reset_index(drop=True)
    # cluster 1: 2 and 3 tie at 9 -> smaller doc_id wins; doc 9 is not
    # in any cluster and must not appear
    assert list(zip(out["cluster_id"], out["rep_doc_id"],
                    out["rep_score"])) == [(1, 2, 9), (7, 7, -2)]


# --- fertility + filter agreement (round-5 rollups) ---

def test_bpe_fertility_by_lang_ratio():
    from pero_ocr_ray.functions.textstats import bpe_fertility_by_lang
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha beta", "gamma delta epsilon", "alpha alpha"],
        "lang": ["en", "de", "en"],
    })
    out = bpe_fertility_by_lang(rd.from_pandas(docs)).to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    assert list(out["lang"]) == ["de", "en"]
    assert list(out["n_words"]) == [3, 4]
    for _, r in out.iterrows():
        assert r["fertility_e6"] == \
            r["n_bpe_tokens"] * 1_000_000 // r["n_words"]
        assert r["fertility_e6"] >= 1_000_000  # >= one subword per word


def test_filter_agreement_counts_sum_to_corpus():
    from pero_ocr_ray.functions.gopher import filter_agreement
    docs = pd.DataFrame({
        "doc_id": range(8),
        "text": ["the quick brown fox jumps over the lazy dog again "
                 * 30] * 6 + ["x", ""],
    })
    out = filter_agreement(rd.from_pandas(docs)).to_pandas()
    assert int(out["n_docs"].sum()) == len(docs)
    assert set(out.columns) == {"keep_doc", "pass_gopher", "n_docs"}
    # short/empty docs fail gopher; the long doc passes
    fails = out[out["pass_gopher"] == 0]["n_docs"].sum()
    assert fails >= 2
