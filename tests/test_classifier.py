"""Hashed linear classifier: weight parity, scoring edge cases, gate SQL."""

import duckdb
import hashlib
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from pero_ocr_ray.functions.classifier import (
    N_BUCKETS, WEIGHT_MOD, WEIGHT_SHIFT, classify_docs, hashed_weights)


def _run(docs, **kw):
    out = classify_docs(rd.from_pandas(docs), **kw)
    return pa.table(out.take_batch(10_000, batch_format="pyarrow")) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_weights_deterministic_and_bounded():
    w = hashed_weights()
    assert len(w) == N_BUCKETS and w.dtype == np.int64
    assert w.min() >= -WEIGHT_SHIFT and w.max() <= WEIGHT_MOD - 1 - WEIGHT_SHIFT
    assert np.array_equal(w, hashed_weights())  # process-stable


def test_score_is_sum_of_token_weights():
    w = hashed_weights()
    docs = pd.DataFrame({"doc_id": [0, 1, 2],
                         "text": ["alpha beta alpha", "", "Gamma-Delta 42"]})
    out = _run(docs).set_index("doc_id")

    def tok_w(tok):
        b = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16) % N_BUCKETS
        return int(w[b])

    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[0, "clf_score"] == 2 * tok_w("alpha") + tok_w("beta")
    assert out.loc[1, "n_tokens"] == 0 and out.loc[1, "clf_score"] == 0
    assert out.loc[1, "keep_doc"] == 1  # 0 >= 0*0 with default threshold
    # tokenizer lowercases and splits on non-alnum
    assert out.loc[2, "n_tokens"] == 3
    assert out.loc[2, "clf_score"] == \
        tok_w("gamma") + tok_w("delta") + tok_w("42")


def test_threshold_cross_multiplication():
    docs = pd.DataFrame({"doc_id": [0], "text": ["alpha beta alpha"]})
    base = _run(docs)
    score, n = int(base.loc[0, "clf_score"]), int(base.loc[0, "n_tokens"])
    mean_milli = score * 1000 / n
    assert _run(docs, thr_milli=int(np.floor(mean_milli)))\
        .loc[0, "keep_doc"] == 1
    assert _run(docs, thr_milli=int(np.floor(mean_milli)) + 1)\
        .loc[0, "keep_doc"] == 0


def test_custom_weights_override():
    w = np.zeros(N_BUCKETS, np.int64)
    b = int(hashlib.md5(b"alpha").hexdigest()[:16], 16) % N_BUCKETS
    w[b] = 7
    out = _run(pd.DataFrame({"doc_id": [0], "text": ["alpha alpha beta"]}),
               weights=w)
    bb = int(hashlib.md5(b"beta").hexdigest()[:16], 16) % N_BUCKETS
    assert out.loc[0, "clf_score"] == 14 + int(w[bb])


def test_gate_sql_parity_small():
    import importlib
    mod = importlib.import_module("__ray_entry__")
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["alpha beta gamma delta", "", "zz top 123 zz",
                 "the quick brown fox jumps over the lazy dog"],
    })
    con = duckdb.connect()
    con.register("documents", docs)
    sql = con.execute(mod._classifier_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    ray_out = _run(docs)
    for c in ["n_tokens", "clf_score", "keep_doc"]:
        assert ray_out[c].astype("int64").equals(sql[c].astype("int64")), c


def test_carry_cols_ride_through():
    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["alpha", "beta"],
                         "url": ["https://a.example/x", "https://b.example/y"]})
    out = _run(docs, carry_cols=("url",))
    assert list(out["url"]) == list(docs["url"])
    base = _run(docs[["doc_id", "text"]])
    for c in ["n_tokens", "clf_score", "keep_doc"]:
        assert out[c].equals(base[c]), c


def test_host_quality_rollup():
    from pero_ocr_ray.functions.domains import host_quality
    # host a: scores sum negative -> dropped; host b: positive -> kept
    scored = pd.DataFrame({
        "url": ["https://a.example/1", "https://a.example/2",
                "https://B.example:443/1"],
        "clf_score": [-5, 2, 4],
    })
    out = pa.table(host_quality(rd.from_pandas(scored))
                   .take_batch(100, batch_format="pyarrow")).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    # canonicalization lowercases the host and strips the default port
    assert list(out["host"]) == ["a.example", "b.example"]
    assert list(out["n_docs"]) == [2, 1]
    assert list(out["sum_score"]) == [-3, 4]
    assert list(out["keep_host"]) == [0, 1]
    # mean threshold: host b mean 4 -> dropped at thr_micro=5
    out5 = pa.table(host_quality(rd.from_pandas(scored), thr_micro=5)
                    .take_batch(100, batch_format="pyarrow")).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    assert list(out5["keep_host"]) == [0, 0]


def test_quality_upsample_tiers_and_sql_parity():
    import importlib
    from pero_ocr_ray.functions.sampling import quality_upsample
    scored = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                           "n_tokens": [10, 10, 0, 5],
                           "clf_score": [6000, -1, 0, 1]})
    out = pa.table(quality_upsample(rd.from_pandas(scored))
                   .take_batch(100, batch_format="pyarrow")).to_pandas() \
        .sort_values(["doc_id", "copy_idx"]).reset_index(drop=True)
    # doc1 mean 600 -> 2 copies; doc2 negative -> dropped;
    # doc3 token-less score-0 -> 1; doc4 mean 200 -> 1
    assert list(zip(out["doc_id"], out["copy_idx"])) == \
        [(1, 0), (1, 1), (3, 0), (4, 0)]
    k = hashlib.md5(b"epoch42:1:1").hexdigest()
    assert out.loc[1, "order_key"] == k

    # end-to-end SQL parity on real text through the classifier CTE
    mod = importlib.import_module("__ray_entry__")
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha beta gamma", "", "the quick brown fox"],
    })
    con = duckdb.connect()
    con.register("documents", docs)
    sql = con.execute(mod._quality_upsample_sql()).df() \
        .sort_values(["doc_id", "copy_idx"]).reset_index(drop=True)
    from pero_ocr_ray.functions.classifier import classify_docs
    ray_out = pa.table(
        quality_upsample(classify_docs(rd.from_pandas(docs)))
        .take_batch(100, batch_format="pyarrow")).to_pandas() \
        .sort_values(["doc_id", "copy_idx"]).reset_index(drop=True)
    assert len(sql) == len(ray_out)
    for c in ["doc_id", "copy_idx", "order_key"]:
        assert list(sql[c]) == list(ray_out[c]), c


def test_dsir_scores_favor_target_like_docs():
    import importlib
    from pero_ocr_ray.functions.dsir import dsir_scores
    # target docs use one vocabulary, raw another; a target-like doc
    # must outscore a raw-like one
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["apple banana apple", "apple banana cherry",
                 "rock stone gravel", "apple stone", ""],
        "source": ["tgt", "tgt", "raw", "raw", "raw"],
    })
    out = pa.table(
        dsir_scores(rd.from_pandas(docs), target_source="tgt")
        .take_batch(100, batch_format="pyarrow")).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # relative ordering: target-vocab > mixed > raw-vocab (absolute sign
    # depends on the target/raw token-mass ratio vs smoothing; at tiny
    # scale target-subset-of-raw makes every ratio <= 1)
    s = out["dsir_score_e6"]
    assert s[0] > s[3] > s[2]
    assert s[1] > s[2]
    assert out.loc[4, "dsir_score_e6"] == 0 and out.loc[4, "keep_doc"] == 1
    assert list(out["keep_doc"]) == \
        list((out["dsir_score_e6"] >= 0).astype("int64"))

    # SQL parity on the same frame (mirror swaps the target literal)
    mod = importlib.import_module("__ray_entry__")
    con = duckdb.connect()
    con.register("documents", docs)
    sql = con.execute(mod.oracle_sql()["dsir_scores"]
                      .replace("'src0'", "'tgt'")).df() \
        .sort_values("doc_id").reset_index(drop=True)
    for c in ["n_tokens", "dsir_score_e6", "keep_doc"]:
        assert list(sql[c].astype("int64")) == list(out[c]), c
