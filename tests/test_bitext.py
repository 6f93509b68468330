"""Bitext mining: quantization exactness, mutual-best semantics,
grid-partitioning invariance, and small SQL parity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from pero_ocr_ray.functions.bitext import (SCALE_POW, mine_bitext,
                                           quantize_pack)


def _emb_table(vecs, ids=None):
    ids = list(range(len(vecs))) if ids is None else ids
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })


def _mine(vecs, langs, grid=4, ids=None):
    t = _emb_table(vecs, ids)
    qe = quantize_pack(rd.from_arrow(t))
    df = qe.take_batch(1000, batch_format="pandas")
    df["lang"] = langs
    out = mine_bitext(rd.from_pandas(df), "en", "de", grid=grid).to_pandas()
    if len(out) == 0:  # empty blocks skip UDFs -> schema-less empty frame
        return out
    return out.sort_values(["src_id", "tgt_id"]).reset_index(drop=True)


def test_quantize_matches_floor():
    t = _emb_table([[0.5, -0.25], [0.1, 0.3]])
    out = quantize_pack(rd.from_arrow(t)).take_batch(10,
                                                     batch_format="pandas")
    q0 = np.frombuffer(out.loc[0, "qv"], np.int32)
    assert list(q0) == [int(np.floor(0.5 * 2 ** SCALE_POW)),
                        int(np.floor(-0.25 * 2 ** SCALE_POW))]


def test_mutual_best_pairs_and_tiebreak():
    # en0 <-> de2 mutual; en1 <-> de3 mutual
    vecs = [[1.0, 0.0], [0.2, 0.9], [0.99, 0.05], [0.0, 1.0]]
    langs = ["en", "en", "de", "de"]
    out = _mine(vecs, langs)
    assert list(zip(out["src_id"], out["tgt_id"])) == [(0, 2), (1, 3)]

    # one-sided best is NOT enough: en1's best de2, de2 prefers en0
    vecs2 = [[1.0, 0.0], [0.8, 0.55], [0.99, 0.05], [0.0, 1.0]]
    out2 = _mine(vecs2, langs)
    assert list(zip(out2["src_id"], out2["tgt_id"])) == [(0, 2)]


def test_grid_invariance_and_sql_parity():
    rng = np.random.RandomState(7)
    n = 40
    vecs = rng.uniform(-0.4, 0.4, size=(n, 8))
    langs = ["en", "de", "fr", "de", "en"] * (n // 5)
    outs = [_mine(vecs, langs, grid=g) for g in (1, 3, 8)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)

    import importlib
    mod = importlib.import_module("__ray_entry__")
    con = duckdb.connect()
    con.register("embeddings", _emb_table(vecs).to_pandas())
    con.register("documents", pd.DataFrame(
        {"doc_id": range(n), "lang": langs}))
    sql = con.execute(mod._bitext_sql()).df() \
        .sort_values(["src_id", "tgt_id"]).reset_index(drop=True)
    assert len(sql) == len(outs[0]) > 0
    for c in ["src_id", "tgt_id", "dot_q"]:
        assert list(sql[c].astype("int64")) == list(outs[0][c]), c


def test_empty_side_yields_no_pairs():
    out = _mine([[0.1, 0.2], [0.3, 0.1]], ["en", "en"])
    assert len(out) == 0


def _mine_margin(vecs, langs, k=2, thr=1000, grid=3, ids=None):
    t = _emb_table(vecs, ids)
    qe = quantize_pack(rd.from_arrow(t))
    df = qe.take_batch(1000, batch_format="pandas")
    df["lang"] = langs
    out = mine_bitext(rd.from_pandas(df), "en", "de", grid=grid,
                      margin_k=k, margin_thr_milli=thr).to_pandas()
    if len(out) == 0:
        return out
    return out.sort_values(["src_id", "tgt_id"]).reset_index(drop=True)


def test_margin_filters_low_margin_pairs():
    vecs = [[0.4, 0.0], [0.28, 0.3], [0.4, 0.01], [0.27, 0.31]]
    langs = ["en", "en", "de", "de"]
    all_pairs = _mine_margin(vecs, langs, k=2, thr=-10**6)
    assert list(zip(all_pairs["src_id"], all_pairs["tgt_id"])) == \
        [(0, 2), (1, 3)]
    # exact integer keep-threshold per pair: kept iff
    # thr <= dot*2k*1000 // (sumk_fwd + sumk_bwd)
    q = np.floor(np.array(vecs) * 2 ** SCALE_POW).astype(np.int64)
    S = q[:2] @ q[2:].T  # en x de; k=2 tops = whole row/col sums
    t = {}
    for (i, j) in [(0, 0), (1, 1)]:
        rhs = int(S[i, :].sum()) + int(S[:, j].sum())
        t[(i, j)] = int(S[i, j]) * 2 * 2 * 1000 // rhs
    lo, hi = sorted(t.items(), key=lambda kv: kv[1])
    both = _mine_margin(vecs, langs, k=2, thr=lo[1])
    assert len(both) == 2
    only_hi = _mine_margin(vecs, langs, k=2, thr=lo[1] + 1)
    assert list(zip(only_hi["src_id"], only_hi["tgt_id"])) == \
        [(hi[0][0], hi[0][1] + 2)]
    none = _mine_margin(vecs, langs, k=2, thr=hi[1] + 1)
    assert len(none) == 0


def test_margin_sql_parity():
    import importlib
    rng = np.random.RandomState(11)
    n = 40
    vecs = rng.uniform(-0.4, 0.4, size=(n, 8))
    langs = ["en", "de", "fr", "de", "en"] * (n // 5)
    ray_out = _mine_margin(vecs, langs, k=3, thr=1100, grid=4)
    mod = importlib.import_module("__ray_entry__")
    con = duckdb.connect()
    con.register("embeddings", _emb_table(vecs).to_pandas())
    con.register("documents", pd.DataFrame(
        {"doc_id": range(n), "lang": langs}))
    sql = con.execute(mod._bitext_margin_sql(k=3, thr_milli=1100)).df() \
        .sort_values(["src_id", "tgt_id"]).reset_index(drop=True)
    assert len(sql) == len(ray_out)
    for c in ["src_id", "tgt_id", "dot_q"]:
        assert list(sql[c].astype("int64")) == list(ray_out[c]), c


# --- weighted token sampling (sampling.py) ---

def test_weighted_sample_exact_and_partition_invariant():
    import hashlib as _h
    from pero_ocr_ray.functions.sampling import weighted_token_sample
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b c", "", "d e f g h", "x"],
    })
    out = weighted_token_sample(rd.from_pandas(docs), k=50).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert int(out["n_hits"].sum()) == 50
    assert 1 not in set(out["doc_id"])  # zero-token doc never hit
    # exact replay: positions -> owner by cumsum over doc_id order
    toks = {0: 3, 1: 0, 2: 5, 3: 1}
    bounds = []
    c = 0
    for d in [0, 1, 2, 3]:
        bounds.append((d, c, c + toks[d]))
        c += toks[d]
    exp = {}
    for i in range(50):
        pos = int(_h.md5(f"wsample42:{i}".encode()).hexdigest()[:16],
                  16) % c
        for d, a, b in bounds:
            if a <= pos < b:
                exp[d] = exp.get(d, 0) + 1
    got = dict(zip(out["doc_id"], out["n_hits"]))
    assert got == exp
    # partitioning invariance
    out2 = weighted_token_sample(
        rd.from_pandas(docs).repartition(7), k=50).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_weighted_sample_empty_corpus():
    from pero_ocr_ray.functions.sampling import weighted_token_sample
    docs = pd.DataFrame({"doc_id": [0], "text": [""]})
    out = weighted_token_sample(rd.from_pandas(docs), k=10).to_pandas()
    assert len(out) == 0
