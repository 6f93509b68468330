"""Inverted index + derived-threshold filter."""

import pandas as pd

import ray.data as rd

from pero_ocr_ray.functions.index import inverted_index
from pero_ocr_ray.functions.relational import docs_above_lang_median
from pero_ocr_ray.util import dataset_to_table


def test_inverted_index_semantics():
    rows = [
        {"doc_id": 0, "text": "the cat sat on the mat"},
        {"doc_id": 1, "text": "the dog sat"},
        {"doc_id": 2, "text": "cat cat cat"},
        {"doc_id": 3, "text": ""},
    ]
    out = (dataset_to_table(inverted_index(rd.from_items(rows), max_df=2))
           .to_pandas().set_index("token").sort_index())
    assert len(out) == 6  # the cat sat on mat dog
    # top doc = max tf, tie -> min doc_id
    assert out.loc["cat", "top_doc"] == 2      # tf 3 beats tf 1
    assert out.loc["cat", "total_tf"] == 4
    assert out.loc["sat", "top_doc"] == 0      # tf tie 1-1 -> min id
    assert out.loc["the", "doc_freq"] == 2 and out.loc["the", "total_tf"] == 3
    # postings ascend by doc_id, capped by max_df
    assert out.loc["cat", "postings"] == "0,2"
    assert out.loc["dog", "postings"] == "1"


def test_inverted_index_max_df_cut():
    rows = [{"doc_id": i, "text": f"common uniq{i}"} for i in range(10)]
    out = (dataset_to_table(inverted_index(rd.from_items(rows), max_df=5))
           .to_pandas().set_index("token"))
    assert out.loc["common", "doc_freq"] == 10
    assert out.loc["common", "postings"] == ""  # over the rare cut
    assert out.loc["uniq3", "postings"] == "3"


def test_inverted_index_hot_token_is_combiner_shaped():
    """A token present in every one of 50k docs crosses the stats shuffle
    as per-block partials and never materializes a posting group."""
    import pyarrow as pa

    n = 50_000

    def mk(t: pa.Table) -> pa.Table:
        ids = [int(x) for x in t.column("id").to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([f"hot hot word{i}" for i in ids], pa.string()),
        })

    ds = rd.range(n).map_batches(mk, batch_format="pyarrow")
    out = inverted_index(ds, max_df=8)
    hot = (out.filter(expr="token == 'hot'")
           .to_pandas().set_index("token"))
    assert hot.loc["hot", "doc_freq"] == n
    assert hot.loc["hot", "total_tf"] == 2 * n
    assert hot.loc["hot", "postings"] == ""


def test_docs_above_lang_median():
    rows = []
    for i in range(9):  # en: token counts 1..9, median 5
        rows.append({"doc_id": i, "lang": "en",
                     "text": " ".join(["w"] * (i + 1))})
    for i in range(4):  # de: counts 10,20,30,40, quantile_disc -> 20
        rows.append({"doc_id": 100 + i, "lang": "de",
                     "text": " ".join(["x"] * ((i + 1) * 10))})
    out = (dataset_to_table(docs_above_lang_median(rd.from_items(rows)))
           .to_pandas())
    en = out[out["lang"] == "en"]["doc_id"].sort_values().tolist()
    de = out[out["lang"] == "de"]["doc_id"].sort_values().tolist()
    assert en == [5, 6, 7, 8]          # counts 6..9 > median 5
    assert de == [102, 103]            # 30, 40 > disc-median 20


def test_token_budget_cut_scan():
    """Distributed prefix-sum semantics: inclusive running total per lang,
    priority order ascending doc_id, exact budget boundary kept."""
    import ray.data as rd
    from pero_ocr_ray.functions.budget import token_budget_cut

    rows = []
    for i in range(10):
        rows.append({"doc_id": i, "lang": "en", "text": " ".join(["w"] * 10)})
    for i in range(5):
        rows.append({"doc_id": 100 + i, "lang": "de",
                     "text": " ".join(["x"] * 7)})
    out = (dataset_to_table(token_budget_cut(
        rd.from_items(rows), {"en": 35, "de": 14})).to_pandas()
        .sort_values("doc_id"))
    assert list(out[out["lang"] == "en"]["doc_id"]) == [0, 1, 2]  # 30<=35
    assert list(out[out["lang"] == "de"]["doc_id"]) == [100, 101]  # 14<=14


def test_token_budget_cut_matches_pandas_window():
    """Property: equals the pandas groupby-cumsum form on a shuffled-id
    corpus that spans many blocks (runs straddle block boundaries)."""
    import ray.data as rd
    from pero_ocr_ray.functions.budget import token_budget_cut

    rows = []
    for i in range(500):
        lang = ["en", "de", "fr"][i % 3]
        ntok = (i * 37) % 23 + 1
        rows.append({"doc_id": (i * 211) % 997, "lang": lang,
                     "text": " ".join(["t"] * ntok)})
    budget = 800
    out = (dataset_to_table(token_budget_cut(
        rd.from_items(rows), default_budget=budget)).to_pandas())
    df = pd.DataFrame(rows)
    df["n_tokens"] = df["text"].str.split().str.len()
    df = df.sort_values(["lang", "doc_id"])
    df["cum"] = df.groupby("lang")["n_tokens"].cumsum()
    expect = set(df[df["cum"] <= budget]["doc_id"])
    assert set(out["doc_id"]) == expect and len(out) == len(expect)


def test_chunk_for_training_boundaries():
    import ray.data as rd
    from pero_ocr_ray.functions.chunking import chunk_for_training

    def doc(i, n):
        return {"doc_id": i, "text": " ".join(f"t{k}" for k in range(n))}

    rows = [doc(0, 10), doc(1, 64), doc(2, 65), doc(3, 130), doc(4, 0)]
    out = (dataset_to_table(chunk_for_training(
        rd.from_items(rows), chunk_tokens=64, overlap=8)).to_pandas())
    g = out.groupby("doc_id")
    assert g.size().to_dict() == {0: 1, 1: 1, 2: 2, 3: 3}  # doc 4 empty
    d2 = out[out["doc_id"] == 2].sort_values("chunk_id")
    assert list(d2["n_tokens"]) == [64, 9]  # tail = n - stride = 65-56
    # consecutive chunks share exactly `overlap` tokens
    c0, c1 = d2["text"].tolist()
    assert c0.split()[-8:] == c1.split()[:8]
    d3 = out[out["doc_id"] == 3].sort_values("chunk_id")
    assert list(d3["n_tokens"]) == [64, 64, 18]  # 130 - 2*56
    # full coverage: union of chunk tokens == all tokens
    toks = set()
    for t in d3["text"]:
        toks.update(t.split())
    assert toks == {f"t{k}" for k in range(130)}


def test_pack_sequences_greedy():
    import ray.data as rd
    from pero_ocr_ray.functions.chunking import pack_sequences

    chunks = [
        {"doc_id": 0, "chunk_id": 0, "n_tokens": 100, "text": ""},
        {"doc_id": 0, "chunk_id": 1, "n_tokens": 100, "text": ""},
        {"doc_id": 8, "chunk_id": 0, "n_tokens": 100, "text": ""},  # same bucket
        {"doc_id": 8, "chunk_id": 1, "n_tokens": 60, "text": ""},
        {"doc_id": 1, "chunk_id": 0, "n_tokens": 300, "text": ""},  # oversize
        {"doc_id": 1, "chunk_id": 1, "n_tokens": 10, "text": ""},
    ]
    out = (dataset_to_table(pack_sequences(
               rd.from_items(chunks), capacity=256, num_buckets=8))
           .to_pandas().sort_values(["bucket", "doc_id", "chunk_id"])
           .reset_index(drop=True))
    b0 = out[out["bucket"] == 0]
    # 100+100 fits; +100 would be 300 -> new seq; +60 fits there
    assert b0["seq_id"].tolist() == [0, 0, 1, 1]
    assert b0["seq_fill"].tolist() == [100, 200, 100, 160]
    b1 = out[out["bucket"] == 1]
    # oversize chunk occupies seq 0 alone (fill 300 > capacity); next opens seq 1
    assert b1["seq_id"].tolist() == [0, 1]
    assert b1["seq_fill"].tolist() == [300, 10]


def test_pack_sequences_partitioning_invariant():
    import ray.data as rd
    from pero_ocr_ray.functions.chunking import (chunk_for_training,
                                                 pack_sequences)

    rows = [{"doc_id": i, "text": " ".join(f"w{j}" for j in range(5 + i * 7 % 90))}
            for i in range(40)]
    a = (dataset_to_table(pack_sequences(chunk_for_training(
            rd.from_items(rows)), capacity=128)).to_pandas()
         .sort_values(["bucket", "doc_id", "chunk_id"]).reset_index(drop=True))
    b = (dataset_to_table(pack_sequences(chunk_for_training(
            rd.from_items(rows).repartition(9)), capacity=128)).to_pandas()
         .sort_values(["bucket", "doc_id", "chunk_id"]).reset_index(drop=True))
    assert a.equals(b)
    # no sequence over capacity unless a single chunk exceeds it alone
    per_seq = a.groupby(["bucket", "seq_id"])["n_tokens"].sum()
    assert (per_seq <= 128).all()


def test_index_search_conjunctive():
    import pyarrow as pa
    import ray.data as rd
    from pero_ocr_ray.functions.index import index_search
    texts = ["alpha beta alpha", "alpha gamma", "beta beta alpha beta",
             "gamma delta", ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2)
    got = {r["doc_id"]: r["score"]
           for r in index_search(ds, ["alpha", "beta"]).take_all()}
    assert got == {0: 3, 2: 4}  # docs with BOTH terms; score = tf sum
