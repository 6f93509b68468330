"""CCNet perplexity buckets: NTILE parity, partitioning invariance."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa

import ray.data as rd

from pero_ocr_ray.functions.ccnet import perplexity_buckets


def _docs(n: int = 90) -> pa.Table:
    # three langs, skewed sizes; texts draw from a small vocab so the LM
    # is non-trivial; a few docs share identical text (score ties)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts, langs = [], []
    for i in range(n):
        k = 1 + i % 7
        texts.append(" ".join(words[(i * j) % len(words)]
                              for j in range(1, k + 1)))
        langs.append(["en", "en", "en", "de", "cs"][i % 5])
    return pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def _sql_buckets(tbl: pa.Table) -> dict[int, tuple[str, int]]:
    con = duckdb.connect()
    con.register("documents", tbl)
    import __ray_entry__ as entrymod
    rows = con.execute(entrymod.oracle_sql()["perplexity_buckets"]
                       ).fetchall()
    return {r[0]: (r[3], r[2]) for r in rows}


def test_buckets_match_sql_ntile_and_are_partitioning_invariant():
    tbl = _docs(90)
    want = _sql_buckets(tbl)
    for parts in (2, 11):
        ds = rd.from_arrow(tbl).repartition(parts)
        got = {r["doc_id"]: (r["bucket"], r["lm_score_e6"])
               for r in perplexity_buckets(ds, vocab_size=4096).take_all()}
        assert got == want
    # sanity: every lang splits into all three buckets
    langs = {r: tbl.column("lang")[r].as_py() for r in range(90)}
    for lang in ("en", "de", "cs"):
        seen = {want[d][0] for d in want if langs[d] == lang}
        assert seen == {"head", "middle", "tail"}


def test_small_groups_follow_ntile_sizes():
    # 4 docs in one lang: NTILE(3) sizes are 2,1,1
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a a a", "a a b", "b b b", "a b c"], pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
    })
    got = perplexity_buckets(rd.from_arrow(tbl).repartition(2),
                             vocab_size=4096).take_all()
    sizes = pd.Series([r["bucket"] for r in got]).value_counts().to_dict()
    assert sizes == {"head": 2, "middle": 1, "tail": 1}
    assert got and _sql_buckets(tbl) == {
        r["doc_id"]: (r["bucket"], r["lm_score_e6"]) for r in got}


def test_histogram_split_sql_parity_and_tercile_quality():
    from pero_ocr_ray.functions.ccnet import perplexity_buckets_histogram
    tbl = _docs(120)
    out = perplexity_buckets_histogram(rd.from_arrow(tbl),
                                       vocab_size=256) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # SQL mirror parity (same bins, same thresholds, same >= rule)
    con = duckdb.connect()
    con.register("documents", tbl)
    import __ray_entry__ as entrymod
    sql_q = entrymod.oracle_sql()["perplexity_buckets_hist"] \
        .replace("4096", "256").replace("4097.0", "257.0")
    sql = con.execute(sql_q).df().sort_values("doc_id") \
        .reset_index(drop=True)
    assert list(sql["bucket"]) == list(out["bucket"])
    assert list(sql["lm_score_e6"].astype("int64")) == \
        list(out["lm_score_e6"])
    # buckets are contiguous in score: min(head) >= max(middle) etc.
    for lang, g in out.groupby("lang"):
        h = g[g["bucket"] == "head"]["lm_score_e6"]
        m = g[g["bucket"] == "middle"]["lm_score_e6"]
        t = g[g["bucket"] == "tail"]["lm_score_e6"]
        if len(h) and len(m):
            assert h.min() >= m.max() - 100_000  # within one bin width
        if len(m) and len(t):
            assert m.min() > t.max()
        # head holds at least a third (boundary mass rounds UP into it)
        assert len(h) * 3 >= len(g)
