"""training_corpus_v4 chain vs the whole-chain DuckDB oracle on a small
synthetic corpus that exercises every stage (exact dups, window dups,
perplexity spread, tail drop)."""

from __future__ import annotations

import duckdb
import pyarrow as pa

import ray.data as rd

from pero_ocr_ray.pipelines.training_data import curate_v4


def _docs() -> pa.Table:
    texts, langs = [], []
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    for i in range(40):
        if i % 9 == 0:
            texts.append(base)                      # exact dup family
        elif i % 9 == 1:
            # >50% duplicated windows: base body + tiny unique tail
            texts.append(base + f" unique{i}")
        else:
            # every 8-token window contains the doc-unique tok{i}, so
            # normal docs never share windows (only the %9 boilerplate
            # family trips the duplicated-window filter)
            words = base.split()
            texts.append(" ".join(f"tok{i} {words[j % len(words)]}"
                                  for j in range(i, i + 6)))
        langs.append(["en", "de", "cs"][i % 3])
    return pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def test_v4_matches_whole_chain_oracle():
    tbl = _docs()
    import __ray_entry__ as entrymod
    con = duckdb.connect()
    con.register("documents", tbl)
    want = {r[0]: r[1:] for r in con.execute(
        entrymod.oracle_sql()["training_corpus_v4"]).fetchall()}

    got_rows = curate_v4(rd.from_arrow(tbl).repartition(4)).take_all()
    got = {r["doc_id"]: (r["lang"], r["lm_score_e6"], r["bucket"], r["pos"])
           for r in got_rows}
    assert got == want
    assert len(got) > 0
    # positions form a contiguous 0..n-1 permutation
    assert sorted(r["pos"] for r in got_rows) == list(range(len(got_rows)))
    # the exact-dup family collapsed to one survivor
    dup_ids = [i for i in range(40) if i % 9 == 0]
    assert sum(1 for d in dup_ids if d in got) <= 1


def test_v4_survives_all_boilerplate_corpus():
    # every doc shares all its windows -> the window filter drops the
    # whole corpus; the sentinel keeps the semi-join alive and the chain
    # returns zero rows instead of aborting
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi")
    tbl = pa.table({
        "doc_id": pa.array(list(range(12)), pa.int64()),
        "text": pa.array([base + f" tail{i}" for i in range(12)],
                         pa.string()),
        "lang": pa.array(["en"] * 12, pa.string()),
    })
    got = curate_v4(rd.from_arrow(tbl).repartition(3)).take_all()
    assert got == []


def test_export_curated_partitioned_roundtrip(tmp_path):
    from pero_ocr_ray.pipelines.training_data import (
        export_curated, read_curated,
    )
    tbl = _docs()
    curated = curate_v4(rd.from_arrow(tbl).repartition(4)).materialize()
    out = str(tmp_path / "curated")
    export_curated(curated, out)
    import os
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert dirs and all("=" in d for d in dirs)
    back = read_curated(out)
    want = {(r["doc_id"], r["lang"], r["pos"]) for r in curated.take_all()}
    got = {(r["doc_id"], r["lang"], r["pos"]) for r in back.take_all()}
    assert got == want
    # partition pruning: one lang reads only its slice
    en = read_curated(out, langs=["en"])
    assert {r["lang"] for r in en.take_all()} == {"en"}
