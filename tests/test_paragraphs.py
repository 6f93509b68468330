"""Cross-corpus paragraph dedup: winner-keeps-one semantics."""

import pandas as pd

import ray.data as rd

from pero_ocr_ray.functions.paragraphs import (
    duplicate_paragraph_stats, explode_paragraphs, paragraph_dedup)
from pero_ocr_ray.util import dataset_to_table

BOILER = "please accept all cookies"


def _corpus():
    return rd.from_items([
        {"doc_id": 0, "text": BOILER + "\n\nunique zero\n\nshared tail"},
        {"doc_id": 1, "text": BOILER + "\n\nunique one"},
        {"doc_id": 2, "text": "unique two\n\n" + BOILER + "\n\nshared tail"},
        {"doc_id": 3, "text": BOILER},   # nothing survives
        {"doc_id": 4, "text": ""},       # single empty para, unique
    ])


def test_explode_is_instance_level():
    out = dataset_to_table(explode_paragraphs(_corpus())).to_pandas()
    assert len(out) == 3 + 2 + 3 + 1 + 1
    d0 = out[out["doc_id"] == 0].sort_values("idx")
    assert list(d0["para"]) == [BOILER, "unique zero", "shared tail"]
    assert list(d0["idx"]) == [0, 1, 2]


def test_paragraph_dedup_keeps_first_occurrence():
    out = (dataset_to_table(paragraph_dedup(_corpus())).to_pandas()
           .set_index("doc_id").sort_index())
    # doc 0 wins both duplicated paragraphs -> untouched
    assert out.loc[0, "text"] == BOILER + "\n\nunique zero\n\nshared tail"
    assert out.loc[0, "n_dropped"] == 0
    # later copies dropped
    assert out.loc[1, "text"] == "unique one"
    assert out.loc[1, "n_dropped"] == 1
    assert out.loc[2, "text"] == "unique two"
    assert out.loc[2, "n_dropped"] == 2 and out.loc[2, "n_paras"] == 3
    # doc 3 lost its only paragraph -> absent from output
    assert 3 not in out.index
    # unique empty paragraph survives
    assert out.loc[4, "text"] == "" and out.loc[4, "n_paras"] == 1


def test_duplicate_paragraph_stats():
    out = dataset_to_table(duplicate_paragraph_stats(_corpus())).to_pandas()
    got = {(int(r.n_copies), int(r.winner_doc_id))
           for r in out.itertuples()}
    assert got == {(4, 0), (2, 0)}  # boiler x4, shared tail x2


def test_min_copies_threshold():
    out = (dataset_to_table(paragraph_dedup(_corpus(), min_copies=3))
           .to_pandas().set_index("doc_id"))
    # only the 4-copy boiler is dropped; 2-copy "shared tail" survives
    assert out.loc[2, "text"] == "unique two\n\nshared tail"
    assert 3 not in out.index  # doc 3 is all boiler, still vanishes


def test_hot_paragraph_is_combiner_shaped():
    """A paragraph duplicated across 200k docs flows as per-block partials;
    the reassembly groups stay single-doc-sized."""
    import pyarrow as pa

    n = 200_000

    def mk(t: pa.Table) -> pa.Table:
        ids = [int(x) for x in t.column("id").to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(
                [f"own words {i}\n\nhot boilerplate everywhere"
                 for i in ids], pa.string()),
        })

    ds = rd.range(n).map_batches(mk, batch_format="pyarrow")
    out = paragraph_dedup(ds)
    agg = out.map_batches(
        lambda t: pa.table({
            "rows": pa.array([t.num_rows], pa.int64()),
            "dropped": pa.array(
                [int(pd.Series(t.column("n_dropped").to_pylist()).sum())],
                pa.int64())}),
        batch_format="pyarrow").to_pandas()
    assert agg["rows"].sum() == n
    assert agg["dropped"].sum() == n - 1  # every copy but the winner


def test_curate_v3_composition():
    """Boilerplate removal -> decontamination -> exact dedup -> quality:
    each stage's effect visible in the final per-lang stats."""
    import ray.data as rd
    from pero_ocr_ray.pipelines.training_data import curate_v3

    body = " ".join(f"w{i}" for i in range(30))
    zbody = " ".join(f"z{i}" for i in range(25))
    rows = [
        # doc 0 wins both shared paragraphs; doc 1 loses both and vanishes
        {"doc_id": 0, "text": BOILER + "\n\n" + body},
        {"doc_id": 1, "text": body + "\n\n" + BOILER},
        # contaminated doc: shares trigrams with the bench text
        {"doc_id": 2, "text": "the eval answer is forty two " + body.replace("w", "x")},
        # short doc: fails the min_tokens quality gate
        {"doc_id": 3, "text": "too short"},
        # clean long doc
        {"doc_id": 4, "text": " ".join(f"y{i}" for i in range(25))},
        # exact duplicates (identical after the no-op paragraph pass):
        # collapse to min doc_id 5
        {"doc_id": 5, "text": zbody},
        {"doc_id": 6, "text": zbody},
    ]
    lang = rd.from_items([{"doc_id": i, "lang": "en" if i < 3 else "de"}
                          for i in range(7)])
    out = (dataset_to_table(
        curate_v3(rd.from_items(rows), lang,
                  bench_texts=["the eval answer is forty two"],
                  min_tokens=20)).to_pandas().sort_values("doc_id"))
    assert list(out["doc_id"]) == [0, 4, 5]
    got = out.set_index("doc_id")
    assert got.loc[0, "text"] == BOILER + "\n\n" + body  # winner keeps all
    assert got.loc[0, "lang"] == "en"
    assert got.loc[4, "lang"] == "de"
    assert got.loc[5, "text"] == zbody  # doc 6 collapsed into 5
