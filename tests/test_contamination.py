"""Benchmark decontamination: scores vs a sequential shingle-set oracle."""

import random

import pyarrow as pa

import ray.data as rd

from pero_ocr_ray.functions.contamination import decontaminate, ngram_contamination
from pero_ocr_ray.kernels.textstats import word_shingles
from pero_ocr_ray.util import dataset_to_table


def _corpus():
    pool = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau".split())
    rows = []
    for i in range(30):
        rng = random.Random(7000 + i)
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(pool) for _ in range(40))})
    rows.append({"doc_id": 90, "text": ""})          # no shingles
    rows.append({"doc_id": 91, "text": "two words"})  # < k tokens
    return rows


def test_contamination_matches_set_oracle():
    rows = _corpus()
    bench = [rows[3]["text"], rows[7]["text"], "totally novel eval words here"]
    bset = set()
    for t in bench:
        bset |= word_shingles(t, 3)
    out = (dataset_to_table(
        ngram_contamination(rd.from_items(rows), bench, n=3))
        .to_pandas().set_index("doc_id"))
    assert len(out) == len(rows)
    for r in rows:
        sh = word_shingles(r["text"], 3)
        hits = len(sh & bset)
        row = out.loc[r["doc_id"]]
        assert row["n_ngrams"] == len(sh)
        assert row["n_hits"] == hits
        assert row["contam_e6"] == (hits * 1_000_000 // len(sh) if sh else 0)
        assert bool(row["is_contaminated"]) == (hits > 0)
    # the bench docs themselves are fully contaminated
    assert out.loc[3, "contam_e6"] == 1_000_000
    assert out.loc[7, "contam_e6"] == 1_000_000


def test_decontaminate_drops_any_overlap_and_keeps_columns():
    rows = [dict(r, url=f"u{r['doc_id']}") for r in _corpus()]
    bench = [rows[3]["text"]]
    out = dataset_to_table(
        decontaminate(rd.from_items(rows), bench, n=3)).to_pandas()
    assert set(out.columns) == {"doc_id", "text", "url"}  # all columns survive
    bset = word_shingles(bench[0], 3)
    expect = {r["doc_id"] for r in rows
              if not (word_shingles(r["text"], 3) & bset)}
    assert set(out["doc_id"]) == expect
    assert 3 not in expect and 90 in expect and 91 in expect


def test_decontaminate_threshold_is_exact_rational():
    """hits*1e6 <= max_e6*n, NOT floor(hits*1e6/n) <= max_e6: a huge doc
    with one benchmark hit must still drop at the drop-any default."""
    big = " ".join(f"w{i}" for i in range(2_000_005))  # > 1e6 trigrams
    bench_hit = "w5 w6 w7"  # one shared trigram
    rows = [{"doc_id": 0, "text": big}, {"doc_id": 1, "text": "clean doc here"}]
    out = dataset_to_table(
        decontaminate(rd.from_items(rows), [bench_hit], n=3)).to_pandas()
    assert list(out["doc_id"]) == [1]
    # but a loose threshold keeps it (1 hit over ~2e6 shingles ~ 0.5e-6)
    out2 = dataset_to_table(
        decontaminate(rd.from_items(rows), [bench_hit], n=3,
                      max_contam_e6=10)).to_pandas()
    assert sorted(out2["doc_id"]) == [0, 1]


def test_empty_bench_set_contaminates_nothing():
    rows = _corpus()
    out = dataset_to_table(
        ngram_contamination(rd.from_items(rows), [], n=3)).to_pandas()
    assert not out["is_contaminated"].any()
    assert (out["n_hits"] == 0).all()
