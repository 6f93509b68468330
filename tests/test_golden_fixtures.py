"""Staleness guard for the golden-fixture oracles.

The gate compares the DISTRIBUTED queries against
``tests/golden/*.parquet`` (sequential replays through the shared
kernels). If a kernel edit changes outputs, the committed fixtures must be
regenerated (``python tools/make_cases_fixture.py`` /
``tools/make_golden_fixtures.py``) — these tests catch the drift at pytest
time instead of at the driver gate, by regenerating the sf0.001 slice and
comparing it to the committed file. No Ray involved."""

from __future__ import annotations

import os
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
GOLDEN = os.path.join(REPO, "tests", "golden")
SF = "/root/testdata/sf0.001"


def _committed(fname: str, corpus_len: int):
    tab = pq.read_table(os.path.join(GOLDEN, fname))
    return (tab.filter(pc.equal(tab.column("corpus_len"), corpus_len))
               .drop_columns(["corpus_len"]))


def test_cases_fixture_current():
    from make_cases_fixture import sequential_cases
    fresh = sequential_cases(SF)
    key = fresh.column("corpus_len")[0].as_py()
    assert _committed("cases_oracle.parquet", key).equals(
        fresh.drop_columns(["corpus_len"]))


def test_beam_fixture_current():
    from make_golden_fixtures import _corpus_len, sequential_beam
    assert _committed("beam_oracle.parquet",
                      _corpus_len(SF)).equals(sequential_beam(SF))


def test_pdf_fixture_current():
    from make_golden_fixtures import _corpus_len, sequential_pdf
    assert _committed("pdf_oracle.parquet",
                      _corpus_len(SF)).equals(sequential_pdf(SF))


def test_ivf_fixture_current():
    from make_golden_fixtures import _corpus_len, sequential_ivf
    assert _committed("ivf_oracle.parquet",
                      _corpus_len(SF)).equals(sequential_ivf(SF))


def test_kmeans_fixture_current():
    from make_golden_fixtures import _corpus_len, sequential_kmeans
    assert _committed("kmeans_oracle.parquet",
                      _corpus_len(SF)).equals(sequential_kmeans(SF))


def test_semdedup_fixture_current():
    from make_golden_fixtures import _corpus_len, sequential_semdedup
    assert _committed("semdedup_oracle.parquet",
                      _corpus_len(SF)).equals(sequential_semdedup(SF))
