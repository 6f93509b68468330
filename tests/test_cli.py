"""CLI surface tests: the four reference console-script analogs
(extract / merge / compare / select-config) plus export, run in-process
against the shared Ray session (the CLI only shuts down sessions it owns)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from pero_ocr_ray.cli import main
from pero_ocr_ray.sources.pages import pages_from_documents, synthesize_pages


@pytest.fixture(scope="module")
def pages_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_in")
    pages = synthesize_pages(36)
    p = str(d / "pages.parquet")
    pq.write_table(pages, p)
    return p


def _run(capsys, *argv) -> dict:
    assert main(list(argv)) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_extract_and_compare(tmp_path, pages_file, capsys):
    out_a = str(tmp_path / "a")
    stats = _run(capsys, "extract", "--input", pages_file,
                 "--output", out_a, "--concurrency", "2")
    assert stats["rows"] == 36 and stats["partitions_done"] == 1
    # rerun skips the committed partition
    stats2 = _run(capsys, "extract", "--input", pages_file,
                  "--output", out_a, "--concurrency", "2")
    assert stats2["partitions_skipped"] == 1
    # self-compare is exactly zero
    cmp_stats = _run(capsys, "compare", "--hyp", out_a, "--ref", out_a)
    assert cmp_stats["cer"] == 0.0 and cmp_stats["wer"] == 0.0


def test_cli_merge(tmp_path, pages_file, capsys):
    out_a = str(tmp_path / "a")
    out_m = str(tmp_path / "m")
    _run(capsys, "extract", "--input", pages_file, "--output", out_a,
         "--concurrency", "2")
    stats = _run(capsys, "merge", "--inputs", out_a, out_a,
                 "--output", out_m)
    # urls dedup in the merge; dup_url case collapses one
    assert 0 < stats["rows"] <= 36


def test_cli_select_config(tmp_path, capsys):
    import duckdb  # noqa: F401  (env sanity: not needed, placeholder-free)
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pages = pages_from_documents(docs.slice(0, 60), "simple")
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    sweep = [{"score_threshold": 0.0}, {"page_min_chars": 10_000}]
    cand_path = str(tmp_path / "sweep.json")
    with open(cand_path, "w") as fh:
        json.dump(sweep, fh)
    out = _run(capsys, "select-config", "--input", p,
               "--candidates", cand_path, "--sample", "30",
               "--concurrency", "2")
    # the default config extracts the text exactly (CER 0); the
    # page_min_chars=10000 candidate drops everything (CER 1)
    assert out["best_index"] == 0
    assert out["cers"]["0"] == 0.0 if isinstance(
        next(iter(out["cers"])), str) else out["cers"][0] == 0.0


def test_cli_export_alto_aligned(tmp_path, pages_file, capsys):
    out_dir = str(tmp_path / "alto")
    stats = _run(capsys, "export", "--input", pages_file,
                 "--output", out_dir, "--format", "alto",
                 "--aligned-confidences", "--concurrency", "2")
    assert stats["files"] > 0
    import re
    wcs = set()
    for f in os.listdir(out_dir):
        if f.endswith(".xml"):
            with open(os.path.join(out_dir, f)) as fh:
                wcs.update(re.findall(r'WC="([0-9.]+)"', fh.read()))
    assert len(wcs) > 1  # alignment-derived variety, not one block score
