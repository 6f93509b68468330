"""Ray pipeline vs sequential oracle: byte-identity, determinism across
parallelism configs, dedup, resume (FIXTURES.md golden contract §tests 1-4).
"""

import os

import pyarrow as pa
import pytest

import ray.data as rd

from pero_ocr_ray.kernels.config import ExtractConfig
from pero_ocr_ray.oracle import extract_table
from pero_ocr_ray.pipelines.extract import (
    dedup_pages, extract_pipeline, read_pages, read_job_output, run_job,
)
from pero_ocr_ray.sources.pages import synthesize_pages
from pero_ocr_ray.util import dataset_to_table

ROWS = 72
CMP_COLS = ("extracted_text", "spans", "metrics", "payload_kind", "encoding", "error")


@pytest.fixture(scope="module")
def pages():
    return synthesize_pages(ROWS)


@pytest.fixture(scope="module")
def golden(pages):
    return extract_table(pages).sort_by("row_id")


def _assert_identical(tbl: pa.Table, golden: pa.Table):
    tbl = tbl.sort_by("row_id")
    assert tbl.num_rows == golden.num_rows
    for col in CMP_COLS:
        assert tbl.column(col).to_pylist() == golden.column(col).to_pylist(), col


def test_fused_pipeline_byte_identical(pages, golden):
    out = extract_pipeline(read_pages(pages), concurrency=2)
    _assert_identical(dataset_to_table(out), golden)


def test_staged_pipeline_byte_identical(pages, golden):
    out = extract_pipeline(read_pages(pages), mode="staged", concurrency=2)
    _assert_identical(dataset_to_table(out), golden)


def test_parallelism_invariance(pages, golden):
    """Same input at different parallelism/batch shapes -> identical bytes."""
    cfg_a = ExtractConfig(parse_batch_size=4)
    cfg_b = ExtractConfig(parse_batch_size=64)
    ds = read_pages(pages)
    out_a = dataset_to_table(extract_pipeline(ds, cfg_a, concurrency=1))
    out_b = dataset_to_table(extract_pipeline(ds, cfg_b, concurrency=3))
    _assert_identical(out_a, golden)
    _assert_identical(out_b, golden)


def test_repartitioned_input_invariance(pages, golden):
    ds = read_pages(pages).repartition(7)
    out = extract_pipeline(ds, concurrency=2)
    _assert_identical(dataset_to_table(out), golden)


def test_dedup_keeps_latest(pages):
    ds = dedup_pages(read_pages(pages))
    tbl = dataset_to_table(ds)
    urls = tbl.column("url").to_pylist()
    assert len(urls) == len(set(urls))
    # the dup_url rows: the later warc_ts row must be the survivor
    full = pages.to_pylist()
    from collections import defaultdict
    by_url = defaultdict(list)
    for r in full:
        by_url[r["url"]].append(r)
    survivors = {r["url"]: r["row_id"] for r in tbl.to_pylist()}
    for url, rows in by_url.items():
        expect = max(rows, key=lambda r: (r["warc_ts"], r["row_id"]))["row_id"]
        assert survivors[url] == expect


def test_size_bucketing_invariance(pages, golden):
    cfg = ExtractConfig(size_bucketing=True)
    out = extract_pipeline(read_pages(pages), cfg, concurrency=2)
    _assert_identical(dataset_to_table(out), golden)


def test_resume_after_failure(tmp_path, pages, golden):
    """Kill after partition k, restart, identical final table (FIXTURES §4)."""
    in_dir = tmp_path / "in"
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    # 4 input partitions
    import pyarrow.parquet as pq
    n = pages.num_rows
    paths = []
    for k in range(4):
        p = str(in_dir / f"shard_{k}.parquet")
        pq.write_table(pages.slice(k * n // 4, n // 4), p)
        paths.append(p)

    with pytest.raises(RuntimeError, match="injected failure"):
        run_job(paths, out_dir, concurrency=2, fail_after=2)

    from pero_ocr_ray.state.manifest import Manifest
    assert len(Manifest(out_dir).completed()) == 2

    stats = run_job(paths, out_dir, concurrency=2)
    assert stats["partitions_skipped"] == 2
    assert stats["partitions_done"] == 2

    tbl = dataset_to_table(read_job_output(out_dir))
    _assert_identical(tbl, golden)
    # manifest carries lineage + row counts
    recs = Manifest(out_dir).records()
    assert sum(r["rows"] for r in recs) == pages.num_rows
    assert all("source_files" in r for r in recs)


def test_run_job_grouped_partitions(tmp_path, pages, golden):
    """files_per_partition=2 groups 4 shards into 2 committed partitions and
    produces the identical final table (amortized per-partition barrier)."""
    in_dir = tmp_path / "in"
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    import pyarrow.parquet as pq
    n = pages.num_rows
    paths = []
    for k in range(4):
        p = str(in_dir / f"shard_{k}.parquet")
        pq.write_table(pages.slice(k * n // 4, n // 4), p)
        paths.append(p)
    stats = run_job(paths, out_dir, concurrency=2, files_per_partition=2)
    assert stats["partitions_total"] == stats["partitions_done"] == 2
    _assert_identical(dataset_to_table(read_job_output(out_dir)), golden)


def test_run_job_keys_follow_source_paths(tmp_path, pages):
    """Partition keys derive from source paths: inserting a new shard at the
    front of the list must not skip it or re-run the committed one."""
    in_dir = tmp_path / "in"
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    import pyarrow.parquet as pq
    n = pages.num_rows
    p_b = str(in_dir / "shard_b.parquet")
    pq.write_table(pages.slice(0, n // 2), p_b)
    stats1 = run_job([p_b], out_dir, concurrency=2)
    assert stats1["partitions_done"] == 1
    # a new shard sorts BEFORE the committed one
    p_a = str(in_dir / "shard_a.parquet")
    pq.write_table(pages.slice(n // 2, n - n // 2), p_a)
    stats2 = run_job([p_a, p_b], out_dir, concurrency=2)
    assert stats2["partitions_skipped"] == 1   # shard_b stays committed
    assert stats2["partitions_done"] == 1      # shard_a is processed
    tbl = dataset_to_table(read_job_output(out_dir))
    assert tbl.num_rows == n


def test_run_job_rejects_regrouped_resume(tmp_path, pages):
    """Resuming with a different files_per_partition must hard-error, not
    silently re-extract committed source files under new partition keys."""
    in_dir = tmp_path / "in"
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    import pyarrow.parquet as pq
    n = pages.num_rows
    paths = []
    for k in range(4):
        p = str(in_dir / f"shard_{k}.parquet")
        pq.write_table(pages.slice(k * n // 4, n // 4), p)
        paths.append(p)
    with pytest.raises(RuntimeError, match="injected failure"):
        run_job(paths, out_dir, concurrency=2, fail_after=1)
    # same files, different grouping: keys differ but files overlap
    with pytest.raises(ValueError, match="resume mismatch"):
        run_job(paths, out_dir, concurrency=2, files_per_partition=2)
    # the original grouping still resumes cleanly
    stats = run_job(paths, out_dir, concurrency=2)
    assert stats["partitions_skipped"] == 1
    assert stats["partitions_done"] == 3
    assert dataset_to_table(read_job_output(out_dir)).num_rows == n


def test_read_job_output_rejects_overlapping_manifest(tmp_path, pages):
    """A manifest whose records cover one source file twice (accumulated
    runs with different groupings) must refuse to read, not duplicate rows."""
    in_dir = tmp_path / "in"
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    import pyarrow.parquet as pq
    p = str(in_dir / "shard.parquet")
    pq.write_table(pages.slice(0, 8), p)
    run_job([p], out_dir, concurrency=2)
    from pero_ocr_ray.state.manifest import Manifest
    m = Manifest(out_dir)
    rec = m.records()[0]
    m.commit("part-forged-0000000000", {"source_files": rec["source_files"],
                                        "rows": rec["rows"]})
    os.makedirs(os.path.join(out_dir, "part-forged-0000000000"), exist_ok=True)
    with pytest.raises(ValueError, match="manifest corrupt"):
        read_job_output(out_dir)


def test_run_job_cleans_stale_tmp_dir(tmp_path, pages):
    """A crash mid-write leaves partial files in _tmp_{key}; the rerun must
    replace them, not publish old+new files side by side (row duplication)."""
    in_dir = tmp_path / "in"
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    import pyarrow.parquet as pq
    p = str(in_dir / "shard.parquet")
    pq.write_table(pages.slice(0, 12), p)
    from pero_ocr_ray.pipelines.extract import _partition_key
    key = _partition_key([p])
    stale = os.path.join(out_dir, f"_tmp_{key}")
    os.makedirs(stale)
    pq.write_table(pages.slice(0, 5), os.path.join(stale, "zz_stale.parquet"))
    stats = run_job([p], out_dir, concurrency=2)
    assert stats["rows"] == 12
    tbl = dataset_to_table(read_job_output(out_dir))
    assert tbl.num_rows == 12  # stale partial rows were not published


def test_dedup_bucketed_large_corpus():
    """The bucketed dedup shape (round-5: one vectorized pass per url
    bucket, not one map_groups dispatch per url) on a corpus big enough
    that the per-group-dispatch regime would dominate: 60k rows / 20k
    urls. Verifies the survivor SET matches the (warc_ts, row_id)-argmax
    rule exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    n_urls, copies = 20_000, 3
    rng = np.random.RandomState(7)
    url = np.repeat([f"https://h{i % 97}.example/p{i}" for i in range(n_urls)],
                    copies)
    ts = rng.randint(1_500_000_000, 1_700_000_000,
                     size=n_urls * copies).astype("datetime64[s]")
    row_id = np.arange(n_urls * copies, dtype=np.int64)
    tbl = pa.table({
        "url": pa.array(url, pa.string()),
        "warc_ts": pa.array(ts.astype("datetime64[us]"),
                            pa.timestamp("us")),
        "row_id": pa.array(row_id, pa.int64()),
        "html": pa.array([b"<html>x</html>"] * (n_urls * copies),
                         pa.binary()),
    })
    out = dataset_to_table(dedup_pages(rd.from_arrow(tbl).repartition(16)))
    assert out.num_rows == n_urls
    got = dict(zip(out.column("url").to_pylist(),
                   out.column("row_id").to_pylist()))
    df = tbl.select(["url", "warc_ts", "row_id"]).to_pandas()
    expect = (df.sort_values(["url", "warc_ts", "row_id"])
              .groupby("url", sort=False).tail(1))
    for u, r in zip(expect["url"], expect["row_id"]):
        assert got[u] == r
