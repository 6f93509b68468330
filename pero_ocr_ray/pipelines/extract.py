"""The flagship extraction pipeline (SURVEY.md §7.2 stage graph).

    read_parquet(pages)
      └─ [optional] dedup url (groupby, keep latest warc_ts)      # shuffle
      └─ [optional] size-bucket repartition (skew handling)       # shuffle
      └─ map_batches(ParseExtractStage, concurrency=N)            # actor pool
      └─ write_parquet(out/part=K) + manifest                     # resumable

Everything else is narrow and streams; the parse stage is the only heavy
compute. Never calls ``ray.init``/``ray.shutdown`` (driver owns the session).
"""

from __future__ import annotations

import functools
import hashlib
import os

import numpy as np

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from pero_ocr_ray.kernels.config import ExtractConfig, DEFAULT_CONFIG
from pero_ocr_ray.stages.extract import (
    ClassifyStage, ParseExtractStage, decode_stage, emit_stage, order_stage,
    parse_stage, segment_stage,
)
from pero_ocr_ray.state.manifest import Manifest


def _auto_concurrency() -> int:
    """Parse-actor pool size: 3/8 of the CPUs.

    Re-measured after the segment fast-path made the parse kernel ~2x
    faster: interleaved sweeps at 32 cpus put 12 actors equal-to-better
    than the old 16 within the box's noise band (bests 4.7-5.9 s vs
    5.0-7.0 s), 3 ≈ 4 at 8 cpus, and OVERSIZING is the real hazard —
    pools at cpus*5/8+ collapse throughput 3-4x by starving the
    read/decompress/write tasks that now bound the wall."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(1, (cpus * 3 + 4) // 8)  # rounded 3/8: 4->2, 8->3, 32->12


def read_pages(source, columns: list[str] | None = None) -> rd.Dataset:
    """Pages Dataset from a parquet path/dir, an Arrow table, or a Dataset."""
    if isinstance(source, rd.Dataset):
        return source
    if isinstance(source, pa.Table):
        return rd.from_arrow(source)
    return rd.read_parquet(source, columns=columns)


def dedup_pages(ds: rd.Dataset, num_buckets: int = 1024) -> rd.Dataset:
    """Exact url dedup, keep latest ``warc_ts`` (tie-break: larger row_id,
    or html md5 when the input carries no lineage id — positional order
    within a url depends on shuffle arrival and would make the survivor
    nondeterministic when warc_ts values tie).

    Bucketed shape (SURVEY §2.7 new-engine requirement, the
    ``paragraphs.py`` 12x lesson): the shuffle keys on
    ``stable_hash(url) % num_buckets`` and ONE vectorized pass picks every
    bucket's survivors — per-url ``map_groups`` dispatch costs ~0.5 ms/group
    (scheduler + slice), which caps a billion-url crawl at ~1.6k urls/s of
    pure dispatch. Only the key columns convert to pandas for the argmax;
    the html payloads ride zero-copy Arrow and ``take`` selects survivor
    rows. Partitioning assumption: one bucket (~1/num_buckets of the crawl)
    fits a worker's heap — size ``num_buckets`` to corpus/node count on a
    real cluster.
    """
    import pandas as pd

    def add_bucket(t: pa.Table) -> pa.Table:
        # pd.util.hash_pandas_object: vectorized, process-stable (fixed
        # default key), unsalted — safe for a shuffle key (bucket ids are
        # representation-internal; the survivor set is bucket-independent)
        h = pd.util.hash_pandas_object(
            t.column("url").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "__bucket", pa.array((h % num_buckets).astype("int64"),
                                 pa.int64()))

    def dedup_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        keys = pd.DataFrame({"url": g.column("url").to_pandas(),
                             "warc_ts": g.column("warc_ts").to_pandas()})
        if "row_id" in g.column_names:
            keys["tie"] = g.column("row_id").to_pandas()
        else:
            # content-hash tie-break, computed only for duplicated urls
            dup = keys["url"].duplicated(keep=False).to_numpy()
            tie = np.empty(len(keys), dtype=object)
            tie[:] = ""
            if dup.any():
                idx = np.flatnonzero(dup)
                htmls = g.column("html").take(pa.array(idx)).to_pylist()
                tie[idx] = [hashlib.md5(h or b"").hexdigest()
                            for h in htmls]
            keys["tie"] = tie
        keys["pos"] = np.arange(len(keys), dtype=np.int64)
        sel = (keys.sort_values(["url", "warc_ts", "tie"], kind="mergesort")
               .groupby("url", sort=False).tail(1)["pos"].to_numpy())
        sel.sort()
        return g.take(pa.array(sel, pa.int64()))

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(dedup_bucket, batch_format="pyarrow"))


def add_size_buckets(ds: rd.Dataset, edges=(4096, 65536, 1 << 20)) -> rd.Dataset:
    """Annotate rows with a byte-length bucket id (O5 width-sort analog,
    /root/reference/pero_ocr/ocr_engine/line_ocr_engine.py:79-92): heavy
    rows group together so parse batches have homogeneous cost."""
    def bucketize(batch: pa.Table) -> pa.Table:
        lens = pc.fill_null(pc.binary_length(batch.column("html")), 0)
        bucket = pa.array(np.zeros(batch.num_rows, np.int32), pa.int32())
        for e in edges:
            bucket = pc.add(bucket, pc.cast(pc.greater_equal(lens, e),
                                            pa.int32()))
        return batch.append_column("size_bucket", pc.cast(bucket, pa.int32()))
    return ds.map_batches(bucketize, batch_format="pyarrow")


def extract_pipeline(ds: rd.Dataset, cfg: ExtractConfig = DEFAULT_CONFIG,
                     mode: str = "fused",
                     concurrency: int | None = None) -> rd.Dataset:
    """Compile the extraction chain onto a pages Dataset (lazy)."""
    if cfg.dedup_urls:
        ds = dedup_pages(ds)
    if cfg.size_bucketing:
        ds = add_size_buckets(ds)
        ds = ds.sort("size_bucket")  # co-locate similar-cost rows (shuffle)
    n_actors = concurrency or cfg.parse_concurrency or _auto_concurrency()
    if mode == "fused":
        return ds.map_batches(
            ParseExtractStage,
            fn_constructor_kwargs={"cfg": cfg.to_dict()},
            batch_format="pyarrow",
            batch_size=cfg.parse_batch_size,
            concurrency=n_actors,
            num_cpus=1,
        )
    if mode == "staged":
        b = cfg.vector_batch_size
        ds = ds.map_batches(functools.partial(decode_stage, cfg=cfg),
                            batch_format="pyarrow", batch_size=b)
        ds = ds.map_batches(functools.partial(parse_stage, cfg=cfg),
                            batch_format="pyarrow", batch_size=cfg.parse_batch_size)
        ds = ds.map_batches(functools.partial(segment_stage, cfg=cfg),
                            batch_format="pyarrow", batch_size=b)
        ds = ds.map_batches(ClassifyStage,
                            fn_constructor_kwargs={"cfg": cfg.to_dict()},
                            batch_format="pyarrow", batch_size=b,
                            concurrency=max(1, n_actors // 2), num_cpus=1)
        ds = ds.map_batches(functools.partial(order_stage, cfg=cfg),
                            batch_format="pyarrow", batch_size=b)
        ds = ds.map_batches(functools.partial(emit_stage, cfg=cfg),
                            batch_format="pyarrow", batch_size=b)
        return ds
    raise ValueError(f"unknown mode {mode!r}")


# ---------------------------------------------------------------------------
# resumable job driver (J4/D1 analog: skip-processed anti-join,
# /root/reference/user_scripts/parse_folder.py:73-102,314-323)
# ---------------------------------------------------------------------------


def _norm_source(path: str) -> str:
    """Canonical identity of one input file (symlink- and cwd-independent)."""
    return os.path.realpath(path)


def _covered_sources(manifest: Manifest) -> dict[str, str]:
    """Normalized source file -> partition key, across committed records."""
    covered: dict[str, str] = {}
    for rec in manifest.records():
        for p in rec.get("source_files", []):
            covered[_norm_source(p)] = rec.get("partition", "?")
    return covered


def _partition_key(paths: list[str]) -> str:
    """Content-derived partition key: stable under reordering / insertion of
    other input files (a positional ``part={pid}`` key silently skips or
    mis-attributes work when the file list changes between runs)."""
    norm = [_norm_source(p) for p in paths]
    digest = hashlib.md5("\n".join(norm).encode()).hexdigest()[:10]
    stem = os.path.splitext(os.path.basename(paths[0]))[0]
    stem = "".join(c if (c.isalnum() or c in "-_.") else "_" for c in stem)[:40]
    return f"part-{stem}-{digest}" if len(paths) == 1 else \
        f"part-{stem}+{len(paths) - 1}-{digest}"


def run_job(input_paths: list[str] | str, out_dir: str,
            cfg: ExtractConfig = DEFAULT_CONFIG, mode: str = "fused",
            concurrency: int | None = None,
            fail_after: int | None = None,
            files_per_partition: int = 1,
            compression: str = "zstd") -> dict:
    """Run extraction over input parquet files as resumable partitions.

    One partition = ``files_per_partition`` input files (at 100 TB: input
    shards are small, so grouping K files per committed partition amortizes
    the per-partition pipeline barrier). Finished partitions are recorded in
    ``out_dir/_manifest/``; a rerun skips them (the reference's
    skip-processed semantics). Partition keys derive from the source paths,
    not list position, so edits to the input list never mis-attribute
    committed work. Output files are written to a temp dir and renamed into
    place so partial writes are invisible.

    ``fail_after``: test hook — raise after committing that many partitions.
    """
    if isinstance(input_paths, str):
        if os.path.isdir(input_paths):
            input_paths = sorted(
                os.path.join(input_paths, f) for f in os.listdir(input_paths)
                if f.endswith(".parquet"))
        else:
            input_paths = [input_paths]
    k = max(1, files_per_partition)
    groups = [list(input_paths[i:i + k]) for i in range(0, len(input_paths), k)]
    manifest = Manifest(out_dir)
    done = manifest.completed()
    # Coverage is tracked at SOURCE-FILE granularity, not just partition-key:
    # a manifest written with a different files_per_partition, path spelling,
    # or cwd yields different keys for the same files — trusting keys alone
    # would re-extract committed files under new keys and read_job_output
    # would return both copies (silent row duplication). A group whose key
    # is unknown but whose files overlap committed work is a hard error.
    covered = _covered_sources(manifest)
    stats = {"partitions_total": len(groups), "partitions_skipped": 0,
             "partitions_done": 0, "rows": 0}
    for paths in groups:
        key = _partition_key(paths)
        if key in done:
            stats["partitions_skipped"] += 1
            continue
        overlap = {p: covered[_norm_source(p)] for p in paths
                   if _norm_source(p) in covered}
        if overlap:
            raise ValueError(
                f"resume mismatch: partition {key!r} is not in the manifest "
                f"but its source files were already committed under other "
                f"keys {sorted(set(overlap.values()))} ({sorted(overlap)}). "
                f"This happens when files_per_partition or the input path "
                f"spelling changed between runs; rerun with the original "
                f"grouping or point at a fresh out_dir.")
        ds = rd.read_parquet(paths)
        out = extract_pipeline(ds, cfg, mode=mode, concurrency=concurrency)
        tmp = os.path.join(out_dir, f"_tmp_{key}")
        final = os.path.join(out_dir, key)
        if os.path.exists(tmp):
            # a crash mid-write leaves partial files here; writing alongside
            # them would publish duplicated rows on commit
            import shutil
            shutil.rmtree(tmp)
        # zstd default: ~35% smaller durable output than snappy at equal
        # wall time (measured) — at corpus scale that is storage + network
        out.write_parquet(tmp, compression=compression)
        n_rows = sum(pq.read_metadata(os.path.join(tmp, f)).num_rows
                     for f in os.listdir(tmp) if f.endswith(".parquet"))
        if os.path.exists(final):
            import shutil
            shutil.rmtree(final)
        os.rename(tmp, final)
        manifest.commit(key, {"source_files": [_norm_source(p) for p in paths],
                              "rows": n_rows})
        stats["partitions_done"] += 1
        stats["rows"] += n_rows
        if fail_after is not None and stats["partitions_done"] >= fail_after:
            raise RuntimeError(f"injected failure after {fail_after} partitions")
    return stats


def read_job_output(out_dir: str) -> rd.Dataset:
    """Read back a job's committed output partitions.

    Refuses manifests in which two committed partitions cover the same
    source file (possible only if the directory accumulated runs with
    different groupings — reading it would silently duplicate rows)."""
    manifest = Manifest(out_dir)
    seen: dict[str, str] = {}
    for rec in manifest.records():
        for p in rec.get("source_files", []):
            src = _norm_source(p)
            if src in seen and seen[src] != rec.get("partition"):
                raise ValueError(
                    f"manifest corrupt: source file {src!r} is covered by "
                    f"both {seen[src]!r} and {rec.get('partition')!r}; "
                    f"reading would duplicate its rows")
            seen[src] = rec.get("partition")
    files = []
    for p in sorted(manifest.completed()):
        d = os.path.join(out_dir, p)
        files.extend(sorted(os.path.join(d, f) for f in os.listdir(d)
                            if f.endswith(".parquet")))
    return rd.read_parquet(files)
