"""Cross-corpus paragraph deduplication (CCNet-style boilerplate removal).

Web corpora repeat paragraphs across documents far more than whole pages —
cookie banners, navigation text, license blurbs. The standard curation
step (CCNet; also the line-dedup pass in Gopher/MassiveText) removes every
repeated paragraph while keeping ONE canonical copy, then reassembles
documents from their surviving paragraphs.

Scale shape (no stage ever holds a hot paragraph's full copy set):

1. explode docs -> (doc_id, idx, para, para_hash) with a vectorized Arrow
   split (``pc.split_pattern`` + ``list_flatten``/``list_parent_indices``);
   the md5-high-64 paragraph hash is the only per-row Python work;
2. per-batch combiner -> (para_hash, min packed key, count) partials ->
   ``groupby(para_hash).aggregate(Min, Sum)``: a paragraph duplicated a
   million times crosses the shuffle as one row per source block;
3. the duplicated-hash table (n_copies >= min_copies, usually tiny vs the
   corpus) LEFT-OUTER hash-joins back onto the exploded stream: an
   instance survives iff its hash is unduplicated OR it is the winner
   (minimal ``doc_id * 2^20 + idx`` — deterministic first occurrence);
4. ``groupby(doc_id).map_groups`` reassembles each doc from its surviving
   paragraphs in original order — groups are bounded by single-document
   size, never by corpus-wide duplication.

Determinism: winner selection and output order derive only from
(doc_id, idx); hashes are md5 (process-independent). Hash equality stands
in for string equality up to md5-64 collisions (2^-64), the same
documented trade the MinHash/SimHash suite makes. Docs whose every
paragraph is a dup won elsewhere drop out of the output entirely (both
engines agree; downstream length filters would kill them anyway).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

PARA_SEP = "\n\n"
IDX_BITS = 20  # packed winner key = doc_id << IDX_BITS | idx


def _md5_high64(strings) -> np.ndarray:
    """md5-high-64 per string (repo-wide hash convention), viewed int64 so
    Arrow group/join kernels treat it natively; the uint64 view is
    recovered at the output boundary when a query exposes hashes."""
    out = np.fromiter(
        (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)
         for s in strings),
        dtype=np.uint64, count=len(strings))
    return out.view(np.int64)


def explode_paragraphs(ds: rd.Dataset, sep: str = PARA_SEP) -> rd.Dataset:
    """-> (doc_id, idx, para, para_hash, pkey): one row per paragraph
    instance, ``idx`` 0-based within its doc. Empty text is ONE empty
    paragraph (``"".split(sep) == [""]``) — consistent with SQL
    ``string_split``."""

    def explode(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("text"), pattern=sep)
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts)
        doc_id = pc.take(t.column("doc_id"), parent).cast(pa.int64())
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        idx = (np.concatenate([np.arange(n, dtype=np.int64) for n in lens])
               if len(lens) else np.array([], dtype=np.int64))
        if idx.size and idx.max() >= (1 << IDX_BITS):
            raise ValueError(f"doc with >= 2^{IDX_BITS} paragraphs")
        hashes = _md5_high64(flat.to_pylist())
        pkey = (doc_id.to_numpy(zero_copy_only=False) << IDX_BITS) | idx
        return pa.table({
            "doc_id": doc_id,
            "idx": pa.array(idx, pa.int64()),
            "para": flat,
            "para_hash": pa.array(hashes, pa.int64()),
            "pkey": pa.array(pkey, pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def _dup_table(exploded: rd.Dataset, min_copies: int) -> rd.Dataset:
    """-> (para_hash, wkey, n_copies) for paragraphs with >= min_copies
    instances corpus-wide. Combiner shape: per-block (hash, min, count)
    partials, then one aggregate shuffle over partials."""
    from ray.data.aggregate import Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        g = (t.select(["para_hash", "pkey"])
             .group_by("para_hash")
             .aggregate([("pkey", "min"), ("pkey", "count")]))
        return pa.table({"para_hash": g.column("para_hash"),
                         "wkey_partial": g.column("pkey_min"),
                         "n_partial": pc.cast(g.column("pkey_count"),
                                              pa.int64())})

    agg = (exploded.map_batches(partial, batch_format="pyarrow")
           .groupby("para_hash")
           .aggregate(Min("wkey_partial", alias_name="wkey"),
                      Sum("n_partial", alias_name="n_copies")))

    dup_schema = pa.schema([("para_hash", pa.int64()),
                            ("wkey", pa.int64()),
                            ("n_copies", pa.int64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # aggregate emits empty blocks; keep schema stable
            return dup_schema.empty_table()
        t = t.filter(pc.greater_equal(t.column("n_copies"),
                                      pa.scalar(min_copies)))
        return pa.table({"para_hash": t.column("para_hash"),
                         "wkey": pc.cast(t.column("wkey"), pa.int64()),
                         "n_copies": pc.cast(t.column("n_copies"),
                                             pa.int64())})

    # cluster-scaled repartition consolidates the aggregate's output
    # before the native join (empty blocks themselves are handled by
    # rayfix; the repartition keeps the dup table from being many tiny
    # blocks, and is the fallback if the rayfix version guard disables)
    from pero_ocr_ray.util import shuffle_partitions
    return (agg.map_batches(finish, batch_format="pyarrow")
            .repartition(shuffle_partitions()))


def duplicate_paragraph_stats(ds: rd.Dataset, min_copies: int = 2,
                              sep: str = PARA_SEP) -> rd.Dataset:
    """-> (para_hash uint64, n_copies, winner_doc_id) per corpus-duplicated
    paragraph — the boilerplate census a curation run reports."""
    dup = _dup_table(explode_paragraphs(ds, sep), min_copies)

    def expose(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("para_hash", pa.uint64()),
                              ("n_copies", pa.int64()),
                              ("winner_doc_id", pa.int64())]).empty_table()
        wdoc = t.column("wkey").to_numpy(zero_copy_only=False) >> IDX_BITS
        return pa.table({
            "para_hash": pa.array(
                t.column("para_hash").to_numpy(zero_copy_only=False)
                .view(np.uint64), pa.uint64()),
            "n_copies": t.column("n_copies"),
            "winner_doc_id": pa.array(wdoc, pa.int64()),
        })

    return dup.map_batches(expose, batch_format="pyarrow")


def paragraph_dedup(ds: rd.Dataset, min_copies: int = 2,
                    sep: str = PARA_SEP,
                    num_buckets: int = 1024) -> rd.Dataset:
    """-> (doc_id, text, n_paras, n_dropped): each document rebuilt from
    the paragraphs that survive global paragraph dedup (first occurrence
    by (doc_id, idx) kept, all other copies dropped).

    Reassembly groups docs into ``doc_id % num_buckets`` buckets and
    rebuilds a whole bucket with one vectorized pandas groupby — per-doc
    ``map_groups`` dispatch costs ~0.5 ms/group in scheduler+slice
    overhead, which capped an earlier version at ~1.6k docs/s; bucketing
    amortizes it 1000x. Partitioning assumption (document like the other
    bucketed ops): one bucket = ~1/num_buckets of the SURVIVING paragraph
    stream must fit a worker's heap — size ``num_buckets`` to corpus/node
    count on a real cluster. Dropped paragraphs cross the shuffle as empty
    strings (only their count matters), so boilerplate-heavy corpora ship
    bytes proportional to what survives."""
    from pero_ocr_ray.functions.join import hash_join

    # checkpoint the exploded corpus ONCE: it feeds both the duplicate
    # counting aggregate and the join's left side, and leaving it lazy
    # re-runs the whole split+md5 scan a second time (measured 2x the
    # kernel CPU of the job). Same phase-checkpoint rationale as
    # curate_full: at 100 TB this lands in the object store and spills —
    # the alternative (re-reading and re-hashing the corpus) costs more.
    exploded = explode_paragraphs(ds, sep).materialize()
    dup = _dup_table(exploded, min_copies).select_columns(
        ["para_hash", "wkey"])
    joined = hash_join(exploded, dup, on="para_hash",
                       join_type="left_outer")

    def mark(t: pa.Table) -> pa.Table:
        wkey = t.column("wkey")
        kept = pc.coalesce(pc.equal(t.column("pkey"), wkey),
                           pa.scalar(True))  # null wkey => unduplicated
        doc_id = t.column("doc_id")
        bucket = pa.array(
            doc_id.to_numpy(zero_copy_only=False) % num_buckets, pa.int64())
        return pa.table({"doc_id": doc_id,
                         "bucket": bucket,
                         "idx": t.column("idx"),
                         "para": pc.if_else(kept, t.column("para"),
                                            pa.scalar("")),
                         "kept": kept})

    marked = joined.map_batches(mark, batch_format="pyarrow")

    def rebuild_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["doc_id", "idx"], kind="mergesort")
        sizes = g.groupby("doc_id", sort=True).size()
        kept = g[g["kept"]]
        txt = kept.groupby("doc_id", sort=True)["para"].agg(sep.join)
        nk = kept.groupby("doc_id", sort=True).size()
        # explicit Arrow types: empty pandas blocks otherwise convert with
        # null-typed columns, and any downstream join rejects the block
        # (CLAUDE.md join gotcha)
        return pa.table({
            "doc_id": pa.array(txt.index.to_numpy(dtype="int64"),
                               pa.int64()),
            "text": pa.array(txt.to_numpy(dtype=object), pa.string()),
            "n_paras": pa.array(sizes.reindex(txt.index)
                                .to_numpy(dtype="int64"), pa.int64()),
            "n_dropped": pa.array((sizes.reindex(txt.index)
                                   - nk.reindex(txt.index))
                                  .to_numpy(dtype="int64"), pa.int64()),
        })

    return marked.groupby("bucket").map_groups(rebuild_bucket)
