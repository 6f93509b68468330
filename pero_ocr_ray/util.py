"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa


def dataset_to_table(ds) -> pa.Table:
    """Materialize a (small) Dataset to one Arrow table — tests/results only."""
    tables = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    """Zero-copy drop of schema metadata. pa.Table.from_pandas (Ray's
    pandas->arrow block conversion) embeds a metadata dict that makes
    ``hash(schema)`` raise, so every downstream shuffle task logs "Failed
    to hash the schemas (for deduplication): unhashable type: 'dict'" and
    skips schema dedup — thousands of warning lines per job at scale."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def arrow_meta_free(ds):
    """Normalize a Dataset to Arrow blocks with hashable schemas (see
    :func:`strip_schema_metadata`); a no-op pass-through for blocks that
    are already clean Arrow. Apply to the tail of any pandas-block stage
    whose output feeds a shuffle (groupby / repartition / join)."""
    # batch_size=None: whole blocks pass through as zero-copy tables
    # instead of being re-sliced into default-sized batches
    return ds.map_batches(strip_schema_metadata, batch_format="pyarrow",
                          batch_size=None)


def shuffle_partitions(cap: int = 64) -> int:
    """CPU-scaled partition count for joins and the repartitions that guard
    them: ``max(2, min(cap, cluster CPUs))``. One shared rule so the
    repartition that consolidates an aggregate's output (see
    :func:`agg_join_safe`) scales with the same cluster size as the join
    that consumes it."""
    import ray
    cpus = (int(ray.cluster_resources().get("CPU", 4))
            if ray.is_initialized() else 4)
    return max(2, min(cap, cpus))


def agg_join_safe(ds, num_blocks: int | None = None):
    """Consolidate a ``groupby().aggregate()`` output before feeding it to a
    native join. Aggregate outputs carry NULL-SCHEMA empty blocks in sparse
    partitions, and ``map_batches`` (hence :func:`pin_empty_blocks`) SKIPS
    the UDF on empty blocks — a repartition is the only operator that
    actually merges them away (CLAUDE.md join gotcha; the round-4
    ``doc_tfidf_topk`` 32-CPU abort). ``num_blocks`` defaults to the
    cluster-scaled :func:`shuffle_partitions` — keep it <= the dataset's row
    count (repartition re-emits null-schema empties past that)."""
    return ds.repartition(num_blocks or shuffle_partitions())


def pin_empty_blocks(ds, schema: pa.Schema):
    """Rewrite zero-row blocks to carry ``schema`` explicitly (and strip
    metadata from the rest). Sparse shuffle partitions emit NULL-SCHEMA
    empty blocks (no columns at all); a downstream native join then fails
    with ``ArrowInvalid: No match ... for key field FieldRef(<key>)``.
    ``repartition(n)`` hides it only while every output block is non-empty
    — at tiny inputs it bites again, so pin the schema statically at the
    join boundary (the caller always knows its own output schema)."""
    def fix(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        return strip_schema_metadata(t)

    return ds.map_batches(fix, batch_format="pyarrow", batch_size=None)
