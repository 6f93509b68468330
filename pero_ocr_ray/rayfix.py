"""Targeted workaround for a Ray Data 2.49 hash-shuffle schema-broadcast bug.

Upstream behavior (ray/data/_internal/execution/operators/hash_shuffle.py):
the hash-shuffle operator (joins, hash aggregations) broadcasts each input's
schema to every aggregator exactly once, piggybacked on the FIRST
``_shuffle_block`` task submitted per side (``send_empty_blocks=True``).
Two defects combine to make native joins abort parallelism-dependently:

1. ``_shuffle_block`` early-returns on a zero-row block BEFORE the broadcast
   loop, while the operator still marks the side as broadcasted — so if the
   first-scheduled block happens to be empty (routine for a filtered side at
   high read parallelism: e.g. 64 read blocks, 34 surviving rows), no schema
   ever reaches the aggregators.
2. Even when an empty block IS broadcast, Ray's pandas→Arrow block
   conversion null-types every column of an EMPTY pandas block, so the
   broadcast shards poison the partition tables with ``null``-typed key
   columns.

Either way, a partition that receives zero rows for one side finalizes a
no-column (or null-typed) table and ``pyarrow.Table.join`` dies::

    pyarrow.lib.ArrowInvalid: No match or multiple matches for key field
    reference FieldRef.Name(<key>) on right side of the join

This is the root cause of every parallelism-dependent join abort documented
in CLAUDE.md (passes at 8 CPUs, fails at 32 — more blocks, more chances the
first-scheduled one is empty; reproduced deterministically on the TPC-H Q3
customer side at sf0.001 / 32 CPUs, and diagnosed by instrumenting the
aggregators: the zero-row side's partition tables had ``null``-typed or
missing key fields).

The fix attacks the cause instead of the symptom: drop ZERO-ROW blocks from
every bundle entering a hash-shuffle operator (``_do_add_input_inner`` runs
in the driver process, so a class patch takes effect without any pickling
games). Empty blocks carry no data — upstream's ``_shuffle_block`` discards
them anyway — but dropping them up front guarantees the schema broadcast
rides a NON-EMPTY block whose Arrow conversion has real column types. This
also retires the null-schema-empties-from-aggregates trap: those blocks now
never reach a downstream join's shuffle at all.

``_shuffle_block`` is additionally wrapped so that an empty block that does
slip through on the broadcast task (num_rows unknown in metadata) still
broadcasts its schema when it carries typed columns, instead of being
silently dropped.

Remaining known edge: a side whose EVERY block is empty still has no schema
to broadcast (there is none to be had) — a join against a fully-empty side
can still abort at high partition counts. Pipeline code guards that case
with non-empty sentinels (see pipelines/training_data.py::curate_v4).

Version-guarded: if Ray's internals don't match (attribute lookup fails),
the patches are skipped and the engine falls back to the site-level
``repartition`` guards it has always carried.
"""

from __future__ import annotations

_INSTALLED = False


def install() -> bool:
    """Install the hash-shuffle schema fixes once per process. Returns True
    if active (already installed counts), False if this Ray version's
    internals don't match."""
    global _INSTALLED
    if _INSTALLED:
        return True
    try:
        import ray
        import ray.data._internal.execution.operators.hash_shuffle as hs
        from ray.data._internal.execution.interfaces import RefBundle

        orig_shuffle_fn = hs._shuffle_block._function
        orig_add_input = hs.HashShufflingOperatorBase._do_add_input_inner
        # presence-check every internal the wrappers touch, so an upstream
        # refactor disables the patch instead of breaking at runtime
        hs.BlockExecStats, hs.BlockAccessor, hs.TableBlockAccessor
        hs.BlockType, hs._create_empty_table
    except Exception:
        return False

    import ray

    def _do_add_input_drop_empty(self, input_bundle, input_index):
        kept = tuple(
            (ref, meta)
            for ref, meta in zip(input_bundle.block_refs, input_bundle.metadata)
            if meta.num_rows is None or meta.num_rows > 0
        )
        if len(kept) < len(input_bundle.blocks):
            if not kept:
                return  # nothing but empty blocks: nothing to shuffle
            input_bundle = RefBundle(
                blocks=kept,
                schema=input_bundle.schema,
                owns_blocks=input_bundle.owns_blocks,
            )
        return orig_add_input(self, input_bundle, input_index)

    def _shuffle_block_schema_safe(
        block, input_index, key_columns, pool, block_transformer=None,
        send_empty_blocks=False, override_partition_id=None,
    ):
        # Do the transformer + Arrow conversion up front (and pass
        # block_transformer=None below so upstream doesn't re-apply), then
        # strip schema metadata: pandas-origin blocks embed a metadata
        # dict that makes hash(schema) raise inside every AGGREGATOR
        # actor's concat (aggregators never import this package, so the
        # unify_schemas patch can't reach them — but every shard they
        # receive passes through here first).
        if block_transformer is not None:
            block = block_transformer(block)
        block = hs.TableBlockAccessor.try_convert_block_type(
            block, block_type=hs.BlockType.ARROW)
        if block.schema.metadata:
            block = block.replace_schema_metadata(None)
        if send_empty_blocks and block.num_rows == 0 \
                and len(block.schema.names) > 0:
            # the case upstream drops: empty block on the schema-broadcast
            # task — send one empty schema-ful shard to every partition so
            # no aggregator finalizes a no-column table. (Only reachable
            # for blocks whose metadata lacks num_rows; typed schemas
            # only.)
            stats = hs.BlockExecStats.builder()
            shard = hs._create_empty_table(block.schema)
            waits = []
            for pid in range(pool.num_partitions):
                agg = pool.get_aggregator_for_partition(pid)
                ref = ray.put(shard)
                waits.append(agg.submit.remote(input_index, pid, ref))
            ray.get(waits)
            meta = hs.BlockAccessor.for_block(block).get_metadata(
                exec_stats=stats.build())
            return (meta, {})
        return orig_shuffle_fn(
            block, input_index, key_columns, pool,
            block_transformer=None,
            send_empty_blocks=send_empty_blocks,
            override_partition_id=override_partition_id,
        )

    hs.HashShufflingOperatorBase._do_add_input_inner = _do_add_input_drop_empty
    hs._shuffle_block = ray.remote(_shuffle_block_schema_safe)

    try:
        import ray.data._internal.arrow_ops.transform_pyarrow as tp

        orig_unify = tp.unify_schemas

        def unify_schemas_hashable(schemas, *args, **kwargs):
            # pa.Table.from_pandas embeds a metadata dict that makes
            # hash(schema) raise, so every reduce task of a shuffle over
            # pandas-origin blocks logs "Failed to hash the schemas (for
            # deduplication): unhashable type: 'dict'" AND skips the
            # identical-schema early exit. Strip the metadata up front:
            # Ray blocks never consume it, and the log spam (thousands of
            # lines per job) drowns real warnings. Workers pick this up
            # when they import pero_ocr_ray while unpickling any UDF.
            schemas = [s.remove_metadata() if s.metadata else s
                       for s in schemas]
            return orig_unify(schemas, *args, **kwargs)

        tp.unify_schemas = unify_schemas_hashable
    except Exception:
        pass  # log-hygiene only; never block the functional patches

    _INSTALLED = True
    return True
