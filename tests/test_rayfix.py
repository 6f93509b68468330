"""Direct tests for the Ray 2.49 hash-shuffle schema-broadcast workaround
(pero_ocr_ray/rayfix.py). The round-4 failure class: a join side whose
first-scheduled block is EMPTY loses its schema broadcast, so zero-row
partitions finalize no-column tables and Acero aborts — parallelism-
dependently. These reproduce the trigger shapes directly at high partition
counts inside the 4-CPU test session (no actor pools involved, so
over-provisioned aggregators cannot deadlock)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from pero_ocr_ray import rayfix
from pero_ocr_ray.util import dataset_to_table


def test_rayfix_installed():
    assert rayfix._INSTALLED and rayfix.install()


def _sparse_side(n_rows: int, keep_every: int | None,
                 blocks: int) -> rd.Dataset:
    """A filtered dataset most of whose blocks are EMPTY pandas blocks —
    the exact shape a selective filter at high read parallelism makes.
    ``keep_every=None`` keeps NOTHING (the fully-empty-side edge)."""
    def keep(df: pd.DataFrame) -> pd.DataFrame:
        mask = (df["id"] < 0) if keep_every is None \
            else (df["id"] % keep_every == 0)
        return df.loc[mask, ["id"]].rename(columns={"id": "key"})

    return (rd.range(n_rows).repartition(blocks)
            .map_batches(keep, batch_format="pandas"))


def test_join_survives_empty_first_blocks_at_high_partition_count():
    # right side: ~11 surviving rows spread over 64 blocks (most empty);
    # without rayfix this shape aborts with "No match ... FieldRef(key)"
    # once partitions outnumber surviving blocks (reproduced on the TPC-H
    # q3 customer side at 32). 8 partitions here: each aggregator actor
    # needs a CPU slot, so 32 would deadlock the 4-CPU test session — the
    # true 32-partition run lives in test_join_parity.py's subprocess.
    left = rd.range(200).map_batches(
        lambda df: pd.DataFrame({"key": df["id"] % 37, "v": df["id"]}),
        batch_format="pandas")
    right = _sparse_side(200, keep_every=31, blocks=64)
    out = dataset_to_table(
        left.join(right, join_type="inner", num_partitions=8,
                  on=("key",), right_on=("key",)))
    # keys 0 and 31 survive the right filter and are < 37
    expect = sum(1 for i in range(200) if i % 37 in (0, 31))
    assert out.num_rows == expect


def test_join_on_aggregate_output_at_high_partition_count():
    # aggregate outputs carry null-schema empty blocks in sparse
    # partitions; rayfix drops them before the join shuffle
    from ray.data.aggregate import Sum

    base = rd.range(500).map_batches(
        lambda df: pd.DataFrame({"key": df["id"] % 7, "n": 1}),
        batch_format="pandas")
    agg = base.groupby("key").aggregate(Sum("n", alias_name="total"))
    dim = rd.from_arrow(pa.table({"key": pa.array(range(7), pa.int64()),
                                  "name": [f"k{i}" for i in range(7)]}))
    out = dataset_to_table(
        agg.join(dim, join_type="inner", num_partitions=8, on=("key",)))
    assert out.num_rows == 7
    # ids 0..499: residues 0-2 occur 72 times, residues 3-6 occur 71
    assert sorted(out.column("total").to_pylist()) == [71] * 4 + [72] * 3


def test_groupby_unaffected_by_empty_drop():
    # dropping empty bundles must not change aggregation results
    from ray.data.aggregate import Sum

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["id"] < 5, ["id"]]

    sparse = rd.range(1000).repartition(50).map_batches(
        keep, batch_format="pandas")
    rows = (sparse.groupby("id").aggregate(Sum("id", alias_name="s"))
            .take_all())
    assert sorted(int(r["s"]) for r in rows) == [0, 1, 2, 3, 4]


def test_unify_schemas_strips_unhashable_metadata(caplog):
    import ray.data._internal.arrow_ops.transform_pyarrow as tp

    meta_schema = pa.schema([("a", pa.int64())]).with_metadata(
        {b"pandas": b"{}"})
    out = tp.unify_schemas([meta_schema, meta_schema])
    assert out.names == ["a"]
    assert "Failed to hash the schemas" not in caplog.text


def test_fully_empty_side_still_documented_edge():
    """A side with ZERO rows anywhere has no schema to broadcast — the
    documented remaining edge (pipelines guard it with sentinels). The
    join either returns empty or raises the known ArrowInvalid; it must
    never return wrong rows."""
    left = rd.range(100).map_batches(
        lambda df: pd.DataFrame({"key": df["id"], "v": df["id"]}),
        batch_format="pandas")
    right = _sparse_side(100, keep_every=None, blocks=16)  # 0 rows
    try:
        out = dataset_to_table(
            left.join(right, join_type="inner", num_partitions=4,
                      on=("key",), right_on=("key",)))
        assert out.num_rows == 0
    except Exception as e:  # the known upstream abort is acceptable here
        assert "ArrowInvalid" in type(e).__name__ or "No match" in str(e)
