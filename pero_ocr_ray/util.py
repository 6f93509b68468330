"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa


def dataset_to_table(ds) -> pa.Table:
    """Materialize a (small) Dataset to one Arrow table — tests/results only."""
    tables = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")
