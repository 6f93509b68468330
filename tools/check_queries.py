"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` (DuckDB) on the
same parquet tables: row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted). Usage:

    python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd
    if isinstance(result, rd.Dataset):
        from pero_ocr_ray.util import dataset_to_table
        result = dataset_to_table(result)
    if isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), ignore_index=True)
    body = df.to_csv(index=False, float_format="%.10g")
    return hashlib.md5(body.encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        # CHECK_CPUS=32 replicates the driver's session size — join
        # partitioning scales with CPUs, and a query can pass at 8 CPUs
        # while aborting at 32 (the round-4 doc_tfidf_topk failure)
        ray.init(address="local", num_cpus=int(os.environ.get("CHECK_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    failures = 0
    unknown = only - set(qs)
    if unknown:
        # a typo'd name silently checking nothing would read as a pass
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        failures += len(unknown)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows={len(got)} cols={sorted(got.columns)} "
                  f"[rows-only] {dt:.1f}s")
            continue
        want = con.sql(sqls[name]).df()
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems:
            h1, h2 = value_hash(got), value_hash(want)
            if h1 != h2:
                problems.append("value-hash mismatch")
                merged = got.reindex(sorted(got.columns), axis=1)
                merged = merged.sort_values(list(merged.columns), ignore_index=True)
                w = want.reindex(sorted(want.columns), axis=1)
                w = w.sort_values(list(w.columns), ignore_index=True)
                neq = (merged != w).any(axis=1)
                print("  first diffs (ray vs sql):")
                print(pd.concat([merged[neq].head(3), w[neq].head(3)]))
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"ok   {name}: rows={len(got)} MATCH {dt:.1f}s")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
