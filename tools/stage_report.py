"""Per-stage performance report (G5 analog: throughput accounting).

Runs the flagship pipeline over the bench corpus (or a given parquet dir)
and prints the full ``ds.stats()`` breakdown — remote wall/cpu, UDF time,
rows and bytes per block, per-operator throughput — the feedback loop used
to tune batch size / pool size.

    python tools/stage_report.py [pages_dir] [num_cpus]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import logging

    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from pero_ocr_ray.pipelines.extract import extract_pipeline

    if len(sys.argv) > 1:
        pages_dir = sys.argv[1]
    else:
        from bench import ensure_bench_pages, SF_DIR
        pages_dir, _, _ = ensure_bench_pages(SF_DIR)
    paths = sorted(os.path.join(pages_dir, f) for f in os.listdir(pages_dir)
                   if f.endswith(".parquet"))
    ds = rd.read_parquet(paths, columns=["url", "warc_ts", "html",
                                         "lang", "row_id"])
    out = extract_pipeline(ds)
    out.write_parquet("/tmp/stage_report_out")
    print(out.stats())
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
