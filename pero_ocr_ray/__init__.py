"""pero_ocr_ray — a Ray-Data-native main-content extraction engine.

A from-scratch rebuild of the data-processing capabilities of DCGM/pero-ocr
(reference at /root/reference) recast for Common-Crawl-style web pages:

  pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)
    -> read_parquet -> decode/normalize -> DOM/PDF parse -> block classify
    -> segment -> reading order -> emit extracted_text -> write_parquet

Design stance (see SURVEY.md §7):
  * every hot-path operator is ``map_batches`` over Arrow batches;
  * stateful stages (warm parsers, classifiers) are actor pools;
  * all per-row kernels are pure, deterministic, and shared verbatim between
    the sequential oracle (:mod:`pero_ocr_ray.oracle`) and the Ray stages —
    byte-identical output per url by construction, verified by tests;
  * the only shuffles are url-dedup / merge groupbys and optional
    size-bucket repartition; everything else is narrow and streams.
"""

__version__ = "0.1.0"

from pero_ocr_ray import rayfix as _rayfix

# Ray 2.49 hash-shuffle schema-broadcast workaround (see rayfix docstring):
# without it, native joins abort parallelism-dependently whenever a side's
# first-scheduled block is empty. Installed at import so the driver, bench,
# tests, and CLI all get it before any Dataset executes; no-op on Ray
# versions whose internals don't match.
_rayfix.install()

from pero_ocr_ray.kernels.config import ExtractConfig, DEFAULT_CONFIG  # noqa: F401
