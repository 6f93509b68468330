"""Sequential oracle: plain-Python loop over rows, no Ray.

Golden-output producer for the byte-identity contract (FIXTURES.md): the
oracle imports the exact same kernel chain the Ray stages run
(:func:`pero_ocr_ray.kernels.emit.extract_document`), so pipeline-vs-oracle
equality checks scheduling/assembly, not kernel drift — mirroring the
reference's golden-output E2E strategy
(/root/reference/test/processing_test.sh:83-124).
"""

from __future__ import annotations

import pyarrow as pa

from pero_ocr_ray.kernels.config import ExtractConfig, DEFAULT_CONFIG
from pero_ocr_ray.kernels.emit import extract_document

SPAN_TYPE = pa.list_(pa.struct([
    ("block_id", pa.string()),
    ("line_id", pa.string()),
    ("char_start", pa.int64()),   # into the visible source stream
    ("char_end", pa.int64()),
    ("ext_start", pa.int64()),    # into extracted_text
    ("ext_end", pa.int64()),
]))
METRICS_TYPE = pa.struct([
    ("blocks_total", pa.int32()),
    ("blocks_kept", pa.int32()),
    ("blocks_dropped", pa.int32()),
    ("chars_emitted", pa.int64()),
])

OUTPUT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("row_id", pa.int64()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("extracted_text", pa.string()),
    ("spans", SPAN_TYPE),
    ("metrics", METRICS_TYPE),
    ("payload_kind", pa.string()),
    ("encoding", pa.string()),
    ("error", pa.string()),
])


def rows_to_output_table(rows: list[dict]) -> pa.Table:
    """Build the canonical output Arrow table from extract_document rows.

    Nested columns (spans, metrics) are assembled from flat arrays +
    offsets rather than python dict lists — the dict path cost ~26% of
    stage time on mixed pages."""
    simple = {n: pa.array([r.get(n) for r in rows], OUTPUT_SCHEMA.field(n).type)
              for n in ("url", "row_id", "warc_ts", "lang", "extracted_text",
                        "payload_kind", "encoding", "error")}
    # spans: list<struct> from flat columns + offsets
    offsets = [0]
    block_ids: list[str] = []
    line_ids: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    ext_starts: list[int] = []
    ext_ends: list[int] = []
    for r in rows:
        for s in r["spans"]:
            block_ids.append(s["block_id"])
            line_ids.append(s["line_id"])
            starts.append(s["char_start"])
            ends.append(s["char_end"])
            ext_starts.append(s["ext_start"])
            ext_ends.append(s["ext_end"])
        offsets.append(len(block_ids))
    span_struct = pa.StructArray.from_arrays(
        [pa.array(block_ids, pa.string()), pa.array(line_ids, pa.string()),
         pa.array(starts, pa.int64()), pa.array(ends, pa.int64()),
         pa.array(ext_starts, pa.int64()), pa.array(ext_ends, pa.int64())],
        names=["block_id", "line_id", "char_start", "char_end",
               "ext_start", "ext_end"])
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), span_struct)
    metrics = pa.StructArray.from_arrays(
        [pa.array([r["metrics"]["blocks_total"] for r in rows], pa.int32()),
         pa.array([r["metrics"]["blocks_kept"] for r in rows], pa.int32()),
         pa.array([r["metrics"]["blocks_dropped"] for r in rows], pa.int32()),
         pa.array([r["metrics"]["chars_emitted"] for r in rows], pa.int64())],
        names=["blocks_total", "blocks_kept", "blocks_dropped", "chars_emitted"])
    cols = dict(simple)
    cols["spans"] = spans
    cols["metrics"] = metrics
    return pa.table({n: cols[n] for n in OUTPUT_SCHEMA.names}, schema=OUTPUT_SCHEMA)


def extract_table(pages: pa.Table, cfg: ExtractConfig = DEFAULT_CONFIG) -> pa.Table:
    """Sequential extraction over a pages table -> output table (row order in)."""
    urls = pages.column("url").to_pylist()
    htmls = pages.column("html").to_pylist()
    langs = (pages.column("lang").to_pylist()
             if "lang" in pages.column_names else [""] * len(urls))
    tss = (pages.column("warc_ts").to_pylist()
           if "warc_ts" in pages.column_names else [None] * len(urls))
    # -1 matches the Ray stages' default for missing row_id (a positional
    # default would diverge: batch positions are meaningless under
    # distribution, and the gate compares oracle vs pipeline byte-for-byte)
    row_ids = (pages.column("row_id").to_pylist()
               if "row_id" in pages.column_names else [-1] * len(urls))
    rows = []
    for url, raw, lang, ts, rid in zip(urls, htmls, langs, tss, row_ids):
        out = extract_document(url, raw, cfg)
        out["lang"] = lang
        out["warc_ts"] = ts
        out["row_id"] = rid
        rows.append(out)
    return rows_to_output_table(rows)
