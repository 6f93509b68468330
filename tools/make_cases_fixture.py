"""Sequential replay of the case-catalog queries -> golden fixture parquet.

``extract_cases`` / ``refine_cases`` run the full FIXTURES.md case catalog
(boilerplate, multicolumn, malformed, PDFs, heavy-tail pages) — synthetic
case content that is NOT SQL-derivable from the documents text. Their
oracle is therefore the reference's own golden-output strategy
(/root/reference/test/processing_test.sh:83-124 analog): this script
replays BOTH queries end-to-end in one plain-Python process through the
exact kernels the Ray stages import (oracle.extract_table ->
kernels.emit.extract_document; stages.refine.dehyphenate_text) and writes
the per-url results to ``tests/golden/cases_oracle.parquet``. The driver's
gate then compares the DISTRIBUTED run against this sequential ground
truth via ``read_parquet`` in ``oracle_sql()`` — scheduling/assembly is
what's under test, kernel drift is impossible by construction.

Rows for every sf dir are stored in ONE file, discriminated by
``corpus_len = sum(length(text))`` of the source documents table (row
counts collide across sf0.001/sf0.01 — both 500 docs).

Usage: python tools/make_cases_fixture.py [out_path] [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DEFAULT_SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1")
DEFAULT_OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden", "cases_oracle.parquet")


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def sequential_cases(sf_dir: str) -> pa.Table:
    from pero_ocr_ray.oracle import extract_table
    from pero_ocr_ray.sources.pages import pages_from_documents
    from pero_ocr_ray.stages.refine import dehyphenate_text

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    corpus_len = int(pc.sum(pc.utf8_length(docs.column("text"))).as_py())
    tab = extract_table(pages_from_documents(docs, "cases"))
    m = tab.column("metrics").combine_chunks()
    texts = tab.column("extracted_text").to_pylist()
    return pa.table({
        "corpus_len": pa.array([corpus_len] * tab.num_rows, pa.int64()),
        "url": tab.column("url"),
        "payload_kind": tab.column("payload_kind"),
        "blocks_kept": m.field("blocks_kept"),
        "blocks_dropped": m.field("blocks_dropped"),
        "chars_emitted": m.field("chars_emitted"),
        "text_md5": pa.array([md5_hex(t) for t in texts], pa.string()),
        "refined_md5": pa.array([md5_hex(dehyphenate_text(t))
                                 for t in texts], pa.string()),
        "refined_chars": pa.array([len(dehyphenate_text(t))
                                   for t in texts], pa.int64()),
    })


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    sf_dirs = sys.argv[2:] or list(DEFAULT_SF_DIRS)
    parts = []
    for sf_dir in sf_dirs:
        part = sequential_cases(sf_dir)
        print(f"{sf_dir}: {part.num_rows} rows, "
              f"corpus_len={part.column('corpus_len')[0].as_py()}")
        parts.append(part)
    tab = pa.concat_tables(parts)
    distinct = sorted(set(tab.column("corpus_len").to_pylist()))
    if len(distinct) != len(sf_dirs):
        raise SystemExit(f"corpus_len collision across sf dirs: {distinct} "
                         f"— the fixture discriminator is ambiguous")
    pq.write_table(tab, out)
    print(f"wrote {tab.num_rows} rows -> {out}")


if __name__ == "__main__":
    main()
