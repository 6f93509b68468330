"""Extraction stages for Ray Data ``map_batches``.

Two equivalent decompositions of the same kernel chain (tests assert
byte-identical output):

* **fused** (default, the hot path): :class:`ParseExtractStage` — one
  actor-pool stage running decode→parse→classify→segment→order→emit per row
  inside a single ``map_batches``. This is the shape the reference's
  ``PageParser.process_page`` chain has
  (/root/reference/pero_ocr/document_ocr/page_parser.py:515-531) and avoids
  materializing the nested block column between stages. The actor holds warm
  parser state (config, the PDF parser's compiled regexes) — the
  ActorPoolStrategy analog of the reference's models-loaded-once engines
  (page_parser.py:457-483).

* **staged**: six composable ``map_batches`` stages passing a nested Arrow
  ``blocks`` column (list<struct>) between them — the declarative,
  registry-assembled form mirroring the reference's config-driven
  ``LAYOUT_PARSER_1..9`` chain (page_parser.py:473-477). Used for
  checkpointing intermediate state to Parquet (PAGE-XML round-trip analog)
  and for proving stage composability; slower than fused due to nested
  serialization per hop.
"""

from __future__ import annotations

import pyarrow as pa

from pero_ocr_ray.kernels.config import ExtractConfig
from pero_ocr_ray.kernels.decode import decode_payload, payload_kind
from pero_ocr_ray.kernels.emit import (
    assemble, extract_document, segment_blocks,
)
from pero_ocr_ray.kernels.htmlparse import parse_html
from pero_ocr_ray.kernels.order import reading_order
from pero_ocr_ray.kernels.pdfmini import pdf_blocks
from pero_ocr_ray.kernels.score import classify_blocks
from pero_ocr_ray.oracle import rows_to_output_table

# ---------------------------------------------------------------------------
# fused stage (default)
# ---------------------------------------------------------------------------


class ParseExtractStage:
    """Actor-pool stage: full per-row extraction chain, Arrow in / Arrow out."""

    def __init__(self, cfg: dict | None = None):
        self.cfg = ExtractConfig(**cfg) if cfg else ExtractConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        names = batch.column_names
        langs = batch.column("lang").to_pylist() if "lang" in names else [""] * len(urls)
        tss = batch.column("warc_ts").to_pylist() if "warc_ts" in names else [None] * len(urls)
        rids = (batch.column("row_id").to_pylist() if "row_id" in names
                else [-1] * len(urls))
        rows = []
        for url, raw, lang, ts, rid in zip(urls, htmls, langs, tss, rids):
            out = extract_document(url, raw, self.cfg)
            out["lang"] = lang
            out["warc_ts"] = ts
            out["row_id"] = rid
            rows.append(out)
        return rows_to_output_table(rows)


# ---------------------------------------------------------------------------
# staged decomposition: nested blocks column between stages
# ---------------------------------------------------------------------------

PIECE_TYPE = pa.struct([("text", pa.string()), ("src_start", pa.int64())])
LINE_TYPE = pa.struct([("text", pa.string()), ("src_start", pa.int64()),
                       ("src_end", pa.int64())])
BLOCK_TYPE = pa.list_(pa.struct([
    ("block_id", pa.string()), ("kind", pa.string()), ("tag_path", pa.string()),
    ("dom_idx", pa.int32()), ("depth", pa.int32()),
    ("raw_len", pa.int64()), ("link_chars", pa.int64()),
    ("boiler", pa.bool_()), ("pre", pa.bool_()),
    ("col_group", pa.int64()), ("col_ord", pa.int32()),
    ("src_start", pa.int64()), ("src_end", pa.int64()),
    ("pieces", pa.list_(PIECE_TYPE)),
    ("lines", pa.list_(LINE_TYPE)),
    ("n_chars", pa.int64()), ("score", pa.float64()),
    ("keep", pa.bool_()), ("order", pa.int32()),
]))


def _blocks_to_arrow(all_blocks: list[list[dict]]) -> pa.Array:
    py = []
    for blocks in all_blocks:
        out = []
        for b in blocks:
            d = {k: b.get(k) for k in (
                "block_id", "kind", "tag_path", "dom_idx", "depth", "raw_len",
                "link_chars", "boiler", "pre", "col_group", "col_ord",
                "src_start", "src_end", "n_chars", "score", "keep", "order")}
            d["pieces"] = [{"text": t, "src_start": s} for t, s in b["pieces"]]
            lines = b.get("lines")
            d["lines"] = (None if lines is None else
                          [{"text": t, "src_start": s0, "src_end": s1}
                           for t, s0, s1 in lines])
            out.append(d)
        py.append(out)
    return pa.array(py, BLOCK_TYPE)


def _blocks_from_arrow(col: pa.ChunkedArray | pa.Array) -> list[list[dict]]:
    result = []
    for doc in col.to_pylist():
        blocks = []
        for d in doc:
            b = dict(d)
            b["pieces"] = [(p["text"], p["src_start"]) for p in d["pieces"]]
            if d.get("lines") is not None:
                b["lines"] = [(ln["text"], ln["src_start"], ln["src_end"])
                              for ln in d["lines"]]
            else:
                b.pop("lines", None)
            blocks.append(b)
        result.append(blocks)
    return result


def _passthrough(batch: pa.Table) -> dict[str, pa.Array | pa.ChunkedArray]:
    keep = {}
    for name in ("url", "warc_ts", "lang", "row_id"):
        if name in batch.column_names:
            keep[name] = batch.column(name)
    return keep


def decode_stage(batch: pa.Table, cfg: ExtractConfig) -> pa.Table:
    """html:binary -> payload_kind/html_text/encoding/error (M13 analog)."""
    kinds, texts, encs, errs = [], [], [], []
    for raw in batch.column("html").to_pylist():
        kind = payload_kind(raw)
        if kind == "pdf":
            kinds.append(kind); texts.append(""); encs.append("binary"); errs.append("")
        else:
            text, enc, err = decode_payload(raw, cfg)
            kinds.append(kind); texts.append(text); encs.append(enc); errs.append(err)
    cols = _passthrough(batch)
    cols["html"] = batch.column("html")  # pdf route still needs raw bytes
    cols.update(payload_kind_col=pa.array(kinds, pa.string()),
                html_text=pa.array(texts, pa.string()),
                encoding=pa.array(encs, pa.string()),
                error=pa.array(errs, pa.string()))
    return pa.table(cols)


def parse_stage(batch: pa.Table, cfg: ExtractConfig) -> pa.Table:
    """DOM/PDF parse -> nested blocks column; DROPS the raw payload columns
    so downstream blocks carry structure only (SURVEY §7.5 wide-row rule)."""
    all_blocks, errs = [], []
    for kind, text, raw, err in zip(batch.column("payload_kind_col").to_pylist(),
                                    batch.column("html_text").to_pylist(),
                                    batch.column("html").to_pylist(),
                                    batch.column("error").to_pylist()):
        if kind == "pdf":
            if raw is not None and len(raw) > cfg.max_payload_bytes:
                blocks, perr = [], "payload_too_large"  # emit.py guard mirror
            else:
                blocks, perr = pdf_blocks(raw)
            errs.append((err + ";" if err and perr else err) + (perr or ""))
        else:
            try:
                blocks = parse_html(text)
            except Exception:
                blocks = []
                err = (err + ";" if err else "") + "html_parse_error"
            errs.append(err)
        all_blocks.append(blocks)
    cols = _passthrough(batch)
    cols.update(payload_kind=batch.column("payload_kind_col"),
                encoding=batch.column("encoding"),
                error=pa.array(errs, pa.string()),
                blocks=_blocks_to_arrow(all_blocks))
    return pa.table(cols)


def segment_stage(batch: pa.Table, cfg: ExtractConfig) -> pa.Table:
    docs = _blocks_from_arrow(batch.column("blocks"))
    for blocks in docs:
        segment_blocks(blocks)
    return batch.set_column(batch.column_names.index("blocks"), "blocks",
                            _blocks_to_arrow(docs))


class ClassifyStage:
    """Actor-pool block classifier (ParseNet analog, warm config state)."""

    def __init__(self, cfg: dict | None = None):
        self.cfg = ExtractConfig(**cfg) if cfg else ExtractConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = _blocks_from_arrow(batch.column("blocks"))
        for blocks in docs:
            classify_blocks(blocks, self.cfg)
        return batch.set_column(batch.column_names.index("blocks"), "blocks",
                                _blocks_to_arrow(docs))


# ---------------------------------------------------------------------------
# projections over extraction output
# ---------------------------------------------------------------------------


def explode_lines(ds):
    """Flat per-line table (W5/M4 analog): one row per emitted line with its
    text recovered from extracted_text via the ext_* span offsets."""
    def fn(t: pa.Table) -> pa.Table:
        urls, bids, lids, cs, ce, texts = [], [], [], [], [], []
        for url, ext, spans in zip(t.column("url").to_pylist(),
                                   t.column("extracted_text").to_pylist(),
                                   t.column("spans").to_pylist()):
            for s in spans:
                urls.append(url)
                bids.append(s["block_id"])
                lids.append(s["line_id"])
                cs.append(s["char_start"])
                ce.append(s["char_end"])
                texts.append(ext[s["ext_start"]:s["ext_end"]])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "block_id": pa.array(bids, pa.string()),
            "line_id": pa.array(lids, pa.string()),
            "char_start": pa.array(cs, pa.int64()),
            "char_end": pa.array(ce, pa.int64()),
            "line_text": pa.array(texts, pa.string()),
        })
    return ds.map_batches(fn, batch_format="pyarrow")


def render_debug_html(ds):
    """Debug dump (W4 rendered-overlay analog): one self-contained HTML
    string per doc showing kept blocks in reading order with metrics."""
    def fn(t: pa.Table) -> pa.Table:
        out = []
        for url, ext, m in zip(t.column("url").to_pylist(),
                               t.column("extracted_text").to_pylist(),
                               t.column("metrics").to_pylist()):
            import html as h
            body = "".join(f"<p>{h.escape(p)}</p>"
                           for p in ext.split("\n\n") if p)
            out.append(
                f"<html><body><h1>{h.escape(url)}</h1>"
                f"<p>kept {m['blocks_kept']}/{m['blocks_total']} blocks, "
                f"{m['chars_emitted']} chars</p>{body}</body></html>")
        return pa.table({"url": t.column("url"),
                         "debug_html": pa.array(out, pa.string())})
    return ds.map_batches(fn, batch_format="pyarrow")


def order_stage(batch: pa.Table, cfg: ExtractConfig) -> pa.Table:
    docs = _blocks_from_arrow(batch.column("blocks"))
    for blocks in docs:
        kept = [b for b in blocks if b.get("keep")]
        reading_order(kept)
    return batch.set_column(batch.column_names.index("blocks"), "blocks",
                            _blocks_to_arrow(docs))


def emit_stage(batch: pa.Table, cfg: ExtractConfig) -> pa.Table:
    docs = _blocks_from_arrow(batch.column("blocks"))
    names = batch.column_names
    n = batch.num_rows
    rows = []
    for i, blocks in enumerate(docs):
        text, spans = assemble(blocks)
        kept = sum(1 for b in blocks if b.get("keep"))
        rows.append({
            "url": batch.column("url")[i].as_py(),
            "row_id": batch.column("row_id")[i].as_py() if "row_id" in names else -1,
            "warc_ts": batch.column("warc_ts")[i].as_py() if "warc_ts" in names else None,
            "lang": batch.column("lang")[i].as_py() if "lang" in names else "",
            "extracted_text": text,
            "spans": spans,
            "metrics": {
                "blocks_total": len(blocks),
                "blocks_kept": kept,
                "blocks_dropped": len(blocks) - kept,
                "chars_emitted": len(text),
            },
            "payload_kind": batch.column("payload_kind")[i].as_py(),
            "encoding": batch.column("encoding")[i].as_py(),
            "error": batch.column("error")[i].as_py(),
        })
    assert len(rows) == n
    return rows_to_output_table(rows)
