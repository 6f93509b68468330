"""Per-document extraction chain: raw payload -> extracted_text + spans.

The composition analog of the reference's ``PageParser.process_page`` chain
(/root/reference/pero_ocr/document_ocr/page_parser.py:515-531): parse ->
classify -> segment -> order -> emit, as pure functions over one document.
Both the sequential oracle and every Ray stage call these same functions, so
the pipeline's output is byte-identical to the oracle's by construction.

Output text assembly (the byte-identical artifact): kept blocks in reading
order, lines joined with ``\\n`` inside a block, ``\\n\\n`` between blocks.
Spans carry source offsets per emitted line (logit_coords analog,
/root/reference/pero_ocr/core/layout.py:50).
"""

from __future__ import annotations

from pero_ocr_ray.kernels.config import ExtractConfig, DEFAULT_CONFIG
from pero_ocr_ray.kernels.decode import decode_payload, payload_kind
from pero_ocr_ray.kernels.htmlparse import parse_html
from pero_ocr_ray.kernels.order import reading_order
from pero_ocr_ray.kernels.pdfmini import pdf_blocks
from pero_ocr_ray.kernels.score import classify_blocks
from pero_ocr_ray.kernels.segment import segment_block


def parse_payload(raw: bytes, cfg: ExtractConfig = DEFAULT_CONFIG):
    """raw payload -> (blocks, payload_kind, encoding, error)."""
    kind = payload_kind(raw)
    if kind == "pdf":
        if raw is not None and len(raw) > cfg.max_payload_bytes:
            # the skew guard applies to PDFs too — but a PDF cannot be
            # truncated meaningfully (xref at the tail), so an oversized
            # one degrades to an error-flagged empty row instead of
            # pinning a worker on multi-hundred-MB regex scans
            return [], kind, "binary", "payload_too_large"
        blocks, error = pdf_blocks(raw)
        return blocks, kind, "binary", error
    text, encoding, error = decode_payload(raw, cfg)
    try:
        blocks = parse_html(text)
    except Exception:  # skip-and-continue (parse_folder.py:213-216 analog)
        blocks, error = [], (error + ";" if error else "") + "html_parse_error"
    return blocks, kind, encoding, error


def segment_blocks(blocks: list[dict]) -> None:
    """Annotate every block with ``lines`` and canonical ``n_chars`` in place."""
    for b in blocks:
        lines = segment_block(b)
        b["lines"] = lines
        b["n_chars"] = sum(len(t) for t, _, _ in lines) + max(0, len(lines) - 1)


def assemble(blocks: list[dict]) -> tuple[str, list[dict]]:
    """Kept+ordered blocks -> (extracted_text, spans). Blocks must already
    carry ``keep``, ``order`` and ``lines``.

    Span offsets: ``char_start/char_end`` index the visible source stream
    (logit_coords analog); ``ext_start/ext_end`` index ``extracted_text``
    itself (ALTO-style positions in the final artifact, enabling the flat
    per-line projection W5/M4)."""
    kept = sorted((b for b in blocks if b.get("keep")), key=lambda b: b["order"])
    parts: list[str] = []
    spans: list[dict] = []
    pos = 0  # running offset in extracted_text
    for bi, b in enumerate(kept):
        if bi:
            pos += 2  # the '\n\n' block joiner
        line_texts = []
        for j, (text, s0, s1) in enumerate(b["lines"]):
            if j:
                pos += 1  # the '\n' line joiner
            line_texts.append(text)
            spans.append({
                "block_id": b["block_id"],
                "line_id": f"{b['block_id']}l{j:03d}",
                "char_start": s0,
                "char_end": s1,
                "ext_start": pos,
                "ext_end": pos + len(text),
            })
            pos += len(text)
        parts.append("\n".join(line_texts))
    return "\n\n".join(parts), spans


def extract_document(url: str, raw: bytes,
                     cfg: ExtractConfig = DEFAULT_CONFIG) -> dict:
    """Full chain for one document -> output row dict.

    Columns: url, extracted_text, spans, metrics{blocks_total, blocks_kept,
    blocks_dropped, chars_emitted}, payload_kind, encoding, error.

    Any unexpected kernel failure degrades to an empty error-flagged row —
    the reference's skip-and-continue semantics
    (/root/reference/user_scripts/parse_folder.py:213-216): one poison
    document must never kill its batch.
    """
    try:
        blocks, kind, encoding, error = parse_payload(raw, cfg)
        segment_blocks(blocks)
        classify_blocks(blocks, cfg)
        kept = [b for b in blocks if b["keep"]]
        reading_order(kept)
        extracted_text, spans = assemble(blocks)
    except Exception as exc:  # noqa: BLE001 — per-row guard by design
        blocks, kept, spans = [], [], []
        extracted_text = ""
        kind, encoding = "html", ""
        error = f"extract_error:{type(exc).__name__}"
    return {
        "url": url,
        "extracted_text": extracted_text,
        "spans": spans,
        "metrics": {
            "blocks_total": len(blocks),
            "blocks_kept": len(kept),
            "blocks_dropped": len(blocks) - len(kept),
            "chars_emitted": len(extracted_text),
        },
        "payload_kind": kind,
        "encoding": encoding,
        "error": error,
    }
