"""Searchable-PDF sink (W8): extracted text -> valid single/multi-page PDF.

The reference renders searchable PDFs through pdflatex
(/root/reference/pero_ocr/document_ocr/pdf_production.py:13-170 — page
image + invisible text layer). pdflatex doesn't exist in this engine's
world, so the sink writes the PDF directly with the stdlib: one text
object per line, Flate-compressed content streams, a correct xref table,
and optional invisible text (``Tr 3`` rendering mode — the searchable
layer the reference overlays on page images).

Honest limitation: the text layer uses the standard 14 Helvetica font
(no embedding), so the byte payload is latin-1; unmappable characters
degrade to ``?`` in the PDF *render* while extraction output stays
untouched upstream. Round-trip: ``kernels/pdfmini.pdf_blocks`` reads the
produced PDFs back (tested), so the sink and the PDF source close a loop.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

PAGE_W, PAGE_H = 595, 842          # A4 points
MARGIN, LEADING, FONT_SIZE = 50, 12, 10
LINES_PER_PAGE = (PAGE_H - 2 * MARGIN) // LEADING
WRAP_COLS = 90


def _escape(line: str) -> bytes:
    raw = line.encode("latin-1", "replace")
    return raw.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")


def _wrap(text: str) -> list[str]:
    out = []
    for line in text.split("\n"):
        if not line:
            out.append("")
            continue
        while len(line) > WRAP_COLS:
            cut = line.rfind(" ", 1, WRAP_COLS + 1)
            if cut < 1:
                cut = WRAP_COLS
            out.append(line[:cut])
            line = line[cut:].lstrip(" ")
        out.append(line)
    return out


def text_to_pdf(text: str, invisible: bool = False,
                compress: bool = True) -> bytes:
    """Text -> complete PDF bytes (multi-page, valid xref + trailer).

    ``invisible`` sets text rendering mode 3 — the searchable-layer mode
    the reference's pdf_production uses over page images."""
    lines = _wrap(text)
    pages = [lines[i:i + LINES_PER_PAGE]
             for i in range(0, max(1, len(lines)), LINES_PER_PAGE)] or [[]]

    objects: list[bytes] = []  # 1-indexed object bodies

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font_id = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids, content_ids = [], []
    for page_lines in pages:
        ops = [b"BT", b"/F1 %d Tf" % FONT_SIZE, b"%d TL" % LEADING,
               b"%d %d Td" % (MARGIN, PAGE_H - MARGIN)]
        if invisible:
            ops.append(b"3 Tr")
        for line in page_lines:
            ops.append(b"(" + _escape(line) + b") Tj")
            ops.append(b"T*")
        ops.append(b"ET")
        content = b"\n".join(ops)
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b"/Filter /FlateDecode "
        content_ids.append(add(
            b"<< " + filt + b"/Length %d >>\nstream\n" % len(content)
            + content + b"\nendstream"))

    pages_id = len(objects) + len(pages) + 1  # after the page objects
    for cid in content_ids:
        page_ids.append(add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (pages_id, PAGE_W, PAGE_H, font_id, cid)))
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    real_pages_id = add(b"<< /Type /Pages /Kids [" + kids
                        + b"] /Count %d >>" % len(page_ids))
    assert real_pages_id == pages_id
    catalog_id = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)

    # serialize with a correct xref table
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, catalog_id, xref_at))
    return bytes(out)


def searchable_pdf(ds, text_column: str = "extracted_text",
                   invisible: bool = False):
    """Extraction output -> (url, pdf:binary) Dataset."""
    def fn(t: pa.Table) -> pa.Table:
        pdfs = [text_to_pdf(x or "", invisible=invisible)
                for x in t.column(text_column).to_pylist()]
        return pa.table({"url": t.column("url"),
                         "pdf": pa.array(pdfs, pa.binary())})
    return ds.map_batches(fn, batch_format="pyarrow")


def write_pdf_files(ds, out_dir: str):
    """One .pdf file per row named md5(url) (atomic rename); returns the
    (url, path) manifest Dataset — the per-page file sink shape."""
    import hashlib
    import os
    os.makedirs(out_dir, exist_ok=True)

    def write(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        paths = []
        for url, pdf in zip(urls, batch.column("pdf").to_pylist()):
            path = os.path.join(
                out_dir, hashlib.md5(url.encode()).hexdigest() + ".pdf")
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(pdf)
            os.replace(tmp, path)
            paths.append(path)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "path": pa.array(paths, pa.string())})

    return ds.map_batches(write, batch_format="pyarrow")
