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


def _image_xobject(page_image: bytes) -> tuple[bytes, int, int] | None:
    """FAKEIMG payload -> (Flate-compressed Image XObject body, w, h), or
    None when the payload isn't decodable (real codecs are the documented
    injection seam in stages/multimodal)."""
    try:
        from pero_ocr_ray.stages.multimodal import _decode_image
        img = _decode_image(page_image)
    except Exception:
        return None
    h, w, c = img.shape
    if c == 3:
        cs, data = b"/DeviceRGB", img.tobytes()
    else:
        cs, data = b"/DeviceGray", img[:, :, 0].tobytes()
    stream = zlib.compress(data)
    body = (b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace %s /BitsPerComponent 8 /Filter /FlateDecode "
            b"/Length %d >>\nstream\n" % (w, h, cs, len(stream))
            + stream + b"\nendstream")
    return body, w, h


def text_to_pdf(text: str, invisible: bool = False,
                compress: bool = True,
                page_image: bytes | None = None) -> bytes:
    """Text -> complete PDF bytes (multi-page, valid xref + trailer).

    ``invisible`` sets text rendering mode 3 — the searchable-layer mode
    the reference's pdf_production uses over page images.

    ``page_image`` closes the two-layer delta to the reference
    (/root/reference/pero_ocr/document_ocr/pdf_production.py:64-100, which
    places the page image with the invisible text layer on top): a
    decodable payload is embedded as a real Image XObject scaled to the
    first page's MediaBox and drawn BEFORE the text, so the text layer
    sits above it. Undecodable payloads degrade to text-only (skip-and-
    continue)."""
    lines = _wrap(text)
    pages = [lines[i:i + LINES_PER_PAGE]
             for i in range(0, max(1, len(lines)), LINES_PER_PAGE)] or [[]]

    objects: list[bytes] = []  # 1-indexed object bodies

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font_id = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    img_id = None
    if page_image is not None:
        xobj = _image_xobject(page_image)
        if xobj is not None:
            img_id = add(xobj[0])
    page_ids, content_ids = [], []
    for pg_no, page_lines in enumerate(pages):
        ops = []
        if img_id is not None and pg_no == 0:
            # image layer first: the text ops below paint on top of it
            ops += [b"q", b"%d 0 0 %d 0 0 cm" % (PAGE_W, PAGE_H),
                    b"/Im1 Do", b"Q"]
        ops += [b"BT", b"/F1 %d Tf" % FONT_SIZE, b"%d TL" % LEADING,
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
    for pg_no, cid in enumerate(content_ids):
        res = b"<< /Font << /F1 %d 0 R >> >>" % font_id
        if img_id is not None and pg_no == 0:
            res = (b"<< /Font << /F1 %d 0 R >> "
                   b"/XObject << /Im1 %d 0 R >> >>" % (font_id, img_id))
        page_ids.append(add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d] "
            b"/Resources %s /Contents %d 0 R >>"
            % (pages_id, PAGE_W, PAGE_H, res, cid)))
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
                   invisible: bool = False,
                   image_column: str | None = None,
                   compress: bool = True):
    """Extraction output -> (url, pdf:binary) Dataset.

    With ``image_column``, rows carrying a decodable page-image payload get
    the two-layer reference form — page image with INVISIBLE text on top
    (pdf_production.py:64-100) — while imageless rows keep the plain
    visible-text rendering."""
    def fn(t: pa.Table) -> pa.Table:
        imgs = (t.column(image_column).to_pylist()
                if image_column and image_column in t.column_names
                else [None] * t.num_rows)
        # cheap magic-byte probe decides the text mode (a truncated payload
        # then degrades to invisible text without an image — still valid)
        from pero_ocr_ray.stages.multimodal import IMG_MAGIC
        pdfs = [text_to_pdf(x or "", page_image=img, compress=compress,
                            invisible=invisible or (
                                img is not None and img[:7] == IMG_MAGIC))
                for x, img in zip(t.column(text_column).to_pylist(), imgs)]
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
