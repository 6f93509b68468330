"""Minimal pure-Python PDF text extraction kernel.

PDF payloads routed through the parse stage (the north-star's pdfminer-analog
path; reference analog: the heavy per-page OCR engine behind actor state,
/root/reference/pero_ocr/document_ocr/page_parser.py:406-434) are handled by
this deterministic, stdlib-only extractor:

  * scans content streams (``stream``/``endstream``), inflating
    ``/FlateDecode`` streams with zlib;
  * interprets the text-object subset of the content syntax: ``BT``/``ET``
    text objects, ``Tj``/``TJ``/``'``/``"`` show operators, ``Td``/``TD``/
    ``T*`` line moves, with PDF string escapes and hex strings;
  * bytes decode via latin-1 (PDFDocEncoding superset for the ASCII range).

Limitations (documented, deterministic): no font/ToUnicode CMaps, no
cross-reference validation, no encryption — adequate for synthetic and
simple real-world PDFs; anything unparseable yields zero blocks plus an
error marker, preserving skip-and-continue semantics
(/root/reference/user_scripts/parse_folder.py:213-216).

Each ``BT``..``ET`` text object becomes one candidate block shaped exactly
like an HTML block (htmlparse schema), with source offsets into the *shown
text stream* (concatenation of all shown strings in document order).
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")

_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _decode_pdf_string(body: bytes) -> str:
    """Decode the inside of a (...) literal string, handling escapes."""
    out: list[str] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i:i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = body[i + 1:i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, n) and body[j:j + 1].isdigit():
                    j += 1
                out.append(chr(int(body[i + 1:j], 8) & 0xFF))
                i = j
                continue
            if nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and body[i:i + 1] == b"\n":
                    i += 1
                continue
            i += 1
            continue
        out.append(c.decode("latin-1"))
        i += 1
    return "".join(out)


def _iter_strings(segment: bytes):
    """Yield (kind, text) for literal/hex strings and operators in a content
    segment. kind: 'str' for shown strings candidates, 'op' for bare tokens."""
    i, n = 0, len(segment)
    while i < n:
        c = segment[i:i + 1]
        if c == b"(":
            depth = 1
            j = i + 1
            start = j
            while j < n and depth > 0:
                cj = segment[j:j + 1]
                if cj == b"\\":
                    j += 2
                    continue
                if cj == b"(":
                    depth += 1
                elif cj == b")":
                    depth -= 1
                j += 1
            yield "str", _decode_pdf_string(segment[start:j - 1])
            i = j
        elif c == b"<" and segment[i + 1:i + 2] != b"<":
            j = segment.find(b">", i + 1)
            if j < 0:
                break
            hexbody = re.sub(rb"\s", b"", segment[i + 1:j])
            if len(hexbody) % 2:
                hexbody += b"0"
            try:
                yield "str", bytes.fromhex(hexbody.decode("ascii")).decode("latin-1")
            except ValueError:
                pass
            i = j + 1
        elif c == b"<":
            i += 2
        elif re.match(rb"[A-Za-z'\"*]", c):
            m = re.match(rb"[A-Za-z'\"*]+", segment[i:])
            yield "op", m.group(0).decode("latin-1")
            i += len(m.group(0))
        else:
            i += 1


def _content_streams(raw: bytes) -> list[bytes]:
    streams: list[bytes] = []
    pos = 0
    while True:
        m = _STREAM_RE.search(raw, pos)
        if m is None:
            break
        end = raw.find(b"endstream", m.end())
        if end < 0:
            break
        body = raw[m.end():end]
        if body.endswith(b"\r\n"):
            body = body[:-2]
        elif body.endswith(b"\n"):
            body = body[:-1]
        # the stream dict sits just before 'stream'
        dict_start = raw.rfind(b"<<", max(0, m.start() - 600), m.start())
        head = raw[dict_start if dict_start >= 0 else max(0, m.start() - 600):m.start()]
        if _FLATE_RE.search(head):
            try:
                body = zlib.decompress(body)
            except zlib.error:
                pos = end + 9
                continue
        streams.append(body)
        pos = end + 9
    return streams


def pdf_blocks(raw: bytes) -> tuple[list[dict], str]:
    """PDF bytes -> (candidate blocks in htmlparse schema, error string)."""
    try:
        streams = _content_streams(raw)
    except Exception:
        return [], "pdf_parse_error"
    blocks: list[dict] = []
    src_pos = 0
    for body in streams:
        for tobj in re.split(rb"\bBT\b", body)[1:]:
            tobj = tobj.split(b"ET")[0]
            pieces: list[tuple[str, int]] = []
            raw_len = 0
            pending: list[str] = []  # strings seen since last operator
            for kind, tok in _iter_strings(tobj):
                if kind == "str":
                    pending.append(tok)
                    continue
                if tok in ("Tj",) and pending:
                    text = pending[-1]
                    pieces.append((text, src_pos))
                    src_pos += len(text)
                    raw_len += len(text)
                elif tok == "TJ" and pending:
                    text = "".join(pending)
                    pieces.append((text, src_pos))
                    src_pos += len(text)
                    raw_len += len(text)
                elif tok in ("'", '"') and pending:
                    pieces.append(("\n", -1))
                    text = pending[-1]
                    pieces.append((text, src_pos))
                    src_pos += len(text)
                    raw_len += len(text)
                elif tok in ("Td", "TD", "T*", "Tm") and pieces:
                    pieces.append(("\n", -1))
                pending = []
            if not pieces:
                continue
            dom_idx = len(blocks)
            starts = [s for _, s in pieces if s >= 0]
            src_end = -1
            for text, s in reversed(pieces):
                if s >= 0:
                    src_end = s + len(text)
                    break
            blocks.append({
                "kind": "pdf_text",
                "tag_path": "pdf",
                "depth": 1,
                "pieces": pieces,
                "link_chars": 0,
                "raw_len": raw_len,
                "boiler": False,
                "pre": False,
                "col_group": -1,
                "col_ord": -1,
                "block_id": f"b{dom_idx:04d}",
                "dom_idx": dom_idx,
                "src_start": starts[0] if starts else -1,
                "src_end": src_end,
            })
    err = "" if blocks or not raw else ("pdf_no_text" if streams else "pdf_parse_error")
    return blocks, err
