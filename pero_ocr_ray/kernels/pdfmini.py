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

Font handling: fonts referenced by ``Tf`` are resolved through the file's
``/Font`` resource dicts; a font's ``/ToUnicode`` CMap (``beginbfchar`` /
``beginbfrange``, 1- or 2-byte codes per ``begincodespacerange``) maps shown
bytes to Unicode — so CID/Type0 PDFs extract real text — and a simple-font
``/Encoding << /Differences [...] >>`` array remaps byte codes through a
glyph-name table (AGL subset + ``uniXXXX``). Fonts with neither fall back
to latin-1 (PDFDocEncoding superset for the ASCII range).

Limitations (documented, deterministic): no xref/object-stream indirection
(objects are scanned linearly), no encryption — adequate for synthetic and
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


def _unescape_pdf_string(body: bytes) -> bytes:
    """Unescape the inside of a (...) literal string to raw bytes (font
    decoding happens afterwards — codes may be multi-byte)."""
    out = bytearray()
    i, n = 0, len(body)
    while i < n:
        c = body[i:i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = body[i + 1:i + 2]
            if nxt in _ESCAPES:
                out.extend(_ESCAPES[nxt].encode("latin-1"))
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, n) and body[j:j + 1].isdigit():
                    j += 1
                out.append(int(body[i + 1:j], 8) & 0xFF)
                i = j
                continue
            if nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and body[i:i + 1] == b"\n":
                    i += 1
                continue
            i += 1
            continue
        out.extend(c)
        i += 1
    return bytes(out)


def _iter_strings(segment: bytes):
    """Yield (kind, payload) for tokens in a content segment: 'str' = raw
    string bytes (literal or hex), 'name' = /Name token (font selection),
    'op' = bare operator token."""
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
            yield "str", _unescape_pdf_string(segment[start:j - 1])
            i = j
        elif c == b"<" and segment[i + 1:i + 2] != b"<":
            j = segment.find(b">", i + 1)
            if j < 0:
                break
            hexbody = re.sub(rb"\s", b"", segment[i + 1:j])
            if len(hexbody) % 2:
                hexbody += b"0"
            try:
                yield "str", bytes.fromhex(hexbody.decode("ascii"))
            except ValueError:
                pass
            i = j + 1
        elif c == b"<":
            i += 2
        elif c == b"/":
            m = re.match(rb"/([A-Za-z0-9_.+-]*)", segment[i:])
            yield "name", m.group(1).decode("latin-1")
            i += len(m.group(0))
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


# ---------------------------------------------------------------------------
# fonts: ToUnicode CMaps and /Differences encodings
# ---------------------------------------------------------------------------

# AGL subset: glyph names used by standard simple-font /Differences arrays
_GLYPH_NAMES = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "eacute": "é", "egrave": "è", "agrave": "à",
    "ccedilla": "ç", "adieresis": "ä", "odieresis": "ö",
    "udieresis": "ü", "uacute": "ú", "iacute": "í",
    "oacute": "ó", "ntilde": "ñ", "germandbls": "ß",
    "ecircumflex": "ê", "acircumflex": "â", "aring": "å",
}


def _glyph_to_unicode(name: str) -> str:
    if len(name) == 1 and name.isalnum():
        return name
    if name in _GLYPH_NAMES:
        return _GLYPH_NAMES[name]
    if re.fullmatch(r"uni[0-9A-Fa-f]{4}", name):
        return chr(int(name[3:], 16))
    return "�"


class _Font:
    """Decoder for one PDF font: ToUnicode CMap (1/2-byte codes) or a
    /Differences byte remap; plain latin-1 otherwise."""

    __slots__ = ("cmap", "code_bytes", "differences")

    def __init__(self, cmap: dict[int, str] | None = None,
                 code_bytes: int = 1,
                 differences: dict[int, str] | None = None):
        self.cmap = cmap
        self.code_bytes = code_bytes
        self.differences = differences

    def decode(self, data: bytes) -> str:
        if self.cmap is not None:
            w = self.code_bytes
            out = []
            for i in range(0, len(data) - (len(data) % w), w):
                code = int.from_bytes(data[i:i + w], "big")
                mapped = self.cmap.get(code)
                if mapped is None:
                    mapped = chr(code) if code < 256 else "�"
                out.append(mapped)
            return "".join(out)
        if self.differences is not None:
            return "".join(self.differences.get(byte, chr(byte))
                           for byte in data)
        return data.decode("latin-1")


DEFAULT_FONT = _Font()

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_TOUNI_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_FONTRES_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_FONTREF_RE = re.compile(rb"/([A-Za-z0-9_.+-]+)\s+(\d+)\s+\d+\s+R")
_DIFF_RE = re.compile(rb"/Differences\s*\[(.*?)\]", re.DOTALL)
_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")


def _obj_stream(body: bytes) -> bytes | None:
    m = _STREAM_RE.search(body)
    if m is None:
        return None
    end = body.find(b"endstream", m.end())
    data = body[m.end():end if end >= 0 else None]
    if _FLATE_RE.search(body[:m.start()]):
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return None
    return data


def _utf16be(hexs: bytes) -> str:
    b = bytes.fromhex(hexs.decode("ascii"))
    if len(b) % 2:
        b += b"\x00"
    return b.decode("utf-16-be", "replace")


def _parse_cmap(data: bytes) -> tuple[dict[int, str], int]:
    """ToUnicode CMap stream -> (code -> unicode map, code byte width)."""
    cmap: dict[int, str] = {}
    width = 1
    m = re.search(rb"begincodespacerange(.*?)endcodespacerange", data,
                  re.DOTALL)
    if m:
        first = _HEXPAIR_RE.search(m.group(1))
        if first:
            width = max(1, len(re.sub(rb"\s", b"", first.group(1))) // 2)
    for sec in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.DOTALL):
        pairs = _HEXPAIR_RE.findall(sec.group(1))
        for src, dst in zip(pairs[0::2], pairs[1::2]):
            src_clean = re.sub(rb"\s", b"", src)
            width = max(width, len(src_clean) // 2)
            cmap[int(src_clean, 16)] = _utf16be(re.sub(rb"\s", b"", dst))
    for sec in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.DOTALL):
        body = sec.group(1)
        # <lo> <hi> [ <d0> <d1> ... ]  |  <lo> <hi> <dstStart>
        pos = 0
        while True:
            mm = re.search(
                rb"<([0-9A-Fa-f\s]*)>\s*<([0-9A-Fa-f\s]*)>\s*"
                rb"(\[(?:\s*<[0-9A-Fa-f\s]*>)*\s*\]|<[0-9A-Fa-f\s]*>)",
                body[pos:], re.DOTALL)
            if mm is None:
                break
            lo = int(re.sub(rb"\s", b"", mm.group(1)), 16)
            hi = int(re.sub(rb"\s", b"", mm.group(2)), 16)
            width = max(width, len(re.sub(rb"\s", b"", mm.group(1))) // 2)
            dst = mm.group(3)
            if dst.startswith(b"["):
                dsts = _HEXPAIR_RE.findall(dst)
                for k, d in enumerate(dsts):
                    if lo + k <= hi:
                        cmap[lo + k] = _utf16be(re.sub(rb"\s", b"", d))
            else:
                start_hex = re.sub(rb"\s", b"", dst[1:-1])
                base = _utf16be(start_hex)
                for k in range(hi - lo + 1):
                    if base:
                        cmap[lo + k] = base[:-1] + chr(ord(base[-1]) + k)
            pos += mm.end()
    return cmap, width


def _parse_differences(body: bytes) -> dict[int, str]:
    out: dict[int, str] = {}
    code = 0
    for tok in re.finditer(rb"(\d+)|/([A-Za-z0-9_.]+)", body):
        if tok.group(1) is not None:
            code = int(tok.group(1))
        else:
            out[code] = _glyph_to_unicode(tok.group(2).decode("latin-1"))
            code += 1
    return out


def parse_fonts(raw: bytes) -> dict[str, _Font]:
    """Scan objects, resolve /Font resource names -> font decoders.

    Resource names from every /Font dict in the file are merged (no xref
    chasing — documented limitation; names are effectively global in the
    PDFs this kernel targets)."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(raw):
        objs[int(m.group(1))] = m.group(2)

    fonts: dict[str, _Font] = {}
    for section in _FONTRES_RE.finditer(raw):
        for name_m in _FONTREF_RE.finditer(section.group(1)):
            name = name_m.group(1).decode("latin-1")
            obj_num = int(name_m.group(2))
            body = objs.get(obj_num)
            if body is None:
                continue
            touni = _TOUNI_RE.search(body)
            if touni is not None:
                target = objs.get(int(touni.group(1)))
                stream = _obj_stream(target) if target is not None else None
                if stream is not None:
                    cmap, width = _parse_cmap(stream)
                    fonts[name] = _Font(cmap=cmap, code_bytes=width)
                    continue
            diff = _DIFF_RE.search(body)
            if diff is None:
                # /Encoding may be an indirect object
                enc = re.search(rb"/Encoding\s+(\d+)\s+\d+\s+R", body)
                if enc is not None:
                    enc_body = objs.get(int(enc.group(1)))
                    if enc_body is not None:
                        diff = _DIFF_RE.search(enc_body)
            if diff is not None:
                fonts[name] = _Font(
                    differences=_parse_differences(diff.group(1)))
    return fonts


def pdf_blocks(raw: bytes) -> tuple[list[dict], str]:
    """PDF bytes -> (candidate blocks in htmlparse schema, error string)."""
    try:
        streams = _content_streams(raw)
        fonts = parse_fonts(raw)
    except Exception:
        return [], "pdf_parse_error"
    blocks: list[dict] = []
    src_pos = 0
    cur_font = DEFAULT_FONT  # font state persists across text objects
    for body in streams:
        for tobj in re.split(rb"\bBT\b", body)[1:]:
            tobj = tobj.split(b"ET")[0]
            pieces: list[tuple[str, int]] = []
            raw_len = 0
            pending: list[bytes] = []  # raw strings since last operator
            last_name = None
            for kind, tok in _iter_strings(tobj):
                if kind == "str":
                    pending.append(tok)
                    continue
                if kind == "name":
                    last_name = tok
                    continue
                if tok == "Tf" and last_name is not None:
                    cur_font = fonts.get(last_name, DEFAULT_FONT)
                    last_name = None
                elif tok in ("Tj",) and pending:
                    text = cur_font.decode(pending[-1])
                    pieces.append((text, src_pos))
                    src_pos += len(text)
                    raw_len += len(text)
                elif tok == "TJ" and pending:
                    text = "".join(cur_font.decode(p) for p in pending)
                    pieces.append((text, src_pos))
                    src_pos += len(text)
                    raw_len += len(text)
                elif tok in ("'", '"') and pending:
                    pieces.append(("\n", -1))
                    text = cur_font.decode(pending[-1])
                    pieces.append((text, src_pos))
                    src_pos += len(text)
                    raw_len += len(text)
                elif tok in ("Td", "TD", "T*", "Tm") and pieces:
                    pieces.append(("\n", -1))
                pending = []
                # a /Name not consumed by the op that followed it is stale:
                # a later nameless Tf must fall back to the current font,
                # never bind a leftover name from an unrelated operator
                last_name = None
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
