"""PDF font-decoding tests: ToUnicode CMaps (1/2-byte codes), CID/Type0
hex strings, /Differences encodings, and the latin-1 fallback."""

import zlib

from pero_ocr_ray.kernels.emit import extract_document
from pero_ocr_ray.kernels.pdfmini import (
    _parse_cmap, parse_fonts, pdf_blocks,
)
from pero_ocr_ray.sources.pages import make_pdf


def _assemble(objects: dict[int, bytes], body_of_page: bytes = b"") -> bytes:
    out = [b"%PDF-1.4\n"]
    for num in sorted(objects):
        out.append(b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n")
    out.append(b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    return b"".join(out)


def _stream_obj(head: bytes, data: bytes, compress: bool = False) -> bytes:
    filt = b"/Filter /FlateDecode " if compress else b""
    if compress:
        data = zlib.compress(data)
    return (b"<< " + head + filt + b"/Length %d >>\nstream\n" % len(data)
            + data + b"\nendstream")


def make_cid_pdf(text: str, compress_cmap: bool = False) -> bytes:
    """Type0 font, 2-byte codes 0x0100.., ToUnicode bfchar CMap."""
    chars = sorted(set(text))
    code_of = {c: 0x0100 + i for i, c in enumerate(chars)}
    bfchars = "\n".join(f"<{code_of[c]:04X}> <{ord(c):04X}>" for c in chars)
    cmap = (f"""/CIDInit /ProcSet findresource begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
{len(chars)} beginbfchar
{bfchars}
endbfchar
endcmap
end""").encode()
    hex_codes = "".join(f"{code_of[c]:04X}" for c in text)
    content = f"BT\n/F1 12 Tf\n<{hex_codes}> Tj\nET".encode()
    return _assemble({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"),
        4: _stream_obj(b"", content),
        5: (b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
            b"/ToUnicode 6 0 R >>"),
        6: _stream_obj(b"", cmap, compress=compress_cmap),
    })


def make_bfrange_pdf(text: str) -> bytes:
    """1-byte codes shifted by +1, mapped back via a single bfrange."""
    codes = bytes((ord(c) + 1) & 0xFF for c in text)
    cmap = b"""begincodespacerange
<00> <FF>
endcodespacerange
1 beginbfrange
<21> <7F> <0020>
endbfrange"""
    content = b"BT\n/F1 12 Tf\n(" + codes.replace(b"\\", rb"\\")
    content = (content.replace(b"(", rb"\(").replace(b")", rb"\)")
               .removeprefix(b"BT\n/F1 12 Tf\n(") )
    content = b"BT\n/F1 12 Tf\n(" + content + b") Tj\nET"
    return _assemble({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"),
        4: _stream_obj(b"", content),
        5: b"<< /Type /Font /Subtype /TrueType /ToUnicode 6 0 R >>",
        6: _stream_obj(b"", cmap),
    })


def make_differences_pdf() -> bytes:
    """Simple font remapping codes 65/66/67 -> e-acute, space, 'x'."""
    content = b"BT\n/F1 12 Tf\n(ABCA) Tj\nET"
    return _assemble({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"),
        4: _stream_obj(b"", content),
        5: (b"<< /Type /Font /Subtype /Type1 /Encoding << /Type /Encoding "
            b"/Differences [ 65 /eacute /space /x ] >> >>"),
    })


def test_cid_pdf_extracts_real_text():
    raw = make_cid_pdf("hello cid world")
    blocks, err = pdf_blocks(raw)
    assert err == ""
    assert [t for t, _ in blocks[0]["pieces"]] == ["hello cid world"]


def test_cid_pdf_with_compressed_cmap():
    raw = make_cid_pdf("compressed cmap text", compress_cmap=True)
    blocks, _ = pdf_blocks(raw)
    assert blocks[0]["pieces"][0][0] == "compressed cmap text"


def test_cid_pdf_through_full_extraction():
    text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    out = extract_document("u", make_cid_pdf(text))
    assert out["payload_kind"] == "pdf"
    assert out["extracted_text"] == text
    assert out["error"] == ""


def test_bfrange_shifted_codes():
    text = "Shifted range!"
    blocks, err = pdf_blocks(make_bfrange_pdf(text))
    assert err == ""
    assert blocks[0]["pieces"][0][0] == text


def test_differences_encoding():
    blocks, err = pdf_blocks(make_differences_pdf())
    assert err == ""
    assert blocks[0]["pieces"][0][0] == "é xé"


def test_font_without_mapping_falls_back_latin1():
    """No ToUnicode / no Differences: byte-identical to the old behavior."""
    raw = make_pdf(["plain latin-1 text", "second line"], compress=True)
    blocks, err = pdf_blocks(raw)
    assert err == ""
    texts = [t for t, _ in blocks[0]["pieces"]]
    assert "plain latin-1 text" in texts and "second line" in texts


def test_unknown_code_degrades_not_crashes():
    """Codes missing from the CMap degrade to chr(code)/replacement, the
    skip-and-continue contract."""
    raw = make_cid_pdf("ab")
    # splice in a code the CMap doesn't know (0x0FFF)
    raw = raw.replace(b"> Tj", b"0FFF> Tj")
    blocks, err = pdf_blocks(raw)
    assert err == ""
    assert blocks[0]["pieces"][0][0].startswith("ab")


def test_parse_cmap_widths_and_ranges():
    cmap, width = _parse_cmap(b"""begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0041> <0061>
<0042> <0062>
endbfchar
1 beginbfrange
<0050> <0052> [<0078> <0079> <007A>]
endbfrange""")
    assert width == 2
    assert cmap[0x41] == "a" and cmap[0x42] == "b"
    assert cmap[0x50] == "x" and cmap[0x51] == "y" and cmap[0x52] == "z"


def test_parse_fonts_resolves_resources():
    fonts = parse_fonts(make_cid_pdf("xy"))
    assert "F1" in fonts and fonts["F1"].code_bytes == 2


# ---- searchable-PDF sink (W8) ---------------------------------------------


def test_searchable_pdf_roundtrip():
    """The sink's PDFs read back through the engine's own PDF source."""
    from pero_ocr_ray.sources.searchable_pdf import text_to_pdf
    text = "first paragraph line one\nsecond line\n\nanother block of text"
    pdf = text_to_pdf(text)
    assert pdf.startswith(b"%PDF-1.4") and b"startxref" in pdf
    blocks, err = pdf_blocks(pdf)
    assert err == ""
    joined = "\n".join(t for b in blocks for t, _ in b["pieces"]
                       if t != "\n").replace("\n\n", "\n")
    for want in ("first paragraph line one", "second line",
                 "another block of text"):
        assert want in joined


def test_searchable_pdf_invisible_mode_and_paging():
    from pero_ocr_ray.sources.searchable_pdf import (
        LINES_PER_PAGE, text_to_pdf,
    )
    import zlib as z
    text = "\n".join(f"line {i}" for i in range(LINES_PER_PAGE + 10))
    pdf = text_to_pdf(text, invisible=True, compress=False)
    assert pdf.count(b"/Type /Page ") == 2          # paged
    assert b"3 Tr" in pdf                           # invisible text layer
    blocks, err = pdf_blocks(pdf)
    texts = [t for b in blocks for t, _ in b["pieces"]]
    assert "line 0" in texts and f"line {LINES_PER_PAGE + 9}" in texts


def test_searchable_pdf_two_layer_roundtrip():
    """Two-layer form (pdf_production.py:64-100 analog): page image as a
    real Image XObject under the text layer. Round-trip extracts BOTH
    layers — the text through the engine's PDF source, the image by
    decompressing the XObject stream back to the original pixels."""
    import re
    import zlib as z
    import numpy as np
    from pero_ocr_ray.stages.multimodal import make_fake_image, _decode_image
    from pero_ocr_ray.sources.searchable_pdf import text_to_pdf

    img = make_fake_image(40, 30, 3, seed=9)
    # compress=False keeps the content-stream ops greppable below
    pdf = text_to_pdf("text over the page image", invisible=True,
                      page_image=img, compress=False)
    # text layer reads back
    blocks, err = pdf_blocks(pdf)
    assert err == ""
    assert "text over the page image" in "\n".join(
        t for b in blocks for t, _ in b["pieces"])
    # image layer: one XObject, drawn before the text ops, pixels intact
    m = re.search(rb"/Subtype /Image /Width (\d+) /Height (\d+) "
                  rb"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
                  rb"/Filter /FlateDecode /Length (\d+) >>\nstream\n", pdf)
    assert m and (int(m.group(1)), int(m.group(2))) == (40, 30)
    start = m.end()
    pixels = np.frombuffer(
        z.decompress(pdf[start:start + int(m.group(3))]), np.uint8)
    assert np.array_equal(pixels, _decode_image(img).reshape(-1))
    assert b"/Im1 Do" in pdf and b"3 Tr" in pdf
    # imageless and undecodable payloads degrade to text-only
    assert b"/Subtype /Image" not in text_to_pdf("plain")
    assert b"/Subtype /Image" not in text_to_pdf("bad", page_image=b"JUNK")


def test_searchable_pdf_dataset_image_column():
    import ray.data as rd
    from pero_ocr_ray.sources.searchable_pdf import searchable_pdf
    from pero_ocr_ray.stages.multimodal import make_fake_image
    from pero_ocr_ray.util import dataset_to_table
    rows = [{"url": f"u{i}", "extracted_text": f"doc {i}",
             "page_image": make_fake_image(8, 8, 3, seed=i) if i % 2 == 0
             else None} for i in range(4)]
    out = dataset_to_table(searchable_pdf(
        rd.from_items(rows), image_column="page_image",
        compress=False)).to_pandas()
    out = out.sort_values("url", ignore_index=True)
    for i in range(4):
        has_img = b"/Subtype /Image" in out["pdf"][i]
        assert has_img == (i % 2 == 0)
        # two-layer rows get the invisible searchable text mode
        assert (b"3 Tr" in out["pdf"][i]) == (i % 2 == 0)


def test_searchable_pdf_xref_offsets_valid():
    from pero_ocr_ray.sources.searchable_pdf import text_to_pdf
    pdf = text_to_pdf("check xref")
    xref_at = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    assert pdf[xref_at:xref_at + 4] == b"xref"
    # every offset in the table points at "N 0 obj"
    table = pdf[xref_at:].split(b"\n")
    n = int(table[1].split()[1])
    for i, row in enumerate(table[3:2 + n]):
        off = int(row.split()[0])
        assert pdf[off:off + 10].endswith(b" 0 obj\n") or b"obj" in pdf[off:off + 12]


def test_searchable_pdf_sink_dataset(tmp_path):
    import ray.data as rd
    from pero_ocr_ray.sources.searchable_pdf import (
        searchable_pdf, write_pdf_files,
    )
    from pero_ocr_ray.util import dataset_to_table
    ds = rd.from_items([{"url": f"u{i}", "extracted_text": f"doc {i} body"}
                        for i in range(5)])
    manifest = dataset_to_table(
        write_pdf_files(searchable_pdf(ds), str(tmp_path / "pdf")))
    assert manifest.num_rows == 5
    import pathlib
    p = pathlib.Path(manifest.column("path")[0].as_py())
    assert p.exists() and p.read_bytes().startswith(b"%PDF")
