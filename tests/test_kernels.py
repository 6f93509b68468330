"""Unit tests for the pure extraction kernels (no Ray needed).

Mirrors the reference's pure-function test style
(/root/reference/test/test_sequence_alignment.py, test_layout_helpers)."""

import pyarrow  # noqa: F401  (environment sanity)

from pero_ocr_ray.kernels.config import ExtractConfig
from pero_ocr_ray.kernels.decode import decode_payload, payload_kind, sniff_charset
from pero_ocr_ray.kernels.emit import extract_document
from pero_ocr_ray.kernels.htmlparse import parse_html
from pero_ocr_ray.kernels.order import block_rects, xy_cut
from pero_ocr_ray.kernels.pdfmini import pdf_blocks
from pero_ocr_ray.kernels.score import score_block
from pero_ocr_ray.kernels.segment import canonical_text, segment_block
from pero_ocr_ray.sources.pages import make_pdf


# ---- decode ---------------------------------------------------------------

def test_decode_utf8():
    text, enc, err = decode_payload("héllo".encode())
    assert (text, enc, err) == ("héllo", "utf-8", "")


def test_decode_declared_latin1():
    raw = b'<meta charset="iso-8859-1">caf\xe9'
    text, enc, err = decode_payload(raw)
    assert "café" in text and "8859" in enc and err == ""


def test_decode_fallback_replace():
    text, enc, err = decode_payload(b"\xff\xfe\xff garbage \xff")
    assert enc in ("utf-8-replace", "utf-16") or "decode_replace" in err


def test_decode_truncation():
    cfg = ExtractConfig(max_payload_bytes=10)
    text, enc, err = decode_payload(b"a" * 100, cfg)
    assert len(text) == 10 and "truncated_payload" in err


def test_sniff_charset_bom():
    assert sniff_charset(b"\xef\xbb\xbfrest") == "utf-8"


def test_payload_kind():
    assert payload_kind(b"%PDF-1.4 x") == "pdf"
    assert payload_kind(b"<html>") == "html"


# ---- htmlparse ------------------------------------------------------------

def test_blocks_basic():
    blocks = parse_html("<html><body><p>one two</p><p>three</p></body></html>")
    assert [canonical_text(b) for b in blocks] == ["one two", "three"]
    assert [b["kind"] for b in blocks] == ["p", "p"]
    assert [b["dom_idx"] for b in blocks] == [0, 1]


def test_implied_close_p():
    blocks = parse_html("<p>alpha<p>beta")
    assert [canonical_text(b) for b in blocks] == ["alpha", "beta"]
    # implied close must not inflate depth of the second paragraph
    assert blocks[0]["depth"] == blocks[1]["depth"]


def test_inline_tags_do_not_split():
    blocks = parse_html("<p>a <b>b</b> c <i>d</i> e</p>")
    assert len(blocks) == 1
    assert canonical_text(blocks[0]) == "a b c d e"


def test_link_chars_counted():
    blocks = parse_html('<p><a href="/">linked text</a> plain</p>')
    b = blocks[0]
    assert b["link_chars"] == len("linked text")
    assert b["raw_len"] == len("linked text plain")


def test_script_style_invisible():
    blocks = parse_html("<body><script>var x=1;</script><p>seen</p>"
                        "<style>p{}</style></body>")
    assert [canonical_text(b) for b in blocks] == ["seen"]
    # visible stream offsets must not count script content
    assert blocks[0]["src_start"] == 0


def test_boiler_ancestry_flag():
    blocks = parse_html("<nav><p>menu</p></nav><main><p>content</p></main>")
    assert blocks[0]["boiler"] is True
    assert blocks[1]["boiler"] is False


def test_stray_close_ignored():
    blocks = parse_html("<p>text</div></p>")
    assert canonical_text(blocks[0]) == "text"


def test_br_creates_lines():
    blocks = parse_html("<p>l1<br>l2<br>l3</p>")
    lines = [t for t, _, _ in segment_block(blocks[0])]
    assert lines == ["l1", "l2", "l3"]


def test_column_containers():
    blocks = parse_html('<div class="row"><div class="col"><p>a</p></div>'
                        '<div class="col"><p>b</p></div></div>')
    assert blocks[0]["col_ord"] == 0 and blocks[1]["col_ord"] == 1
    assert blocks[0]["col_group"] == blocks[1]["col_group"]


def test_plain_div_inside_cell_keeps_col_ctx():
    # A non-column <div> nested in a td must not pop the cell's col_ctx
    # entry: the following <p> still belongs to the cell's column group.
    blocks = parse_html("<table><tr><td><div>a</div><p>b</p></td></tr></table>")
    assert [canonical_text(b) for b in blocks] == ["a", "b"]
    assert blocks[1]["col_group"] == blocks[0]["col_group"] != -1
    assert blocks[1]["col_ord"] == blocks[0]["col_ord"] == 0


def test_table_cells_are_columns():
    blocks = parse_html("<table><tr><td>a</td><td>b</td></tr>"
                        "<tr><td>c</td></tr></table>")
    assert [b["col_ord"] for b in blocks] == [0, 1, 0]
    assert blocks[0]["col_group"] == blocks[1]["col_group"] != blocks[2]["col_group"]


# ---- segment --------------------------------------------------------------

def test_whitespace_canonicalization():
    blocks = parse_html("<p>  a\t\t b \n\n c  </p>")
    assert canonical_text(blocks[0]) == "a b c"


def test_pre_preserves_whitespace():
    code = "def f():\n    return  1"
    blocks = parse_html(f"<pre>{code}</pre>")
    assert canonical_text(blocks[0]) == code


def test_segment_offsets_into_visible_stream():
    html = "<p>hello   world</p>"
    blocks = parse_html(html)
    (text, s0, s1), = segment_block(blocks[0])
    assert text == "hello world"
    # visible stream is exactly 'hello   world'
    assert (s0, s1) == (0, len("hello   world"))


def test_entity_decoding():
    blocks = parse_html("<p>a &amp; b &lt;c&gt;</p>")
    assert canonical_text(blocks[0]) == "a & b <c>"


# ---- score ----------------------------------------------------------------

def test_score_monotone_in_length():
    lo = score_block(10, 0, 10, 3, False, "p")
    hi = score_block(1000, 0, 1000, 3, False, "p")
    assert hi > lo


def test_score_link_density_penalty():
    plain = score_block(100, 0, 100, 3, False, "p")
    linky = score_block(100, 95, 100, 3, False, "p")
    assert plain - linky > 4


def test_score_boiler_penalty():
    assert score_block(100, 0, 100, 3, False, "p") - \
           score_block(100, 0, 100, 3, True, "p") == ExtractConfig().boiler_penalty


# ---- reading order --------------------------------------------------------

def test_xy_cut_two_columns():
    # two dense columns side by side (y ranges overlap across columns, so no
    # horizontal cut applies), scrambled input order -> column-major
    rects = [
        (1.2, 0.0, 2.2, 0.6, 10),  # col2 top
        (0.0, 0.4, 1.0, 1.0, 3),   # col1 bottom
        (0.0, 0.0, 1.0, 0.6, 1),   # col1 top
        (1.2, 0.4, 2.2, 1.0, 12),  # col2 bottom
    ]
    assert xy_cut(rects) == [1, 3, 10, 12]


def test_xy_cut_full_width_banner_then_columns():
    rects = [
        (0.0, 0.0, 2.0, 0.5, 0),   # banner spans both columns
        (1.0, 1.0, 2.0, 1.5, 2),   # right col
        (0.0, 1.0, 1.0, 1.5, 1),   # left col
        (0.0, 2.0, 2.0, 2.5, 3),   # footer
    ]
    assert xy_cut(rects) == [0, 1, 2, 3]


def test_xy_cut_tie_breaks_deterministic():
    rects = [(0.0, 0.0, 1.0, 1.0, k) for k in (5, 2, 9)]
    assert xy_cut(rects) == [2, 5, 9]  # identical geometry -> key order


def test_reading_order_multicolumn_blocks():
    html = ('<div class="row">'
            '<div class="col"><p>a1</p><p>a2</p></div>'
            '<div class="col"><p>b1</p><p>b2</p></div></div>'
            "<p>tail</p>")
    blocks = parse_html(html)
    rects = block_rects(blocks)
    order = xy_cut(rects)
    texts = {b["dom_idx"]: canonical_text(b) for b in blocks}
    assert [texts[i] for i in order] == ["a1", "a2", "b1", "b2", "tail"]


# ---- pdf ------------------------------------------------------------------

def test_pdf_uncompressed_roundtrip():
    pdf = make_pdf(["hello world", "second line"], compress=False)
    blocks, err = pdf_blocks(pdf)
    assert err == ""
    assert canonical_text(blocks[0]) == "hello world\nsecond line"


def test_pdf_flate_roundtrip():
    pdf = make_pdf(["compressed content here"], compress=True)
    blocks, _ = pdf_blocks(pdf)
    assert canonical_text(blocks[0]) == "compressed content here"


def test_pdf_escaped_parens():
    pdf = make_pdf(["with (parens) and \\backslash"], compress=False)
    blocks, _ = pdf_blocks(pdf)
    assert canonical_text(blocks[0]) == "with (parens) and \\backslash"


def test_pdf_garbage_is_error_not_crash():
    blocks, err = pdf_blocks(b"%PDF-1.4 total garbage")
    assert blocks == [] and err != ""


# ---- full chain -----------------------------------------------------------

def test_extract_document_deterministic():
    raw = ("<html><body><nav><a href='/'>home</a></nav>"
           "<article><p>real content paragraph with enough text here</p>"
           "</article></body></html>").encode()
    a = extract_document("u", raw)
    b = extract_document("u", raw)
    assert a == b
    assert a["extracted_text"] == "real content paragraph with enough text here"
    assert a["metrics"]["blocks_kept"] == 1


# ---- adversarial robustness ----------------------------------------------

def test_pathological_many_bands_no_recursion_error():
    # 4000 alternating full-width blocks -> 4000 bands; xy_cut must not
    # recurse per band
    html = "<body>" + "".join(f"<p>block {i} with some words here</p>"
                              for i in range(4000)) + "</body>"
    out = extract_document("u", html.encode())
    assert out["error"] == ""
    assert out["metrics"]["blocks_kept"] == 4000
    # dom order preserved
    first, last = out["extracted_text"].split("\n\n")[0], \
        out["extracted_text"].split("\n\n")[-1]
    assert first.startswith("block 0") and last.startswith("block 3999")


def test_deeply_nested_divs_survive():
    html = "<div>" * 2000 + "<p>deep content paragraph with words</p>" \
        + "</div>" * 2000
    out = extract_document("u", html.encode())
    # either extracted fine or error-flagged — never an exception
    assert isinstance(out["extracted_text"], str)


def test_poison_row_degrades_to_error():
    from unittest import mock
    from pero_ocr_ray.kernels import emit as emit_mod
    with mock.patch.object(emit_mod, "classify_blocks",
                           side_effect=RuntimeError("boom")):
        out = extract_document("u", b"<p>some normal content here</p>")
    assert out["extracted_text"] == ""
    assert out["error"] == "extract_error:RuntimeError"
    assert out["metrics"]["blocks_total"] == 0


def test_invisible_subtrees_contribute_nothing():
    """Content inside script/style/template/noscript must not leak text,
    line breaks, or block-structure side effects into visible blocks —
    a <noscript><div>ad</div></noscript> inside a paragraph previously
    split it and edge-dropped the prefix (content loss)."""
    from pero_ocr_ray.kernels.config import DEFAULT_CONFIG
    from pero_ocr_ray.kernels.emit import extract_document

    def text_of(html: bytes) -> str:
        return extract_document("u", html, DEFAULT_CONFIG)["extracted_text"]

    base = b"hello there my good friend how are you doing today"
    tail = b" world of many more words here to keep the block alive"
    plain = text_of(b"<p>" + base + tail + b"</p>")
    # invisible div must not split the visible block
    assert text_of(b"<p>" + base +
                   b"<noscript><div>ad banner</div></noscript>" + tail +
                   b"</p>") == plain
    # invisible <br> must not inject a line break
    assert text_of(b"<p>" + base + b"<template><br>zz</template>" + tail +
                   b"</p>") == plain
    # a stray </p> inside the invisible subtree must not close the
    # visible paragraph
    assert text_of(b"<p>" + base +
                   b"<noscript></p><div>x</div></noscript>" + tail +
                   b"</p>") == plain
    # script/style content stays invisible (including markup-like text)
    assert text_of(b"<style>p {color: red}</style><p>" + base + tail +
                   b"</p>") == plain
    assert text_of(b"<p>" + base + b"<script>var x = '<div>'</script>" +
                   tail + b"</p>") == plain
