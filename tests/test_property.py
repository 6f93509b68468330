"""Property-based robustness + WARC source tests.

The reference has no property tests (SURVEY §5); these go beyond it: on
arbitrary byte/text soup the extraction kernel must never raise, and its
output must satisfy the span invariants the downstream projections rely on.
"""

from hypothesis import given, settings, strategies as st

import ray.data as rd

from pero_ocr_ray.kernels.emit import extract_document
from pero_ocr_ray.util import dataset_to_table


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4096))
def test_extract_never_raises_on_bytes(raw):
    out = extract_document("u", raw)
    assert isinstance(out["extracted_text"], str)
    assert out["metrics"]["chars_emitted"] == len(out["extracted_text"])


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("<>/ab p&#;\"'=\n\t!-")),
               max_size=2048))
def test_extract_never_raises_on_tag_soup(soup):
    out = extract_document("u", soup.encode())
    assert isinstance(out["extracted_text"], str)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                        min_size=0, max_size=120),
                min_size=1, max_size=8))
def test_span_invariants_on_random_paragraphs(paras):
    import html as h
    doc = "<body>" + "".join(f"<p>{h.escape(p)}</p>" for p in paras) + "</body>"
    out = extract_document("u", doc.encode())
    text = out["extracted_text"]
    ext_positions = []
    for s in out["spans"]:
        # ext offsets always slice extracted_text to the line text exactly
        assert 0 <= s["ext_start"] <= s["ext_end"] <= len(text)
        line = text[s["ext_start"]:s["ext_end"]]
        assert "\n" not in line
        ext_positions.append(s["ext_start"])
        # source offsets are ordered and in range when present
        if s["char_start"] >= 0:
            assert s["char_start"] < s["char_end"]
    assert ext_positions == sorted(ext_positions)


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=500))
def test_determinism_on_arbitrary_text(payload):
    doc = f"<article><p>{payload}</p></article>".encode()
    assert extract_document("u", doc) == extract_document("u", doc)


# ---- round-2 kernels -------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
               max_size=200))
def test_pagexml_roundtrip_arbitrary_line_text(line):
    """PAGE-XML round trip is exact for ANY line text, including XML-hostile
    control chars (the b64 escape path)."""
    from pero_ocr_ray.sources.pagexml import (
        page_from_pagexml, page_to_pagexml,
    )
    row = {"url": "u", "payload_kind": "html", "encoding": "utf-8",
           "error": "",
           "blocks": [{"block_id": "b0000", "kind": "p", "tag_path": "p",
                       "dom_idx": 0, "depth": 1, "raw_len": len(line),
                       "link_chars": 0, "boiler": False, "pre": False,
                       "col_group": -1, "col_ord": -1, "src_start": 0,
                       "src_end": len(line), "n_chars": len(line),
                       "score": 1.25, "keep": True, "order": 0,
                       "pieces": [], "lines": [(line, 0, len(line))]}]}
    back = page_from_pagexml(page_to_pagexml(row))
    assert back["blocks"][0]["lines"] == [(line, 0, len(line))]


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=2048))
def test_pdf_blocks_never_raises(raw):
    from pero_ocr_ray.kernels.pdfmini import pdf_blocks
    blocks, err = pdf_blocks(b"%PDF-1.4\n" + raw)
    assert isinstance(blocks, list) and isinstance(err, str)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("abc ")), max_size=30))
def test_beam_equals_greedy_on_peaked_lattices(text):
    """With near-one-hot lattices (no ambiguity) the prefix-beam decoder,
    the greedy decoder and the source text all agree."""
    import numpy as np
    from pero_ocr_ray.kernels.beam import (
        BLANK, ctc_prefix_beam_decode, greedy_ctc_decode, text_to_lattice,
    )
    letters = list("abc ") + [BLANK]
    lat = text_to_lattice(text, letters, noise=0.0)
    assert greedy_ctc_decode(lat, letters).best_hyp() == text
    assert ctc_prefix_beam_decode(lat, letters, k=2).best_hyp() == text


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("ab 12سلم،.x؟")), max_size=20))
def test_bidi_involution_hypothesis(s):
    from pero_ocr_ray.kernels.rtl import logical_to_visual
    v = logical_to_visual(s)
    assert sorted(v) == sorted(s)
    assert logical_to_visual(v) == s


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",),
                                      max_codepoint=0xFB4F),
               max_size=200))
def test_shaping_unshape_inverts_shape(s):
    """presentation_to_string(string_to_presentation(x)) == x for any text
    (shaping only substitutes presentation glyphs with exact back-maps)."""
    from pero_ocr_ray.kernels.rtl import (
        presentation_to_string, string_to_presentation,
    )
    assert presentation_to_string(string_to_presentation(s)) == s


# ---- WARC source ----------------------------------------------------------

def _sample_records():
    return [
        ("https://a.example/1", "2026-01-01T00:00:00Z",
         b"<html><body><article><p>first page content with enough words here"
         b" to pass the minimum</p></article></body></html>"),
        ("https://a.example/2", "2026-01-01T00:02:17Z",
         b"<html><body><p>second page body also has plenty of words in it"
         b" for extraction</p></body></html>"),
    ]


def test_warc_roundtrip_plain(tmp_path):
    from pero_ocr_ray.sources.warc import make_warc, parse_warc_bytes
    data = make_warc(_sample_records())
    recs = parse_warc_bytes(data)
    assert [r["url"] for r in recs] == ["https://a.example/1",
                                       "https://a.example/2"]
    assert recs[0]["html"].startswith(b"<html>")
    assert recs[0]["warc_ts"].year == 2026


def test_warc_gzip_and_pipeline(tmp_path):
    from pero_ocr_ray.pipelines.extract import extract_pipeline
    from pero_ocr_ray.sources.warc import make_warc, read_warc
    p1 = tmp_path / "crawl-0.warc.gz"
    p1.write_bytes(make_warc(_sample_records(), compress=True))
    p2 = tmp_path / "crawl-1.warc"
    p2.write_bytes(make_warc([("https://b.example/3", "2026-02-02T10:00:00Z",
                               b"<p>third page with sufficient textual "
                               b"content for the filters</p>")]))
    ds = read_warc([str(p1), str(p2)])
    out = dataset_to_table(extract_pipeline(ds, concurrency=1)).sort_by("row_id")
    assert out.num_rows == 3
    texts = out.column("extracted_text").to_pylist()
    assert "first page content" in texts[0]
    assert "third page" in texts[2]
    # lineage: file 0 records then file 1 records
    rids = out.column("row_id").to_pylist()
    assert rids == [0, 1, 1_000_000_000]


def test_warc_malformed_records_skipped():
    from pero_ocr_ray.sources.warc import make_warc, parse_warc_bytes
    good = make_warc(_sample_records())
    mangled = good[:40] + b"GARBAGE" + good[40:]  # corrupt first record
    recs = parse_warc_bytes(mangled)
    assert len(recs) >= 1  # the intact record still parses


def test_warc_dataset_is_dedupable():
    from pero_ocr_ray.pipelines.extract import dedup_pages
    from pero_ocr_ray.sources.warc import make_warc, read_warc
    import tempfile, os
    recs = _sample_records()
    recs.append((recs[0][0], "2026-01-05T00:00:00Z",
                 b"<p>a recrawl of page one with newer fresher text body</p>"))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.warc")
        with open(path, "wb") as fh:
            fh.write(make_warc(recs))
        survivors = dataset_to_table(dedup_pages(read_warc(path)))
    assert survivors.num_rows == 2
    by_url = {r["url"]: r for r in survivors.to_pylist()}
    assert b"recrawl" in by_url["https://a.example/1"]["html"]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                min_size=1, max_size=12, unique=True))
def test_xy_cut_permutation_invariant(cells):
    """Reading order must not depend on input order (determinism): feed the
    same rects in two different orders, expect identical output."""
    from pero_ocr_ray.kernels.order import xy_cut
    rects = [(float(x), float(y), x + 0.9, y + 0.9, i)
             for i, (x, y) in enumerate(cells)]
    a = xy_cut(rects)
    b = xy_cut(list(reversed(rects)))
    assert a == b
    assert sorted(a) == list(range(len(rects)))  # a permutation, no loss
