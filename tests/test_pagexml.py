"""PAGE-XML / ALTO codec tests: exact round-trip through real XML, lenient
foreign-file import (reference reader semantics, layout.py:247-321), ALTO
word/geometry model (layout.py:400-597)."""

import pyarrow as pa
import pytest

from pero_ocr_ray.kernels.config import DEFAULT_CONFIG
from pero_ocr_ray.kernels.emit import (
    assemble, extract_document, parse_payload, segment_blocks,
)
from pero_ocr_ray.kernels.order import reading_order
from pero_ocr_ray.kernels.score import classify_blocks
from pero_ocr_ray.oracle import extract_table
from pero_ocr_ray.sources.pagexml import (
    alto_to_lines, page_from_pagexml, page_to_alto, page_to_pagexml,
    read_pagexml_files, write_xml_files,
)
from pero_ocr_ray.sources.pages import synthesize_pages
from pero_ocr_ray.util import dataset_to_table


def _layout_row(url: str, raw: bytes) -> dict:
    """Run the kernel chain up to (but not including) emit."""
    blocks, kind, encoding, error = parse_payload(raw, DEFAULT_CONFIG)
    segment_blocks(blocks)
    classify_blocks(blocks, DEFAULT_CONFIG)
    kept = [b for b in blocks if b["keep"]]
    reading_order(kept)
    return {"url": url, "blocks": blocks, "payload_kind": kind,
            "encoding": encoding, "error": error, "warc_ts": None}


@pytest.mark.parametrize("i", range(18))  # one per catalog case
def test_pagexml_roundtrip_preserves_emit(i):
    pages = synthesize_pages(18)
    url = pages.column("url")[i].as_py()
    raw = pages.column("html")[i].as_py()
    row = _layout_row(url, raw)
    want_text, want_spans = assemble(row["blocks"])

    xml = page_to_pagexml(row)
    back = page_from_pagexml(xml)
    assert back["url"] == url
    assert back["payload_kind"] == row["payload_kind"]
    assert len(back["blocks"]) == len(row["blocks"])
    got_text, got_spans = assemble(back["blocks"])
    assert got_text == want_text
    assert got_spans == want_spans


def test_pagexml_roundtrip_control_chars():
    row = {"url": "u", "payload_kind": "html", "encoding": "utf-8",
           "error": "",
           "blocks": [{"block_id": "b0000", "kind": "p", "tag_path": "p",
                       "dom_idx": 0, "depth": 1, "raw_len": 5,
                       "link_chars": 0, "boiler": False, "pre": True,
                       "col_group": -1, "col_ord": -1, "src_start": 0,
                       "src_end": 5, "n_chars": 5, "score": 0.75,
                       "keep": True, "order": 0, "pieces": [],
                       "lines": [("a\x01b\x02c", 0, 5)]}]}
    back = page_from_pagexml(page_to_pagexml(row))
    assert back["blocks"][0]["lines"] == [("a\x01b\x02c", 0, 5)]
    assert back["blocks"][0]["score"] == 0.75  # full precision via custom


def test_pagexml_reader_is_lenient_like_reference():
    """Foreign PAGE file (no custom attrs): baseline-less lines are skipped,
    a missing Unicode reads as '', reading order comes from ReadingOrder."""
    xml = """<?xml version="1.0" encoding="utf-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15">
 <Page imageFilename="doc7" imageWidth="100" imageHeight="2">
  <ReadingOrder><OrderedGroup id="g">
    <RegionRefIndexed index="0" regionRef="r2"/>
    <RegionRefIndexed index="1" regionRef="r1"/>
  </OrderedGroup></ReadingOrder>
  <TextRegion id="r1">
   <Coords points="0,0 40,0 40,1 0,1"/>
   <TextLine id="r1l000"><Baseline points="0,0 40,0"/>
     <TextEquiv><Unicode>first region</Unicode></TextEquiv></TextLine>
   <TextLine id="r1l001">
     <TextEquiv><Unicode>no baseline - skipped</Unicode></TextEquiv></TextLine>
  </TextRegion>
  <TextRegion id="r2">
   <Coords points="50,1 90,1 90,2 50,2"/>
   <TextLine id="r2l000"><Baseline points="50,1 90,1"/>
     <TextEquiv/></TextLine>
  </TextRegion>
 </Page>
</PcGts>"""
    row = page_from_pagexml(xml)
    assert row["url"] == "doc7"
    by_id = {b["block_id"]: b for b in row["blocks"]}
    assert len(by_id["r1"]["lines"]) == 1  # baseline-less line dropped
    assert by_id["r1"]["lines"][0] == ("first region", 0, 40)
    assert by_id["r2"]["lines"][0][0] == ""  # empty TextEquiv -> ''
    # reading order from the ReadingOrder block; both referenced regions keep
    assert by_id["r2"]["order"] == 0 and by_id["r1"]["order"] == 1
    assert by_id["r1"]["keep"] and by_id["r2"]["keep"]
    # geometry recovered from Coords when no custom attrs exist
    assert by_id["r1"]["src_start"] == 0 and by_id["r1"]["src_end"] == 40


def test_staged_pipeline_through_pagexml_byte_identical():
    """decode→parse→segment→classify→order→PAGE-XML→parse-back→emit must be
    byte-identical to the direct pipeline (the real S2/W1 interop gate)."""
    import ray.data as rd
    from pero_ocr_ray.pipelines.registry import build_from_spec
    pages = synthesize_pages(36)
    golden = extract_table(pages).sort_by("row_id")
    spec = [{"stage": "decode"}, {"stage": "parse"}, {"stage": "segment"},
            {"stage": "classify", "concurrency": 2}, {"stage": "order"},
            {"stage": "to_pagexml"}, {"stage": "from_pagexml"},
            {"stage": "emit"}]
    out = dataset_to_table(build_from_spec(rd.from_arrow(pages), spec)
                           ).sort_by("row_id")
    assert out.num_rows == golden.num_rows
    for col in ("extracted_text", "spans", "metrics", "payload_kind", "error"):
        assert out.column(col).to_pylist() == golden.column(col).to_pylist(), col


def test_pagexml_file_corpus_roundtrip(tmp_path):
    """write_xml_files -> read_pagexml_files -> emit over a real on-disk
    PAGE-XML corpus."""
    import ray.data as rd
    from pero_ocr_ray.pipelines.registry import build_from_spec
    pages = synthesize_pages(12)
    golden = extract_table(pages)
    spec = [{"stage": "decode"}, {"stage": "parse"}, {"stage": "segment"},
            {"stage": "classify", "concurrency": 2}, {"stage": "order"},
            {"stage": "to_pagexml"}]
    with_xml = build_from_spec(rd.from_arrow(pages), spec)
    manifest = dataset_to_table(write_xml_files(with_xml, str(tmp_path / "xml")))
    assert manifest.num_rows == 12
    corpus = read_pagexml_files(manifest.column("path").to_pylist())
    from pero_ocr_ray.stages.extract import emit_stage
    import functools
    out = dataset_to_table(
        corpus.map_batches(functools.partial(emit_stage, cfg=DEFAULT_CONFIG),
                           batch_format="pyarrow"))
    got = dict(zip(out.column("url").to_pylist(),
                   out.column("extracted_text").to_pylist()))
    want = dict(zip(golden.column("url").to_pylist(),
                    golden.column("extracted_text").to_pylist()))
    # 12 pages = catalog cases 0..11: no dup_url row, so every url must
    # survive the file write and every text must round-trip exactly — a
    # reader that drops or alters files fails here
    assert len(want) == 12
    assert set(got) == set(want)
    for url in want:
        assert got[url] == want[url]


def test_compare_pagexml_dirs(tmp_path):
    """compare_page_xml_texts analog: two on-disk PAGE-XML corpora meet in
    the distributed comparison; a self-compare is exactly zero and a
    corpus-vs-modified compare is not."""
    import ray.data as rd
    from pero_ocr_ray.functions.quality import compare_pagexml_dirs
    from pero_ocr_ray.pipelines.registry import build_from_spec
    pages = synthesize_pages(10)
    spec = [{"stage": "decode"}, {"stage": "parse"}, {"stage": "segment"},
            {"stage": "classify", "concurrency": 2}, {"stage": "order"},
            {"stage": "to_pagexml"}]
    with_xml = build_from_spec(rd.from_arrow(pages), spec)
    m = dataset_to_table(write_xml_files(with_xml, str(tmp_path / "a")))
    paths = m.column("path").to_pylist()
    stats = compare_pagexml_dirs(paths, paths)
    assert stats["cer"] == 0.0 and stats["n_docs"] == len(paths)
    # modified ref corpus: flip one file's text
    import shutil
    bdir = tmp_path / "b"
    shutil.copytree(tmp_path / "a", bdir)
    victim = sorted(bdir.glob("*.xml"))[0]
    victim.write_text(victim.read_text().replace("<Unicode>", "<Unicode>X ", 1))
    stats2 = compare_pagexml_dirs(paths,
                                  [str(p) for p in sorted(bdir.glob("*.xml"))])
    assert stats2["cer"] > 0.0


# ---- ALTO -----------------------------------------------------------------


def test_alto_writer_and_reader():
    pages = synthesize_pages(18)
    i = 1  # boilerplate case: several kept blocks + dropped nav blocks
    row = _layout_row(pages.column("url")[i].as_py(),
                      pages.column("html")[i].as_py())
    text, spans = assemble(row["blocks"])
    alto = page_to_alto(row)
    assert '<MeasurementUnit>pixel</MeasurementUnit>' in alto
    lines = alto_to_lines(alto)
    assert lines and all(ln["url"] == row["url"] for ln in lines)
    # word model: rejoined words reproduce each emitted line's text
    emitted = [text[s["ext_start"]:s["ext_end"]] for s in spans]
    emitted_nonempty = [t for t in emitted if t.strip()]
    assert [ln["line_text"] for ln in lines] == emitted_nonempty
    # word confidences present and equal to the block score rounded
    kept = {b["block_id"]: b for b in row["blocks"] if b["keep"]}
    for ln in lines:
        assert ln["wc"] == round(kept[ln["block_id"]]["score"], 2)


def test_alto_min_line_confidence_filters():
    row = {"url": "u", "payload_kind": "html", "encoding": "", "error": "",
           "blocks": [
               {"block_id": "hi", "dom_idx": 0, "src_start": 0, "src_end": 9,
                "score": 0.9, "keep": True, "order": 0, "pieces": [],
                "lines": [("good line", 0, 9)]},
               {"block_id": "lo", "dom_idx": 1, "src_start": 10, "src_end": 18,
                "score": 0.2, "keep": True, "order": 1, "pieces": [],
                "lines": [("bad line", 10, 18)]},
           ]}
    all_lines = alto_to_lines(page_to_alto(row))
    assert {ln["block_id"] for ln in all_lines} == {"hi", "lo"}
    filtered = alto_to_lines(page_to_alto(row, min_line_confidence=0.5))
    assert {ln["block_id"] for ln in filtered} == {"hi"}


def test_alto_margins_accumulate():
    import xml.etree.ElementTree as ET
    pages = synthesize_pages(18)
    row = _layout_row(pages.column("url")[0].as_py(),
                      pages.column("html")[0].as_py())
    root = ET.fromstring(page_to_alto(row))
    ns = root.tag.rsplit("}", 1)[0] + "}"
    page = root.find(f"{ns}Layout/{ns}Page")
    ps = page.find(f"{ns}PrintSpace")
    # PrintSpace must cover every TextBlock rect
    for tb in ps:
        assert int(tb.get("VPOS")) >= int(ps.get("VPOS"))
        assert (int(tb.get("VPOS")) + int(tb.get("HEIGHT"))
                <= int(ps.get("VPOS")) + int(ps.get("HEIGHT")))
        assert int(tb.get("HPOS")) >= int(ps.get("HPOS"))
        assert (int(tb.get("HPOS")) + int(tb.get("WIDTH"))
                <= int(ps.get("HPOS")) + int(ps.get("WIDTH")))
