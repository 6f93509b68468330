"""Case-level behavior assertions on the sequential oracle (FIXTURES.md).

One assertion set per fixture case, mirroring the reference behaviors each
case exercises (citations in FIXTURES.md). No Ray involved.
"""

import pytest

from pero_ocr_ray.oracle import extract_table
from pero_ocr_ray.sources.pages import CASES, synthesize_pages

N = len(CASES)


@pytest.fixture(scope="module")
def oracle_out():
    pages = synthesize_pages(2 * N)
    return pages, extract_table(pages)


def _row(out, i):
    return {name: out.column(name)[i].as_py() for name in out.column_names}


def case_index(case):
    return CASES.index(case)


def test_simple_keeps_everything(oracle_out):
    _, out = oracle_out
    r = _row(out, case_index("simple"))
    assert r["metrics"]["blocks_kept"] == r["metrics"]["blocks_total"] == 4
    assert "\n\n" in r["extracted_text"]


def test_boilerplate_stripped(oracle_out):
    _, out = oracle_out
    r = _row(out, case_index("boilerplate"))
    assert r["metrics"]["blocks_total"] == 6
    assert r["metrics"]["blocks_kept"] == 3  # nav/aside/footer dropped
    assert "href" not in r["extracted_text"]


def test_multicolumn_column_major(oracle_out):
    pages, out = oracle_out
    i = case_index("multicolumn")
    r = _row(out, i)
    text = pages.column("text")[i].as_py()
    # column-major order == paragraph order of the source text
    assert r["extracted_text"] == text.replace("\n", "\n\n")


def test_edge_fragments_dropped(oracle_out):
    _, out = oracle_out
    r = _row(out, case_index("edge_fragment"))
    assert "Home »" not in r["extracted_text"]
    assert "© site" not in r["extracted_text"]
    assert r["metrics"]["blocks_kept"] == 2


def test_short_page_dropped_entirely(oracle_out):
    _, out = oracle_out
    r = _row(out, case_index("short_page"))
    assert r["extracted_text"] == ""
    assert r["metrics"]["blocks_kept"] == 0


def test_empty_page(oracle_out):
    _, out = oracle_out
    r = _row(out, case_index("empty"))
    assert r["extracted_text"] == "" and r["metrics"]["blocks_total"] == 0


def test_split_inline_merged(oracle_out):
    pages, out = oracle_out
    i = case_index("split_inline")
    assert _row(out, i)["extracted_text"] == pages.column("text")[i].as_py()


def test_tie_order_deterministic_dom_order(oracle_out):
    _, out = oracle_out
    r = _row(out, case_index("tie_order"))
    paras = r["extracted_text"].split("\n\n")
    assert [p.split()[1] for p in paras] == ["0", "1", "2", "3"]


def test_rtl_arabic_bytes_preserved(oracle_out):
    pages, out = oracle_out
    i = case_index("rtl_arabic")
    r = _row(out, i)
    assert r["extracted_text"] == pages.column("text")[i].as_py().replace("\n", "\n\n")


def test_long_page_complete(oracle_out):
    _, out = oracle_out
    r = _row(out, case_index("long_page"))
    assert r["metrics"]["blocks_kept"] == 200
    assert r["metrics"]["chars_emitted"] > 400_000


def test_malformed_recovers_content(oracle_out):
    _, out = oracle_out
    r = _row(out, case_index("malformed"))
    assert r["metrics"]["blocks_kept"] >= 3
    assert "& more" in r["extracted_text"]


def test_bad_bytes_latin1_decoded(oracle_out):
    _, out = oracle_out
    r = _row(out, case_index("bad_bytes"))
    assert "café résumé naïve" in r["extracted_text"]
    assert r["encoding"] == "iso8859-1" or "8859" in r["encoding"]


def test_pdf_payload_text(oracle_out):
    pages, out = oracle_out
    i = case_index("pdf_payload")
    r = _row(out, i)
    assert r["payload_kind"] == "pdf"
    assert r["extracted_text"] == pages.column("text")[i].as_py()


def test_dup_url_rows_share_url(oracle_out):
    pages, _ = oracle_out
    i = case_index("dup_url")
    assert pages.column("url")[i].as_py() == pages.column("url")[i - 1].as_py()


def test_pre_code_whitespace_survives(oracle_out):
    _, out = oracle_out
    r = _row(out, case_index("pre_code"))
    assert "    return  x * 2" in r["extracted_text"]
    assert "  # indented   comment" in r["extracted_text"]


def test_links_only_rejected(oracle_out):
    _, out = oracle_out
    r = _row(out, case_index("links_only"))
    assert r["extracted_text"] == ""
    assert r["metrics"]["blocks_total"] == 120


def test_confidence_threshold_straddle(oracle_out):
    _, out = oracle_out
    r = _row(out, case_index("confidence_like"))
    assert r["metrics"]["blocks_kept"] == 2  # x*25 kept, y*12 dropped
    assert "x" * 25 in r["extracted_text"]
    assert "y" * 12 not in r["extracted_text"]


def test_spans_point_into_visible_stream(oracle_out):
    pages, out = oracle_out
    i = case_index("simple")
    r = _row(out, i)
    assert r["spans"], "simple case must emit spans"
    for s in r["spans"]:
        assert 0 <= s["char_start"] < s["char_end"]
    starts = [s["char_start"] for s in r["spans"]]
    assert starts == sorted(starts)


def test_second_cycle_same_behavior(oracle_out):
    """Rows N.. repeat the case cycle with different content; invariants hold."""
    _, out = oracle_out
    r = _row(out, N + case_index("short_page"))
    assert r["extracted_text"] == ""
    r2 = _row(out, N + case_index("boilerplate"))
    assert r2["metrics"]["blocks_kept"] == 3
