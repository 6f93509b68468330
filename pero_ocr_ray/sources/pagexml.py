"""PAGE-XML and ALTO codecs over the nested ``blocks`` column (S2/S3/W1/W2).

Real XML interop, stdlib ``xml.etree`` only — the analog of the reference's
PAGE reader/writer (/root/reference/pero_ocr/core/layout.py:247-321 read,
:323-398 write) and ALTO writer (:400-597). The DOM-extraction domain has no
pixel geometry, so the codec maps the engine's derived geometry onto PAGE's
coordinate model, documented here once:

* x axis = offsets into the visible source-text stream (``src_start`` /
  ``src_end`` — the logit_coords analog), y axis = ``dom_idx`` (document
  order). A region's Coords is the rectangle (src_start, dom_idx) ..
  (src_end, dom_idx + 1); a line's Baseline is the segment
  (src_start, dom_idx) .. (src_end, dom_idx).
* ``TextEquiv@conf`` carries the block keep-score rounded to 3 decimals
  (the reference writes line confidence the same way, layout.py:389-394);
  the full-precision float and every other block feature ride in the
  region's ``custom`` attribute (the reference uses ``custom`` for its
  ``heights_v2`` payload the same way, layout.py:265-284,365-366).
* ``ReadingOrder/OrderedGroup/RegionRefIndexed`` mirrors the reference's
  reading-order block (read at layout.py:258 via ``get_reading_order``,
  written by ``reading_order_to_page_xml``).

Round-trip contract: ``page_from_pagexml(page_to_pagexml(row))`` restores
every field ``emit_stage``/``assemble`` consume (blocks in DOM order with
lines, keep, order, score, ids, offsets) — byte-identical extracted_text +
spans (tested). Pre-segmentation ``pieces`` are NOT serialized (like the
reference, whose PAGE files carry transcriptions, not logits): XML-imported
blocks can be emitted and re-scored but not re-segmented.

Determinism: ``Metadata/Created`` uses the row's ``warc_ts`` (fall back to a
fixed epoch), never wall-clock.
"""

from __future__ import annotations

import base64
import re
import xml.etree.ElementTree as ET

import pyarrow as pa

PAGE_NS = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"
ALTO_NS = "http://www.loc.gov/standards/alto/ns-v2#"
_FIXED_CREATED = "2026-01-01T00:00:00+00:00"

# scalar block fields serialized in TextRegion/@custom (bools as 1/0,
# score at full repr precision so the round trip is exact)
_INT_FIELDS = ("dom_idx", "depth", "raw_len", "link_chars", "col_group",
               "col_ord", "src_start", "src_end", "n_chars", "order")
_BOOL_FIELDS = ("boiler", "pre", "keep")

# \r included: XML parsers normalize \r / \r\n to \n in content (XML 1.0
# §2.11), which would silently corrupt the round trip
_INVALID_XML = re.compile("[\x00-\x08\x0b-\x0d\x0e-\x1f]")
_ALTO_ID_SUB = re.compile("[!\"#$%&'()*+,/:;<=>?@[\\]^`{|}~ ]")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _set_text(elem: ET.Element, text: str) -> None:
    """XML 1.0 cannot carry control chars < 0x20 (except \\t \\n \\r); such
    lines are base64-wrapped with an ``enc`` marker (deterministic,
    reversible — the skip-and-continue alternative would lose content)."""
    if _INVALID_XML.search(text):
        elem.set("enc", "b64")
        elem.text = base64.b64encode(text.encode("utf-8")).decode("ascii")
    else:
        elem.text = text


def _get_text(elem: ET.Element) -> str:
    text = elem.text or ""
    if elem.get("enc") == "b64":
        return base64.b64decode(text).decode("utf-8")
    return text


def _custom_str(b: dict) -> str:
    parts = [f"kind:{b.get('kind', '')}", f"tag_path:{b.get('tag_path', '')}"]
    for f in _INT_FIELDS:
        v = b.get(f)
        if v is not None:
            parts.append(f"{f}:{int(v)}")
    for f in _BOOL_FIELDS:
        v = b.get(f)
        if v is not None:
            parts.append(f"{f}:{1 if v else 0}")
    score = b.get("score")
    if score is not None:
        parts.append(f"score:{score!r}")
    if b.get("lines") is None:
        parts.append("unsegmented:1")
    return ";".join(parts)


def _parse_custom(s: str) -> dict:
    out: dict = {}
    for item in s.split(";"):
        if ":" not in item:
            continue
        k, v = item.split(":", 1)
        if k in ("kind", "tag_path"):
            out[k] = v
        elif k in _INT_FIELDS:
            out[k] = int(v)
        elif k in _BOOL_FIELDS:
            out[k] = v == "1"
        elif k == "score":
            out[k] = float(v)
        elif k == "unsegmented":
            out[k] = v == "1"
    return out


def _rect_points(x0: int, y0: int, x1: int, y1: int) -> str:
    return f"{x0},{y0} {x1},{y0} {x1},{y1} {x0},{y1}"


# ---------------------------------------------------------------------------
# PAGE-XML
# ---------------------------------------------------------------------------


def page_to_pagexml(row: dict) -> str:
    """One document row (url, blocks, payload_kind, encoding, error,
    warc_ts) -> PAGE-XML string (2019-07-15 layout, layout.py:323-398)."""
    blocks = row["blocks"]
    root = ET.Element("PcGts")
    root.set("xmlns", PAGE_NS)
    meta = ET.SubElement(root, "Metadata")
    ET.SubElement(meta, "Creator").text = "pero_ocr_ray"
    ts = row.get("warc_ts")
    created = ts.isoformat() if ts is not None else _FIXED_CREATED
    ET.SubElement(meta, "Created").text = created
    ET.SubElement(meta, "LastChange").text = created

    page = ET.SubElement(root, "Page")
    page.set("imageFilename", row["url"])
    width = max((int(b.get("src_end") or 0) for b in blocks), default=0)
    height = max((int(b["dom_idx"]) + 1 for b in blocks), default=0)
    page.set("imageWidth", str(width))
    page.set("imageHeight", str(height))
    page.set("custom",
             f"payload_kind:{row.get('payload_kind', '')};"
             f"encoding:{row.get('encoding', '')};"
             f"error:{row.get('error', '')}")

    ordered = sorted((b for b in blocks
                      if b.get("keep") and b.get("order") is not None),
                     key=lambda b: b["order"])
    if ordered:
        ro = ET.SubElement(ET.SubElement(root.find("Page"), "ReadingOrder"),
                           "OrderedGroup")
        ro.set("id", "ro_1")
        for b in ordered:
            ref = ET.SubElement(ro, "RegionRefIndexed")
            ref.set("index", str(b["order"]))
            ref.set("regionRef", b["block_id"])

    for b in blocks:
        region = ET.SubElement(page, "TextRegion")
        region.set("id", b["block_id"])
        region.set("custom", _custom_str(b))
        coords = ET.SubElement(region, "Coords")
        x0 = max(0, int(b.get("src_start") or 0))
        x1 = max(x0, int(b.get("src_end") or 0))
        y0 = int(b["dom_idx"])
        coords.set("points", _rect_points(x0, y0, x1, y0 + 1))
        for j, (text, s0, s1) in enumerate(b.get("lines") or []):
            line = ET.SubElement(region, "TextLine")
            line.set("id", f"{b['block_id']}l{j:03d}")
            line.set("index", str(j))
            baseline = ET.SubElement(line, "Baseline")
            baseline.set("points", f"{s0},{y0} {s1},{y0}")
            te = ET.SubElement(line, "TextEquiv")
            if b.get("score") is not None:
                te.set("conf", f"{b['score']:.3f}")
            _set_text(ET.SubElement(te, "Unicode"), text)
    ET.indent(root)
    return ('<?xml version="1.0" encoding="utf-8"?>\n'
            + ET.tostring(root, encoding="unicode"))


def page_from_pagexml(xml: str) -> dict:
    """PAGE-XML string -> document row dict (url, blocks in DOM order,
    payload_kind, encoding, error). Lenient like the reference reader
    (layout.py:247-321): a TextLine without a Baseline is skipped; a missing
    TextEquiv/Unicode reads as ''."""
    root = ET.fromstring(xml)
    ns = root.tag.rsplit("}", 1)[0] + "}" if "}" in root.tag else ""
    page = root.find(f"{ns}Page")
    url = page.get("imageFilename", "")
    page_custom = _parse_page_custom(page.get("custom", ""))

    order_map: dict[str, int] = {}
    for ref in page.iter(f"{ns}RegionRefIndexed"):
        order_map[ref.get("regionRef", "")] = int(ref.get("index", "0"))

    blocks = []
    for region in page.iter(f"{ns}TextRegion"):
        b = _parse_custom(region.get("custom", ""))
        unsegmented = b.pop("unsegmented", False)
        b["block_id"] = region.get("id", "")
        b.setdefault("kind", "body")
        b.setdefault("tag_path", "")
        b.setdefault("score", 0.0)
        b.setdefault("keep", b["block_id"] in order_map)
        if "order" not in b and b["block_id"] in order_map:
            b["order"] = order_map[b["block_id"]]
        coords = region.find(f"{ns}Coords")
        if coords is not None and "src_start" not in b:
            pts = [p.split(",") for p in coords.get("points", "").split()]
            if pts:
                xs = [int(x) for x, _ in pts]
                ys = [int(y) for _, y in pts]
                b.setdefault("src_start", min(xs))
                b.setdefault("src_end", max(xs))
                b.setdefault("dom_idx", min(ys))
        b.setdefault("dom_idx", len(blocks))
        lines = []
        for line in region.iter(f"{ns}TextLine"):
            baseline = line.find(f"{ns}Baseline")
            if baseline is None:
                continue  # reference behavior: skip baseline-less lines
            pts = [p.split(",") for p in baseline.get("points", "").split()]
            s0 = int(pts[0][0]) if pts else -1
            s1 = int(pts[-1][0]) if pts else -1
            te = line.find(f"{ns}TextEquiv")
            uni = te.find(f"{ns}Unicode") if te is not None else None
            text = _get_text(uni) if uni is not None else ""
            lines.append((text, s0, s1))
        b["lines"] = None if unsegmented else lines
        b["pieces"] = []  # not serialized (see module docstring)
        blocks.append(b)
    blocks.sort(key=lambda b: b["dom_idx"])
    return {"url": url, "blocks": blocks, **page_custom}


def _parse_page_custom(s: str) -> dict:
    out = {"payload_kind": "", "encoding": "", "error": ""}
    for item in s.split(";"):
        if ":" in item:
            k, v = item.split(":", 1)
            if k in out:
                out[k] = v
    return out


# ---------------------------------------------------------------------------
# ALTO
# ---------------------------------------------------------------------------


def _line_lattice(text: str, letters: list[str], salt: str):
    """Deterministic per-char confidence lattice for forced alignment: like
    kernels.beam.text_to_lattice but with md5-derived PER-CHAR noise (each
    character's dominant-class mass differs), so aligned confidences vary
    within a line the way real model posteriors do. Char frame + blank
    frame per character; log-probabilities; blank = last letter."""
    import hashlib
    import numpy as np
    blank = len(letters) - 1
    index = {c: i for i, c in enumerate(letters)}
    frames = []
    for pos, ch in enumerate(text):
        c = index[ch]
        digest = hashlib.md5(f"{salt}:{pos}:{ch}".encode()).digest()
        alt = digest[0] % blank
        noise = 0.05 + (digest[1] % 40) / 100.0   # 0.05 .. 0.44 per char
        p = np.full(len(letters), 1e-9)
        if alt == c:
            p[c] = 1.0
        else:
            p[c] = 1.0 - noise
            p[alt] = noise
        p /= p.sum()
        frames.append(np.log(p))
        pb = np.full(len(letters), 1e-9)
        pb[blank] = 1.0
        pb /= pb.sum()
        frames.append(np.log(pb))
    return np.asarray(frames)


def aligned_line_confidences(row: dict, max_align_chars: int = 1024) -> dict:
    """Per-line per-character confidences via CTC Viterbi forced alignment
    (F2 — the ALTO confidence source the reference computes at
    /root/reference/pero_ocr/core/layout.py:491-540 with ``align_text``):
    each kept line's text is aligned against its deterministic confidence
    lattice, and each character's confidence is its class probability at
    the best aligned frame. -> {(block_id, line_idx): np.ndarray}.

    Skew guard: the Viterbi DP is quadratic in line length, so lines over
    ``max_align_chars`` are skipped (they fall back to the block score in
    the writer) — the alignment analog of the reference's input caps
    (Mpx downsample, chunk-split), keeping a 500 KB single-paragraph page
    from dominating the stage."""
    from pero_ocr_ray.kernels.beam import BLANK
    from pero_ocr_ray.kernels.ctc_align import ctc_char_confidences
    out = {}
    for b in row["blocks"]:
        if not b.get("keep"):
            continue
        for j, (text, _s0, _s1) in enumerate(b.get("lines") or []):
            if not text or text.strip() == "":
                continue
            if len(text) > max_align_chars:
                continue  # quadratic-DP guard; writer falls back to score
            letters = sorted(set(text)) + [BLANK]
            lattice = _line_lattice(
                text, letters, f"{row['url']}:{b['block_id']}:{j}")
            index = {c: i for i, c in enumerate(letters)}
            symbols = [index[ch] for ch in text]
            out[(b["block_id"], j)] = ctc_char_confidences(
                -lattice, symbols, len(letters) - 1)
    return out


def _word_confidence(confs, start: int, length: int) -> float:
    """Median of one word's aligned char confidences (the reference's
    .50-quantile per word, layout.py:540)."""
    import numpy as np
    return float(np.quantile(confs[start:start + length], .50))


def page_to_alto(row: dict, min_line_confidence: float = 0.0,
                 line_confidences: dict | None = None) -> str:
    """Document row -> ALTO v2 string (kept blocks in reading order), the
    analog of layout.py:400-597: Description/Layout/Page with margins +
    PrintSpace accumulated from block rects, TextBlock/TextLine/String/SP
    with word geometry and WC word confidences; empty lines are skipped and
    ``min_line_confidence`` drops low-confidence lines (same parameter).

    ``line_confidences`` (from :func:`aligned_line_confidences`) supplies
    per-char CTC-aligned confidences keyed by (block_id, line_idx): when a
    line has them, WC per word is the word's median char confidence and the
    line gate uses the line's median — otherwise the block keep-score is
    used for both (the no-logits fallback)."""
    blocks = [b for b in row["blocks"]
              if b.get("keep") and b.get("order") is not None]
    blocks.sort(key=lambda b: b["order"])

    root = ET.Element("alto")
    root.set("xmlns", ALTO_NS)
    desc = ET.SubElement(root, "Description")
    ET.SubElement(desc, "MeasurementUnit").text = "pixel"
    src = ET.SubElement(desc, "sourceImageInformation")
    ET.SubElement(src, "fileName").text = row["url"]

    layout = ET.SubElement(root, "Layout")
    page = ET.SubElement(layout, "Page")
    page.set("ID", "id_" + _ALTO_ID_SUB.sub("_", row["url"]))
    page.set("PHYSICAL_IMG_NR", "1")
    page_h = max((int(b["dom_idx"]) + 1 for b in row["blocks"]), default=0)
    page_w = max((int(b.get("src_end") or 0) for b in row["blocks"]), default=0)
    page.set("HEIGHT", str(page_h))
    page.set("WIDTH", str(page_w))

    top = ET.SubElement(page, "TopMargin")
    left = ET.SubElement(page, "LeftMargin")
    right = ET.SubElement(page, "RightMargin")
    bottom = ET.SubElement(page, "BottomMargin")
    print_space = ET.SubElement(page, "PrintSpace")

    ps_h, ps_w, ps_v, ps_hp = 0, 0, page_h, page_w
    for b in blocks:
        tb = ET.SubElement(print_space, "TextBlock")
        tb.set("ID", f"block_{b['block_id']}")
        x0 = max(0, int(b.get("src_start") or 0))
        x1 = max(x0, int(b.get("src_end") or 0))
        y0 = int(b["dom_idx"])
        tb_h, tb_w, tb_v, tb_hp = 1, x1 - x0, y0, x0
        tb.set("HEIGHT", str(tb_h))
        tb.set("WIDTH", str(tb_w))
        tb.set("VPOS", str(tb_v))
        tb.set("HPOS", str(tb_hp))
        # the reference's running PrintSpace accumulation (layout.py:449-454)
        ps_h = max(ps_v + ps_h, tb_v + tb_h)
        ps_w = max(ps_hp + ps_w, tb_hp + tb_w)
        ps_v = min(ps_v, tb_v)
        ps_hp = min(ps_hp, tb_hp)
        ps_h -= ps_v
        ps_w -= ps_hp

        score = float(b.get("score") or 0.0)
        for j, (text, s0, s1) in enumerate(b.get("lines") or []):
            if not text or text.strip() == "":
                continue  # reference: empty transcriptions are not exported
            confs = (line_confidences or {}).get((b["block_id"], j))
            line_conf = (_word_confidence(confs, 0, len(confs))
                         if confs is not None else score)
            if line_conf < min_line_confidence:
                continue
            tl = ET.SubElement(tb, "TextLine")
            tl.set("BASELINE", str(y0))
            tl.set("VPOS", str(y0))
            tl.set("HPOS", str(max(0, s0)))
            tl.set("HEIGHT", "1")
            tl.set("WIDTH", str(max(0, s1 - s0)))
            words = text.split(" ")
            pos = 0
            base = max(0, s0)
            for w, word in enumerate(words):
                if word:
                    st = ET.SubElement(tl, "String")
                    st.set("CONTENT", word)
                    st.set("HEIGHT", "1")
                    st.set("WIDTH", str(len(word)))
                    st.set("VPOS", str(y0))
                    st.set("HPOS", str(base + pos))
                    wc = (_word_confidence(confs, pos, len(word))
                          if confs is not None else score)
                    st.set("WC", str(round(wc, 2)))
                pos += len(word)
                if w != len(words) - 1:
                    sp = ET.SubElement(tl, "SP")
                    sp.set("WIDTH", "1")
                    sp.set("VPOS", str(y0))
                    sp.set("HPOS", str(base + pos))
                    pos += 1

    top.set("HEIGHT", str(ps_v)); top.set("WIDTH", str(page_w))
    top.set("VPOS", "0"); top.set("HPOS", "0")
    left.set("HEIGHT", str(page_h)); left.set("WIDTH", str(ps_hp))
    left.set("VPOS", "0"); left.set("HPOS", "0")
    right.set("HEIGHT", str(page_h))
    right.set("WIDTH", str(max(0, page_w - (ps_hp + ps_w))))
    right.set("VPOS", "0"); right.set("HPOS", str(ps_hp + ps_w))
    bottom.set("HEIGHT", str(max(0, page_h - (ps_v + ps_h))))
    bottom.set("WIDTH", str(page_w))
    bottom.set("VPOS", str(ps_v + ps_h)); bottom.set("HPOS", "0")
    print_space.set("HEIGHT", str(ps_h)); print_space.set("WIDTH", str(ps_w))
    print_space.set("VPOS", str(ps_v)); print_space.set("HPOS", str(ps_hp))
    ET.indent(root)
    return ('<?xml version="1.0" encoding="utf-8"?>\n'
            + ET.tostring(root, encoding="unicode"))


def alto_to_lines(xml: str) -> list[dict]:
    """ALTO reader (S3): -> one dict per line {url, block_id, line_text, wc}
    with words rejoined by single spaces (the String/SP inverse)."""
    root = ET.fromstring(xml)
    ns = root.tag.rsplit("}", 1)[0] + "}" if "}" in root.tag else ""
    fn = root.find(f"{ns}Description/{ns}sourceImageInformation/{ns}fileName")
    url = fn.text if fn is not None and fn.text else ""
    out = []
    for tb in root.iter(f"{ns}TextBlock"):
        block_id = (tb.get("ID") or "").removeprefix("block_")
        for tl in tb.iter(f"{ns}TextLine"):
            words, wcs = [], []
            for child in tl:
                if _local(child.tag) == "String":
                    words.append(child.get("CONTENT", ""))
                    if child.get("WC") is not None:
                        wcs.append(float(child.get("WC")))
            out.append({
                "url": url,
                "block_id": block_id,
                "line_text": " ".join(words),
                "wc": min(wcs) if wcs else None,
            })
    return out


# ---------------------------------------------------------------------------
# Ray stages (vector stages over the staged nested-blocks batches)
# ---------------------------------------------------------------------------


def _rows_from_blocks_batch(batch: pa.Table) -> list[dict]:
    from pero_ocr_ray.stages.extract import _blocks_from_arrow
    docs = _blocks_from_arrow(batch.column("blocks"))
    names = batch.column_names
    rows = []
    for i, blocks in enumerate(docs):
        rows.append({
            "url": batch.column("url")[i].as_py(),
            "blocks": blocks,
            "payload_kind": (batch.column("payload_kind")[i].as_py()
                             if "payload_kind" in names else ""),
            "encoding": (batch.column("encoding")[i].as_py()
                         if "encoding" in names else ""),
            "error": (batch.column("error")[i].as_py()
                      if "error" in names else ""),
            "warc_ts": (batch.column("warc_ts")[i].as_py()
                        if "warc_ts" in names else None),
        })
    return rows


def to_pagexml_stage(batch: pa.Table, cfg=None) -> pa.Table:
    """Nested-blocks batch -> (passthrough cols, pagexml:string)."""
    from pero_ocr_ray.stages.extract import _passthrough
    rows = _rows_from_blocks_batch(batch)
    cols = _passthrough(batch)
    cols["pagexml"] = pa.array([page_to_pagexml(r) for r in rows],
                               pa.string())
    return pa.table(cols)


def from_pagexml_stage(batch: pa.Table, cfg=None) -> pa.Table:
    """(pagexml:string, passthrough) -> nested-blocks batch shaped exactly
    like parse/segment/classify output, ready for emit_stage."""
    from pero_ocr_ray.stages.extract import _blocks_to_arrow, _passthrough
    rows = [page_from_pagexml(x)
            for x in batch.column("pagexml").to_pylist()]
    cols = _passthrough(batch)
    if "url" not in cols:
        cols["url"] = pa.array([r["url"] for r in rows], pa.string())
    cols.update(
        payload_kind=pa.array([r["payload_kind"] for r in rows], pa.string()),
        encoding=pa.array([r["encoding"] for r in rows], pa.string()),
        error=pa.array([r["error"] for r in rows], pa.string()),
        blocks=_blocks_to_arrow([r["blocks"] for r in rows]),
    )
    return pa.table(cols)


def to_alto_stage(batch: pa.Table, cfg=None,
                  min_line_confidence: float = 0.0) -> pa.Table:
    """Nested-blocks batch -> (passthrough cols, alto:string)."""
    from pero_ocr_ray.stages.extract import _passthrough
    rows = _rows_from_blocks_batch(batch)
    cols = _passthrough(batch)
    cols["alto"] = pa.array(
        [page_to_alto(r, min_line_confidence) for r in rows], pa.string())
    return pa.table(cols)


def to_alto_aligned_stage(batch: pa.Table, cfg=None,
                          min_line_confidence: float = 0.0) -> pa.Table:
    """ALTO writer with CTC-aligned word confidences: WC values come from
    Viterbi forced alignment of each line against its confidence lattice
    (:func:`aligned_line_confidences`) instead of the block keep-score."""
    from pero_ocr_ray.stages.extract import _passthrough
    rows = _rows_from_blocks_batch(batch)
    cols = _passthrough(batch)
    cols["alto"] = pa.array(
        [page_to_alto(r, min_line_confidence, aligned_line_confidences(r))
         for r in rows], pa.string())
    return pa.table(cols)


def read_pagexml_files(paths: list[str] | str):
    """PAGE-XML file corpus -> nested-blocks Dataset (S2 as a real source)."""
    import ray.data as rd
    if isinstance(paths, str):
        paths = [paths]
    files = rd.read_binary_files(sorted(paths))

    def parse(batch: pa.Table) -> pa.Table:
        from pero_ocr_ray.stages.extract import _blocks_to_arrow
        rows = [page_from_pagexml(data.decode("utf-8"))
                for data in batch.column("bytes").to_pylist()]
        return pa.table({
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "payload_kind": pa.array([r["payload_kind"] for r in rows],
                                     pa.string()),
            "encoding": pa.array([r["encoding"] for r in rows], pa.string()),
            "error": pa.array([r["error"] for r in rows], pa.string()),
            "blocks": _blocks_to_arrow([r["blocks"] for r in rows]),
        })

    return files.map_batches(parse, batch_format="pyarrow")


def write_xml_files(ds, out_dir: str, column: str = "pagexml",
                    suffix: str = ".xml"):
    """Write one XML file per row (named by md5(url)) — the per-page file
    sink shape of the reference's parse_folder output writers. Returns a
    manifest Dataset (url, path)."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        paths = []
        for url, xml in zip(urls, batch.column(column).to_pylist()):
            name = hashlib.md5(url.encode("utf-8")).hexdigest() + suffix
            path = os.path.join(out_dir, name)
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write(xml)
            os.replace(tmp, path)
            paths.append(path)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "path": pa.array(paths, pa.string())})

    return ds.map_batches(write, batch_format="pyarrow")
