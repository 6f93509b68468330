"""Deterministic synthetic ``pages`` tables (FIXTURES.md case catalog).

Schema per BASELINE.json ``input_hint``::

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string
    (+ row_id:int64 lineage column so duplicate-url rows stay addressable)

Every case mirrors a behavior of the reference pipeline (citations in
FIXTURES.md). Generation is pure: row ``i`` of a given seed is always the
same bytes — the oracle goldens, the Ray pipeline, the bench and the
correctness driver all see identical inputs with no stored fixtures.
"""

from __future__ import annotations

import datetime
import html as html_mod
import random
import zlib

import pyarrow as pa

_WORDS = (
    "data stream table merge sort filter batch query window group join key "
    "row column value index scan shuffle block page text line word char span "
    "order part small large fast slow deep wide open close read write"
).split()

_ARABIC = "السلام عليكم هذا نص تجريبي للمحتوى العربي مع كلمات كثيرة".split()

CASES = [
    "simple", "boilerplate", "multicolumn", "edge_fragment", "short_page",
    "empty", "split_inline", "tie_order", "rtl_arabic", "long_page",
    "malformed", "bad_bytes", "pdf_payload", "dup_url", "nested_table",
    "pre_code", "links_only", "confidence_like",
]

_EPOCH = datetime.datetime(2026, 1, 1)


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choices(_WORDS, k=n))  # C-speed sampling


def _para(rng: random.Random, n: int = 14) -> str:
    return f"<p>{_words(rng, n)}</p>"


def make_pdf(lines: list[str], compress: bool) -> bytes:
    """Tiny synthetic single-page PDF with a known text stream."""
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for j, line in enumerate(lines):
        if j:
            ops.append("0 -14 Td")
        esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ops.append(f"({esc}) Tj")
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    head = (b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    stream = (b"4 0 obj\n<< " + filt + b"/Length " + str(len(content)).encode()
              + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    return head + stream + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"


def _build_case(case: str, rng: random.Random, i: int) -> tuple[bytes, str, str]:
    """-> (html bytes, plain text payload, lang)."""
    lang = ["en", "cs", "de", "ar", ""][i % 5]
    E = html_mod.escape

    if case == "simple":
        paras = [_words(rng, 14) for _ in range(3)]
        title = _words(rng, 4)
        body = "".join(f"<p>{E(p)}</p>" for p in paras)
        doc = (f"<html><head><title>{E(title)}</title></head>"
               f"<body><article>{body}</article></body></html>")
        return doc.encode(), "\n".join(paras), lang

    if case == "boilerplate":
        nav = "".join(f'<a href="/{w}">{w}</a> ' for w in rng.sample(_WORDS, 8))
        paras = [_words(rng, 16) for _ in range(3)]
        body = "".join(f"<p>{E(p)}</p>" for p in paras)
        doc = (f"<html><body><header><nav>{nav}</nav></header>"
               f"<main><article>{body}</article></main>"
               f"<aside>{nav}</aside><footer><nav>{nav}</nav></footer>"
               f"</body></html>")
        return doc.encode(), "\n".join(paras), lang

    if case == "multicolumn":
        ncols = 2 + (i % 2)
        cols = []
        texts = []
        for c in range(ncols):
            paras = [_words(rng, 10) for _ in range(3)]
            texts.extend(paras)
            cols.append('<div class="col">' +
                        "".join(f"<p>{E(p)}</p>" for p in paras) + "</div>")
        doc = f'<html><body><div class="row">{"".join(cols)}</div></body></html>'
        return doc.encode(), "\n".join(texts), lang

    if case == "edge_fragment":
        paras = [_words(rng, 15) for _ in range(2)]
        body = "".join(f"<p>{E(p)}</p>" for p in paras)
        doc = (f"<html><body><div>Home » {rng.choice(_WORDS)}</div>"
               f"<article>{body}</article><div>© site</div></body></html>")
        return doc.encode(), "\n".join(paras), lang

    if case == "short_page":
        short = _words(rng, 2)
        doc = f"<html><body><p>{E(short)}</p></body></html>"
        return doc.encode(), short, lang

    if case == "empty":
        doc = "<html><head><meta charset='utf-8'></head><body><div>  </div></body></html>"
        return doc.encode(), "", lang

    if case == "split_inline":
        words = [rng.choice(_WORDS) for _ in range(18)]
        frags = []
        for j, w in enumerate(words):
            tag = ["b", "i", "span", "em"][j % 4]
            frags.append(f"<{tag}>{w}</{tag}>" if j % 2 else w)
        doc = f"<html><body><article><p>{' '.join(frags)}</p></article></body></html>"
        return doc.encode(), " ".join(words), lang

    if case == "tie_order":
        paras = [f"tie {j} " + _words(rng, 8) for j in range(4)]
        body = "".join(f'<div class="same"><p>{E(p)}</p></div>' for p in paras)
        doc = f"<html><body>{body}</body></html>"
        return doc.encode(), "\n".join(paras), lang

    if case == "rtl_arabic":
        mixed = []
        for j in range(3):
            ws = [rng.choice(_ARABIC) for _ in range(10)]
            ws.insert(5, rng.choice(_WORDS))
            mixed.append(" ".join(ws))
        body = "".join(f'<p dir="rtl">{E(p)}</p>' for p in mixed)
        doc = f'<html lang="ar"><body><article>{body}</article></body></html>'
        return doc.encode(), "\n".join(mixed), "ar"

    if case == "long_page":
        paras = [_words(rng, 380) for _ in range(200)]  # ≈ 500 KB total
        body = "".join(f"<p>{E(p)}</p>" for p in paras)
        doc = f"<html><body><article>{body}</article></body></html>"
        return doc.encode(), "\n".join(paras), lang

    if case == "malformed":
        w = [_words(rng, 12) for _ in range(3)]
        doc = (f"<html><body><p>{E(w[0])}<p>{E(w[1])} & more"
               f"<div>{E(w[2])}</p> trailing &am text<br><span>unclosed")
        return doc.encode(), "\n".join(w), lang

    if case == "bad_bytes":
        latin = "café résumé naïve " + _words(rng, 10)
        doc = ('<html><head><meta charset="iso-8859-1"></head>'
               f"<body><article><p>{E(latin)}</p></article></body></html>")
        return doc.encode("iso-8859-1"), latin, lang

    if case == "pdf_payload":
        lines = [_words(rng, 8) for _ in range(4)]
        return make_pdf(lines, compress=bool(i % 2)), "\n".join(lines), lang

    if case == "dup_url":  # url fixed up by the table builder
        paras = [_words(rng, 12) for _ in range(2)]
        body = "".join(f"<p>{E(p)}</p>" for p in paras)
        doc = f"<html><body><article>{body}</article></body></html>"
        return doc.encode(), "\n".join(paras), lang

    if case == "nested_table":
        inner = "".join(f"<td>{E(_words(rng, 6))}</td>" for _ in range(2))
        cell = _words(rng, 9)
        doc = ("<html><body><table><tr><td>"
               f"<table><tr>{inner}</tr></table></td>"
               f"<td>{E(cell)}</td></tr></table></body></html>")
        return doc.encode(), cell, lang

    if case == "pre_code":
        code = "def f(x):\n    return  x * 2\n\n  # indented   comment"
        para = _words(rng, 12)
        doc = (f"<html><body><article><p>{E(para)}</p>"
               f"<pre><code>{E(code)}</code></pre></article></body></html>")
        return doc.encode(), para + "\n" + code, lang

    if case == "links_only":
        items = "".join(f'<li><a href="/{j}">{rng.choice(_WORDS)} {j}</a></li>'
                        for j in range(120))
        doc = f"<html><body><ul>{items}</ul></body></html>"
        return doc.encode(), "", lang

    if case == "confidence_like":
        keep_p = _words(rng, 30)
        near_keep = "x" * 25      # aside block just above threshold
        near_drop = "y" * 12      # aside block just below threshold
        doc = (f"<html><body><article><p>{E(keep_p)}</p></article>"
               f"<aside><p>{near_keep}</p><p>{near_drop}</p></aside></body></html>")
        return doc.encode(), keep_p, lang

    raise ValueError(f"unknown case {case!r}")


def synthesize_pages(n_rows: int, seed: int = 42) -> pa.Table:
    """Deterministic pages table with the full case catalog (tests/bench)."""
    urls, tss, htmls, texts, langs, row_ids = [], [], [], [], [], []
    for i in range(n_rows):
        case = CASES[i % len(CASES)]
        rng = random.Random(seed * 1_000_003 + i)
        html_bytes, text, lang = _build_case(case, rng, i)
        if case == "dup_url" and i > 0:
            url = urls[-1]  # duplicate of the previous row's url
        else:
            url = f"https://site{i % 97}.example/{case}/{i}"
        urls.append(url)
        tss.append(_EPOCH + datetime.timedelta(seconds=137 * i))
        htmls.append(html_bytes)
        texts.append(text)
        langs.append(lang)
        row_ids.append(i)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "row_id": pa.array(row_ids, pa.int64()),
    })


def pages_from_documents(documents: pa.Table, template: str = "simple") -> pa.Table:
    """Deterministic pages table derived from a ``documents`` table.

    ``template='simple'`` wraps each document's text in a single
    ``<article><p>…</p></article>`` (no boilerplate) so the extraction result
    is exactly the whitespace-canonicalized document text — SQL-expressible
    for the correctness oracle. ``template='chunks'`` splits the text into
    10-token paragraphs, one ``<p>`` each — a MULTI-block page whose
    per-block features (and hence classifier scores / page quality) are
    still SQL-expressible. ``template='linked'`` adds a closed-form
    ``<nav>`` of out-links ahead of the article so the link-graph
    operators (``functions/linkgraph.py``) have SQL-regenerable edges.
    ``template='cases'`` cycles the full case
    catalog, seeded per ``doc_id``: the html payload is synthetic case
    content (NOT the document text) sharing only the url/row_id keys — it
    exists to exercise merge/compare plumbing across two runs of the same
    url set, not to compare equal texts.
    """
    doc_ids = documents.column("doc_id").to_pylist()
    texts = documents.column("text").to_pylist()
    langs = (documents.column("lang").to_pylist()
             if "lang" in documents.column_names else [""] * len(doc_ids))
    urls, tss, htmls, row_ids = [], [], [], []
    for did, text in zip(doc_ids, texts):
        urls.append(f"https://site{did % 97}.example/d/{did}")
        tss.append(_EPOCH + datetime.timedelta(seconds=137 * did))
        if template == "simple":
            doc = (f"<html><body><article><p>{html_mod.escape(text)}</p>"
                   f"</article></body></html>")
            htmls.append(doc.encode())
        elif template == "chunks":
            # TOKEN_RE, not str.split(): Python splits on Unicode
            # whitespace while the SQL oracle's \S+ is ASCII — the shared
            # regex keeps both sides identical on non-ASCII corpora
            from pero_ocr_ray.kernels.textstats import TOKEN_RE
            toks = TOKEN_RE.findall(text)
            paras = [" ".join(toks[j:j + 10]) for j in range(0, len(toks), 10)]
            body = "".join(f"<p>{html_mod.escape(p)}</p>" for p in paras)
            doc = f"<html><body><article>{body}</article></body></html>"
            htmls.append(doc.encode())
        elif template == "linked":
            # closed-form out-links so the SQL oracle regenerates them
            # exactly: link k (1-based, k <= 1 + doc_id % 5) targets host
            # (doc_id*7+k) % 97 at path /p/{doc_id}-{k}; then a
            # root-relative self link (resolution), a duplicate of link 1
            # (first-wins dedup) and fragment/mailto anchors (drop rules).
            n_out = 1 + did % 5
            anchors = [
                f'<a href="https://site{(did * 7 + k) % 97}.example'
                f'/p/{did}-{k}">l{k}</a>'
                for k in range(1, n_out + 1)
            ]
            anchors.append(f'<a href="/p/self-{did}">self</a>')
            anchors.append(anchors[0])
            anchors.append('<a href="#top">top</a>')
            anchors.append('<a href="mailto:x@example.com">mail</a>')
            doc = (f"<html><body><nav>{' '.join(anchors)}</nav>"
                   f"<article><p>{html_mod.escape(text)}</p></article>"
                   f"</body></html>")
            htmls.append(doc.encode())
        else:
            rng = random.Random(777 + did)
            case = CASES[did % len(CASES)]
            base, _, _ = _build_case(case, rng, did)
            htmls.append(base)
        row_ids.append(did)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "row_id": pa.array(row_ids, pa.int64()),
    })
