"""Link-graph operators: kernel resolution rules, linked-template
extraction, host edges, and exact integer PageRank (distributed ==
sequential replay)."""

from __future__ import annotations

import collections

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from pero_ocr_ray.functions.linkgraph import (
    BASE_MICRO, TELEPORT_MICRO, host_edges, link_table, pagerank_hosts,
)
from pero_ocr_ray.kernels.links import extract_links, resolve_href, split_base


# ---------------------------------------------------------------- kernel

BASE = split_base("https://h.example/a/b/page.html?x=1#frag")


def test_split_base_directory():
    assert BASE == ("https", "h.example", "/a/b/")
    assert split_base("https://h.example") == ("https", "h.example", "/")
    assert split_base("not a url") == ("", "", "/")


@pytest.mark.parametrize("href,expect", [
    ("https://o.example/p", "https://o.example/p"),
    ("http://o.example/p#frag", "http://o.example/p"),
    # schemes are case-insensitive (RFC 3986 §3.1): absolute stays
    # absolute, scheme lowercased; uppercase non-links still drop
    ("HTTPS://o.example/p", "https://o.example/p"),
    ("HtTp://o.example/q", "http://o.example/q"),
    ("MAILTO:x@example.com", None),
    ("JavaScript:void(0)", None),
    ("//cdn.example/x", "https://cdn.example/x"),
    ("/root/y", "https://h.example/root/y"),
    ("rel/z", "https://h.example/a/b/rel/z"),
    ("../up", "https://h.example/a/up"),
    ("../../../over", "https://h.example/over"),
    ("./same", "https://h.example/a/b/same"),
    ("?q=2", "https://h.example/a/b/?q=2"),
    ("rel/z?q=1", "https://h.example/a/b/rel/z?q=1"),
    ("#frag", None),
    ("", None),
    ("mailto:x@example.com", None),
    ("javascript:void(0)", None),
    ("data:text/plain,hi", None),
    ("tel:+1555", None),
])
def test_resolve_href(href, expect):
    assert resolve_href(href, *BASE) == expect


def test_extract_links_dedup_order_and_skip_subtrees():
    html = (
        '<html><body>'
        '<script>var a = \'<a href="https://bad.example/x">\';</script>'
        '<noscript><a href="/invisible">n</a></noscript>'
        '<a href="/one">1</a>'
        '<a href="https://o.example/two">2</a>'
        '<a href="/one">dup</a>'
        '<a href="#top">frag</a>'
        '<a>no href</a>'
        '</body></html>'
    )
    got = extract_links(html, "https://h.example/dir/page")
    assert got == ["https://h.example/one", "https://o.example/two"]


def test_extract_links_unparseable_base_keeps_absolute_only():
    html = '<a href="/rel">r</a><a href="https://o.example/a">a</a>'
    assert extract_links(html, "garbage") == ["https://o.example/a"]


# ------------------------------------------------- linked-template parity

def _linked_pages(n: int = 40) -> pa.Table:
    from pero_ocr_ray.sources.pages import pages_from_documents
    docs = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array([f"body text {i}" for i in range(n)], pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })
    return pages_from_documents(docs, "linked")


def _expected_links(doc_id: int) -> list[str]:
    n_out = 1 + doc_id % 5
    out = [f"https://site{(doc_id * 7 + k) % 97}.example/p/{doc_id}-{k}"
           for k in range(1, n_out + 1)]
    out.append(f"https://site{doc_id % 97}.example/p/self-{doc_id}")
    return out


def test_link_table_matches_closed_form():
    pages = _linked_pages(40)
    got = (link_table(rd.from_arrow(pages).repartition(4))
           .to_pandas()
           .sort_values(["src_url", "out_idx"], ignore_index=True))
    rows = []
    for i in range(40):
        for j, href in enumerate(_expected_links(i)):
            rows.append((f"https://site{i % 97}.example/d/{i}", j, href))
    want = (pd.DataFrame(rows, columns=["src_url", "out_idx", "href"])
            .sort_values(["src_url", "out_idx"], ignore_index=True))
    want["out_idx"] = want["out_idx"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


# ----------------------------------------------------- edges + pagerank

def _seq_pagerank(edges: list[tuple[str, str, int]],
                  n_iter: int) -> dict[str, int]:
    W: dict[str, int] = collections.defaultdict(int)
    hosts = set()
    for s, d, w in edges:
        W[s] += w
        hosts.add(s)
        hosts.add(d)
    r = {h: BASE_MICRO for h in hosts}
    for _ in range(n_iter):
        S: dict[str, int] = collections.defaultdict(int)
        for s, d, w in edges:
            S[d] += (r[s] * w) // W[s]
        r = {h: TELEPORT_MICRO + (85 * S.get(h, 0)) // 100 for h in hosts}
    return r


def test_host_edges_and_pagerank_match_sequential_replay():
    pages = _linked_pages(60)
    links = link_table(rd.from_arrow(pages).repartition(4))
    edges_ds = host_edges(links).materialize()
    edges = [(r["src_host"], r["dst_host"], int(r["weight"]))
             for r in edges_ds.take_all()]

    # edges themselves match a pandas replay of the closed form
    want_edges = collections.Counter()
    for i in range(60):
        src = f"site{i % 97}.example"
        for href in _expected_links(i):
            dst = href.split("//")[1].split("/")[0]
            want_edges[(src, dst)] += 1
    assert collections.Counter({(s, d): w for s, d, w in edges}) == want_edges

    got = {r["host"]: int(r["rank_micro"])
           for r in pagerank_hosts(edges_ds, n_iter=3,
                                   num_buckets=8).take_all()}
    assert got == _seq_pagerank(edges, 3)


def test_pagerank_hot_dst_and_dangling():
    # every host links to 'hub'; 'hub' itself links nowhere (dangling);
    # 'iso' appears only as a dst. Exact equality with the replay, and
    # the hub must outrank every spoke.
    edges = [(f"s{i}", "hub", 1 + i % 3) for i in range(20)]
    edges.append(("s0", "iso", 1))
    tbl = pa.table({
        "src_host": pa.array([e[0] for e in edges], pa.string()),
        "dst_host": pa.array([e[1] for e in edges], pa.string()),
        "weight": pa.array([e[2] for e in edges], pa.int64()),
    })
    ds = rd.from_arrow(tbl).repartition(3)
    got = {r["host"]: int(r["rank_micro"])
           for r in pagerank_hosts(ds, n_iter=5, num_buckets=4).take_all()}
    want = _seq_pagerank(edges, 5)
    assert got == want
    assert got["hub"] > max(v for h, v in got.items() if h != "hub")
    assert got["s1"] == TELEPORT_MICRO  # spokes have no in-links


def test_extract_anchor_texts_occurrences():
    from pero_ocr_ray.kernels.links import extract_anchor_texts
    html = (
        '<a href="/one"><b>First</b> link</a>'
        '<a href="/one">First link</a>'          # same pair again
        '<a href="#frag">dropped text</a>'
        '<a href="/two">unclosed implies close'
        '<a href="/three"></a>'                   # empty text kept
        '<script><a href="/bad">x</a></script>'
    )
    got = extract_anchor_texts(html, "https://h.example/p/")
    assert got == [
        ("https://h.example/one", "First link"),
        ("https://h.example/one", "First link"),
        ("https://h.example/two", "unclosed implies close"),
        ("https://h.example/three", ""),
    ]


def test_anchor_text_counts_aggregates():
    from pero_ocr_ray.functions.linkgraph import anchor_text_counts
    pages = _linked_pages(30)
    got = {(r["href"], r["anchor_text"]): r["n"]
           for r in anchor_text_counts(
               rd.from_arrow(pages).repartition(4)).take_all()}
    for i in range(30):
        n_out = 1 + i % 5
        for k in range(1, n_out + 1):
            href = f"https://site{(i * 7 + k) % 97}.example/p/{i}-{k}"
            assert got[(href, f"l{k}")] == (2 if k == 1 else 1)
        assert got[(f"https://site{i % 97}.example/p/self-{i}",
                    "self")] == 1
    assert sum(got.values()) == sum(3 + i % 5 for i in range(30))


def test_top_hosts_by_rank_matches_sorted_cut():
    from pero_ocr_ray.functions.linkgraph import top_hosts_by_rank
    edges = [(f"s{i}", f"hub{i % 3}", 1 + i % 4) for i in range(24)]
    tbl = pa.table({
        "src_host": pa.array([e[0] for e in edges], pa.string()),
        "dst_host": pa.array([e[1] for e in edges], pa.string()),
        "weight": pa.array([e[2] for e in edges], pa.int64()),
    })
    ranks = pagerank_hosts(rd.from_arrow(tbl).repartition(3), n_iter=3,
                           num_buckets=4)
    got = [(r["host"], r["rank_micro"])
           for r in top_hosts_by_rank(ranks, k=4).take_all()]
    want = sorted(_seq_pagerank(edges, 3).items(),
                  key=lambda kv: (-kv[1], kv[0]))[:4]
    assert got == want
