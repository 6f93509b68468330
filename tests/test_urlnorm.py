"""URL canonicalization: kernel rules, vectorized == sequential, dedup."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data as rd

from pero_ocr_ray.functions.domains import (
    canonical_dedup_groups, canonicalize_urls,
)
from pero_ocr_ray.kernels.urlnorm import canonical_url


@pytest.mark.parametrize("url,expect", [
    ("HTTPS://Site.Example:443/a//b?utm_source=x&q=1#frag",
     "https://site.example/a/b?q=1"),
    ("http://h.example:80", "http://h.example"),
    ("http://h.example:80/p", "http://h.example/p"),
    ("https://h.example:8443/p", "https://h.example:8443/p"),  # non-default
    ("https://h.example/?utm_a=1&utm_b=2", "https://h.example/"),
    ("https://h.example/p?a=1&utm_campaign=x&b=2",
     "https://h.example/p?a=1&b=2"),
    ("https://h.example/p?fbclid=", "https://h.example/p"),
    ("https://h.example///", "https://h.example/"),
    ("ftp://H.EX/path//x", "ftp://h.ex/path/x"),
    ("not a url at all", "not a url at all"),
    ("", ""),
    ("HTTP://A.B:80?x=1", "http://a.b?x=1"),
    # :80 on https is NOT default — kept
    ("https://h.example:80/p", "https://h.example:80/p"),
])
def test_canonical_url_rules(url, expect):
    assert canonical_url(url) == expect


def test_canonical_url_idempotent():
    urls = ["HTTPS://Site.Example:443/a//b?utm_source=x&q=1#f",
            "http://h.example:80/p?utm_a=&b=2#x",
            "https://h.example/p?gclid=1&msclkid=2"]
    for u in urls:
        once = canonical_url(u)
        assert canonical_url(once) == once


def test_vectorized_matches_sequential_kernel():
    urls = [
        "HTTPS://SITE3.EXAMPLE:443/d/4?utm_source=feed&utm_medium=rss",
        "http://site1.example:80/d//7#sec",
        "https://site0.example/d/0",
        "https://site2.example/d/9?a=1&utm_campaign=x&b=2",
        "https://site5.example/d/2?fbclid=c77",
        "garbage", "",
    ] * 5
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(urls))), pa.int64()),
        "url": pa.array(urls, pa.string()),
    })).repartition(3)
    got = canonicalize_urls(ds).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert list(got["canon_url"]) == [canonical_url(u) for u in urls]


def test_canonical_dedup_groups():
    # three raw spellings of one resource + one distinct resource
    urls = ["https://h.example/p", "HTTPS://h.example:443/p",
            "https://h.example/p?utm_source=x", "https://h.example/q"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([3, 1, 2, 0], pa.int64()),
        "url": pa.array(urls, pa.string()),
    })).repartition(2)
    got = {r["canon_url"]: (r["n_urls"], r["min_id"])
           for r in canonical_dedup_groups(ds).take_all()}
    assert got == {"https://h.example/p": (3, 1),
                   "https://h.example/q": (1, 0)}


def test_filter_blocked_urls():
    from pero_ocr_ray.functions.domains import filter_blocked_urls
    urls = ["https://bad.example/a", "https://ok.example/a",
            "https://ok.example/ads/banner", "https://ok.example/b",
            "no host here"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "url": pa.array(urls, pa.string()),
    })).repartition(2)
    got = sorted(r["doc_id"] for r in filter_blocked_urls(
        ds, {"bad.example"}, path_re=r"/ads/").take_all())
    assert got == [1, 3, 4]  # host-blocked 0, path-blocked 2; hostless kept
