"""Anchor-extraction kernel: html text -> ordered out-link list.

The crawl-frontier analog of the block walk in ``kernels/htmlparse.py``:
the reference's layout engines locate regions a downstream stage consumes
(/root/reference/pero_ocr/layout_engines/simple_region_engine.py:10-137);
a web-scale crawl/link-graph pipeline needs the same single-pass DOM walk
emitting ``<a href>`` targets instead of text blocks. Kept separate from
``_BlockBuilder`` so link-only scans never pay block bookkeeping.

Semantics (deterministic, shared with the sequential oracle replay):

* anchors inside invisible subtrees (``script/style/template/noscript``)
  are ignored, mirroring the visible-stream rule of the block kernel;
* resolution is an explicit small-step ruleset (NOT ``urllib.parse`` —
  its edge cases aren't replayable in SQL and differ across versions):
  absolute ``scheme://...`` kept with the scheme lowercased (schemes are
  case-insensitive, RFC 3986 §3.1, so ``HTTPS://x/p`` canonicalizes like
  ``https://x/p``); protocol-relative ``//h/p`` gets
  the base scheme; root-relative ``/p`` gets the base origin; other
  relative forms resolve against the base directory with ``.``/``..``
  segment collapse; fragment-only and non-hierarchical schemes
  (``mailto:``, ``javascript:``, ``data:``, ``tel:``...) are dropped;
* the fragment part is always stripped;
* first occurrence wins: the output lists each resolved target once, in
  document order, with its ordinal.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from pero_ocr_ray.kernels.config import SKIP_TAGS

# shared shape with functions/domains.HOST_RE_STR (ASCII classes, RE2-safe).
# Schemes are case-insensitive (RFC 3986 §3.1): match either case, emit
# lowercase — mirror that lower() in any future SQL replay of these rules
# (today's links oracle synthesizes hrefs directly and never replays them).
_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*):")
_ORIGIN_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)")


def split_base(base_url: str) -> tuple[str, str, str]:
    """base url -> (scheme, host, directory-path '/…/').

    The directory path is everything from the first ``/`` after the host
    up to and including the last ``/`` (query/fragment excluded); ``/``
    when the base has no path."""
    m = _ORIGIN_RE.match(base_url or "")
    if not m:
        return "", "", "/"
    scheme, host = m.group(1).lower(), m.group(2)
    rest = base_url[m.end():]
    for stop in ("?", "#"):
        cut = rest.find(stop)
        if cut >= 0:
            rest = rest[:cut]
    slash = rest.rfind("/")
    dir_path = rest[: slash + 1] if slash >= 0 else "/"
    if not dir_path.startswith("/"):
        dir_path = "/" + dir_path
    return scheme, host, dir_path


def _collapse_dots(path: str) -> str:
    """RFC 3986 remove_dot_segments over an absolute path."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # a trailing '.'/'..' keeps the directory form (trailing slash)
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    res = "/".join(out)
    return res if res.startswith("/") else "/" + res


def resolve_href(href: str, scheme: str, host: str, dir_path: str) -> str | None:
    """One href -> absolute url without fragment, or None when dropped."""
    if not href:
        return None
    href = href.strip()
    cut = href.find("#")
    if cut == 0:
        return None  # fragment-only: same-document, not an out-link
    if cut > 0:
        href = href[:cut]
    if not href:
        return None
    m = _SCHEME_RE.match(href)
    if m:
        rest = href[m.end():]
        if rest.startswith("//"):
            # already absolute; normalize the (case-insensitive) scheme so
            # 'HTTPS://x/p' and 'https://x/p' canonicalize identically
            return m.group(1).lower() + ":" + rest
        return None  # mailto:, javascript:, data:, tel:, ... — not links
    if not scheme or not host:
        return None  # unparseable base: relative forms unresolvable
    if href.startswith("//"):
        return f"{scheme}:{href}"
    if href.startswith("?"):
        # query-only: against the base DIRECTORY (the kernel keeps no base
        # file name; documented approximation of RFC 3986 §5.3)
        return f"{scheme}://{host}{dir_path}{href}"
    # dot-collapse applies to the PATH only; the query rides along intact
    path = href if href.startswith("/") else dir_path + href
    qcut = path.find("?")
    path, query = (path[:qcut], path[qcut:]) if qcut >= 0 else (path, "")
    return f"{scheme}://{host}{_collapse_dots(path)}{query}"


class _LinkWalker(HTMLParser):
    """Single pass collecting resolved hrefs, first occurrence wins."""

    def updatepos(self, i: int, j: int) -> int:  # line/col never queried
        return j

    def __init__(self, scheme: str, host: str, dir_path: str) -> None:
        super().__init__(convert_charrefs=True)
        self._base = (scheme, host, dir_path)
        self._skip_depth = 0
        self._skip_stack: list[str] = []
        self.links: list[str] = []
        self._seen: set[str] = set()

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            self._skip_stack.append(tag)
            return
        if self._skip_depth > 0 or tag != "a":
            return
        href = next((v for k, v in attrs if k == "href"), None)
        resolved = resolve_href(href or "", *self._base)
        if resolved is not None and resolved not in self._seen:
            self._seen.add(resolved)
            self.links.append(resolved)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag in SKIP_TAGS:
            self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        # lenient: only the innermost open skip element's own close pops it
        if self._skip_depth > 0 and self._skip_stack and \
                self._skip_stack[-1] == tag:
            self._skip_stack.pop()
            self._skip_depth -= 1


def extract_links(html_text: str, base_url: str) -> list[str]:
    """html text -> resolved out-link urls, document order, deduped."""
    walker = _LinkWalker(*split_base(base_url))
    try:
        walker.feed(html_text)
        walker.close()
    except Exception:
        pass  # skip-and-continue: keep links collected so far
    return walker.links


class _AnchorWalker(HTMLParser):
    """Collects (resolved href, anchor text) for EVERY anchor occurrence
    (no dedup — aggregation happens corpus-wide). A new ``<a>`` implies
    closing an open one (HTML5); text is the concatenation of visible
    data nodes inside the anchor, whitespace-normalized. Anchors whose
    href is dropped by the resolution rules contribute nothing."""

    def updatepos(self, i: int, j: int) -> int:
        return j

    def __init__(self, scheme: str, host: str, dir_path: str) -> None:
        super().__init__(convert_charrefs=True)
        self._base = (scheme, host, dir_path)
        self._skip_depth = 0
        self._skip_stack: list[str] = []
        self._cur: str | None = None   # resolved href of the open anchor
        self._buf: list[str] = []
        self.pairs: list[tuple[str, str]] = []

    def _flush(self) -> None:
        if self._cur is not None:
            self.pairs.append((self._cur, " ".join("".join(self._buf)
                                                   .split())))
        self._cur = None
        self._buf = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            self._skip_stack.append(tag)
            return
        if self._skip_depth > 0:
            return
        if tag == "a":
            self._flush()  # implied close of a still-open anchor
            href = next((v for k, v in attrs if k == "href"), None)
            self._cur = resolve_href(href or "", *self._base)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag in SKIP_TAGS:
            self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        if self._skip_depth > 0 and self._skip_stack and \
                self._skip_stack[-1] == tag:
            self._skip_stack.pop()
            self._skip_depth -= 1
            return
        if self._skip_depth == 0 and tag == "a":
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and self._cur is not None and data:
            self._buf.append(data)

    def close(self) -> None:
        super().close()
        self._flush()


def extract_anchor_texts(html_text: str,
                         base_url: str) -> list[tuple[str, str]]:
    """html text -> (resolved href, anchor text) per anchor OCCURRENCE."""
    walker = _AnchorWalker(*split_base(base_url))
    try:
        walker.feed(html_text)
        walker.close()
    except Exception:
        walker._flush()  # skip-and-continue
    return walker.pairs
