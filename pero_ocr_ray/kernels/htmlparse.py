"""DOM parse kernel: html text -> flat candidate block list.

This is the region-detection analog of the reference's layout engines
(/root/reference/pero_ocr/layout_engines/simple_region_engine.py:10-137 and
cnn_layout_engine.py:57-372): instead of pixel morphology / CNN maps over a
page image, walk the DOM with stdlib ``html.parser`` and emit one candidate
block per paragraph-level text run, carrying the features the classifier
scores (text length, link chars, tag depth, boilerplate ancestry) and the
source-offset bookkeeping needed for span emission (logit_coords analog,
/root/reference/pero_ocr/core/layout.py:50).

Deterministic and lenient: unclosed tags, bad nesting and stray closes are
recovered by an explicit implied-close policy (IMPLIED_CLOSE) plus
flush-on-block-boundary, mirroring the reference's lenient PAGE-XML import
stance (/root/reference/pero_ocr/core/layout.py:263-309).

Offsets: ``src_*`` index into the *visible text stream* — the concatenation
of every non-skipped character-data node of the document, in document order
(script/style/template/noscript content excluded). ``<br>`` inserts a line
break marker that has no source position (offset -1 handled downstream).
"""

from __future__ import annotations

from html.parser import HTMLParser

from pero_ocr_ray.kernels.config import (
    BLOCK_TAGS, BOILER_TAGS, IMPLIED_CLOSE, PARA_TAGS, SKIP_TAGS,
)

VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
})

BR_MARKER = "\n"  # appended as a zero-source-width piece


class _Elem:
    __slots__ = ("tag", "uid", "cells", "pushed_col")

    def __init__(self, tag: str, uid: int):
        self.tag = tag
        self.uid = uid
        self.cells = 0  # column containers opened directly under this element
        self.pushed_col = False  # did this element push a col_ctx entry?


class _BlockBuilder(HTMLParser):
    """Single pass over the document; collects finished block dicts."""

    def updatepos(self, i: int, j: int) -> int:
        # line/column tracking exists only for HTMLParser.getpos(), which
        # this builder never calls — skipping it saves one newline scan per
        # token on the hot path
        return j

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self.stack: list[_Elem] = []
        self.cur: dict | None = None
        self.src_pos = 0
        self.next_uid = 0
        self.link_depth = 0
        self.skip_depth = 0
        self.boiler_depth = 0
        self.pre_depth = 0
        self.col_ctx: list[tuple[int, int]] = []  # (group_uid, ordinal)

    # -- stack bookkeeping -------------------------------------------------
    def _push(self, tag: str, attrs) -> None:
        uid = self.next_uid
        self.next_uid += 1
        if tag == "a":
            self.link_depth += 1
        if tag in SKIP_TAGS:
            self.skip_depth += 1
        if tag in BOILER_TAGS:
            self.boiler_depth += 1
        if tag == "pre":
            self.pre_depth += 1
        elem = _Elem(tag, uid)
        if self._is_column(tag, attrs):
            parent = self.stack[-1] if self.stack else None
            group_uid = parent.uid if parent is not None else -1
            ordinal = parent.cells if parent is not None else 0
            if parent is not None:
                parent.cells += 1
            self.col_ctx.append((group_uid, ordinal))
            elem.pushed_col = True
        self.stack.append(elem)

    def _pop_one(self) -> None:
        elem = self.stack.pop()
        tag = elem.tag
        if tag == "a":
            self.link_depth = max(0, self.link_depth - 1)
        if tag in SKIP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
        if tag in BOILER_TAGS:
            self.boiler_depth = max(0, self.boiler_depth - 1)
        if tag == "pre":
            self.pre_depth = max(0, self.pre_depth - 1)
        if elem.pushed_col and self.col_ctx:
            self.col_ctx.pop()

    def _is_column(self, tag: str, attrs) -> bool:
        if tag in ("td", "th"):
            return True
        if tag == "div":
            for k, v in attrs:
                if k == "class" and v and "col" in v.split():
                    return True
        return False

    # -- block lifecycle ---------------------------------------------------
    def _open_block(self) -> None:
        kind = "body"
        for elem in reversed(self.stack):
            if elem.tag in PARA_TAGS:
                kind = elem.tag
                break
            if elem.tag in BLOCK_TAGS and kind == "body":
                kind = elem.tag
        tag_path = "/".join(e.tag for e in self.stack if e.tag in BLOCK_TAGS)
        col_group, col_ord = self.col_ctx[-1] if self.col_ctx else (-1, -1)
        self.cur = {
            "kind": kind,
            "tag_path": tag_path,
            "depth": len(self.stack),
            "pieces": [],            # list[(text, src_start)] ; src_start=-1 for <br>
            "link_chars": 0,
            "raw_len": 0,
            "boiler": self.boiler_depth > 0,
            "pre": self.pre_depth > 0 or kind == "pre",
            "col_group": col_group,
            "col_ord": col_ord,
        }

    def _flush(self) -> None:
        cur, self.cur = self.cur, None
        if cur is None:
            return
        if not any(text and not text.isspace() for text, _ in cur["pieces"]):
            return
        dom_idx = len(self.blocks)
        starts = [s for _, s in cur["pieces"] if s >= 0]
        src_start = starts[0] if starts else -1
        src_end = -1
        for text, s in reversed(cur["pieces"]):
            if s >= 0:
                src_end = s + len(text)
                break
        cur["block_id"] = f"b{dom_idx:04d}"
        cur["dom_idx"] = dom_idx
        cur["src_start"] = src_start
        cur["src_end"] = src_end
        self.blocks.append(cur)

    def _last_skip_index(self) -> int:
        """Stack index of the innermost open SKIP element (-1 if none)."""
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag in SKIP_TAGS:
                return i
        return -1

    # -- HTMLParser callbacks ----------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if self.skip_depth > 0:
            # invisible subtree (script/style/template/noscript): track the
            # stack so the matching end tag closes it, but contribute NO
            # visible side effects — no <br> markers, no block flushes, no
            # implied closes of VISIBLE elements (content loss otherwise)
            if tag not in VOID_TAGS:
                self._push(tag, attrs)
            return
        implied = IMPLIED_CLOSE.get(tag)
        if implied:
            while self.stack and self.stack[-1].tag in implied:
                self._flush()
                self._pop_one()
        if tag == "br":
            # line break inside the open block; separates nothing otherwise
            if self.cur is not None:
                self.cur["pieces"].append((BR_MARKER, -1))
            return
        if tag in BLOCK_TAGS or tag == "hr":
            self._flush()
        if tag in VOID_TAGS:
            return
        self._push(tag, attrs)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag not in VOID_TAGS and tag != "br":
            self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        # inside an invisible subtree, a close may only match elements of
        # that subtree (a stray </p> in noscript markup must never pop —
        # and flush — visible structure outside it); the skip element's own
        # close always matches itself
        floor = self._last_skip_index() if self.skip_depth > 0 else -1
        if floor >= 0 and self.stack[floor].tag == tag:
            floor -= 1
        depth = None
        for i in range(len(self.stack) - 1, floor, -1):
            if self.stack[i].tag == tag:
                depth = i
                break
        if depth is None:
            return  # stray close: ignore (lenient recovery)
        if tag in BLOCK_TAGS and self.skip_depth == 0:
            self._flush()
        while len(self.stack) > depth:
            self._pop_one()

    def handle_data(self, data: str) -> None:
        if not data:
            return
        if self.skip_depth > 0:
            return  # invisible; does not advance the visible stream
        start = self.src_pos
        self.src_pos += len(data)
        if self.cur is None:
            if data.isspace():
                return  # inter-block whitespace opens nothing
            self._open_block()
        self.cur["pieces"].append((data, start))
        self.cur["raw_len"] += len(data)
        if self.link_depth > 0:
            self.cur["link_chars"] += len(data)

    def close(self) -> None:  # flush trailing unclosed content
        super().close()
        self._flush()


def parse_html(text: str) -> list[dict]:
    """Parse html text into the flat candidate-block list (document order)."""
    builder = _BlockBuilder()
    try:
        builder.feed(text)
        builder.close()
    except Exception:
        # html.parser is robust, but guarantee skip-and-continue semantics
        # (/root/reference/user_scripts/parse_folder.py:213-216): keep the
        # blocks collected so far.
        builder._flush()
    return builder.blocks
