"""Line segmentation + whitespace canonicalization with source offsets.

Analog of the reference's baseline/line engines and postprocessing
(/root/reference/pero_ocr/layout_engines/simple_baseline_engine.py:13-101,
line_postprocessing_engine.py:6-96): a block's text is split into lines and
each line's text is canonicalized, while char offsets into the visible
source stream are carried along (the logit_coords analog,
/root/reference/pero_ocr/core/layout.py:50).

Rules (deterministic):
  * lines break only at explicit breaks: ``<br>`` markers and, inside
    ``<pre>`` blocks, literal newlines;
  * normal lines collapse every whitespace run to a single ASCII space and
    strip ends; ``<pre>`` lines keep interior whitespace verbatim and strip
    only trailing whitespace (pre_code fixture case — canonicalization must
    not destroy pre-formatted spans);
  * control characters (C0 minus tab/newline) are removed;
  * empty lines are dropped at block edges but kept interior in ``<pre>``.

Implementation note: this is the hot path at 100 TB (80 ms/page before,
dominated by a per-char Python loop) — all per-char work now runs in C
(``str.translate``, ``re.sub``, ``str.find``); Python only touches line
boundaries and piece boundaries.

Each produced line is ``(text, src_start, src_end)``; offsets point at the
first / one-past-last source character that survived canonicalization
(-1/-1 for lines with no sourced characters).
"""

from __future__ import annotations

import bisect
import re

# C0 controls minus tab/newline are dropped everywhere
_CTRL_TABLE = {c: None for c in range(32) if c not in (9, 10)}
_WS_RUN = re.compile(r"\s+")
# first character that survives canonicalization (not ws, not dropped ctrl)
_REAL_CHAR = re.compile(r"[^\s\x00-\x08\x0b-\x1f]")
# in <pre>, leading whitespace survives: first kept char = first non-ctrl
_PRE_CHAR = re.compile(r"[^\x00-\x08\x0b-\x1f]")
# Canonicality check (the hot fast path: most chunks are already canonical
# and must be detected at C speed, not regex speed). A chunk is canonical
# iff it has no double space, no whitespace other than ' ', and no dropped
# control char. ASCII chunks (the overwhelming majority) check via
# bytes.translate (memchr-class throughput, ~9x the alternation regex that
# preceded it); non-ASCII falls back to a char-class regex whose union with
# the double-space test is exactly the old \s\s|[^\S ]|[\x00-\x08\x0b-\x1f]
# condition (fuzz-verified equivalent over the joint alphabet).
_CTRL_BYTES = bytes(range(0x20))
_NONCANON_CHAR = re.compile(r"[^\S ]|[\x00-\x08\x0e-\x1b]")


def _is_canonical(chunk: str) -> bool:
    if chunk.isascii():
        b = chunk.encode()
        return (len(b.translate(None, _CTRL_BYTES)) == len(b)
                and b"  " not in b)
    return "  " not in chunk and _NONCANON_CHAR.search(chunk) is None


def _line_bounds(pieces: list[tuple[str, int]], pre: bool,
                 ) -> tuple[str, list[tuple[int, int]], list[int], list[int]]:
    """-> (raw, [(start, end)] line bounds in raw, piece raw-starts,
    piece src-starts). A char is a line break when it comes from a ``<br>``
    marker piece (src -1) or — inside ``<pre>`` — is a literal newline."""
    texts = [t for t, _ in pieces]
    raw = "".join(texts)
    piece_raw_starts: list[int] = []
    piece_src_starts: list[int] = []
    breaks: list[int] = []
    pos = 0
    for text, src in pieces:
        piece_raw_starts.append(pos)
        piece_src_starts.append(src)
        if src < 0 or pre:
            i = text.find("\n")
            while i >= 0:
                breaks.append(pos + i)
                i = text.find("\n", i + 1)
        pos += len(text)
    bounds = []
    start = 0
    for b in breaks:
        bounds.append((start, b))
        start = b + 1
    bounds.append((start, len(raw)))
    return raw, bounds, piece_raw_starts, piece_src_starts


def _src_of(raw_idx: int, piece_raw_starts: list[int],
            piece_src_starts: list[int]) -> int:
    """Map a raw-string index to its source offset (-1 for marker chars)."""
    p = bisect.bisect_right(piece_raw_starts, raw_idx) - 1
    src = piece_src_starts[p]
    return -1 if src < 0 else src + (raw_idx - piece_raw_starts[p])


def segment_block(block: dict) -> list[tuple[str, int, int]]:
    """Block dict (from htmlparse) -> list of (line_text, src_start, src_end)."""
    pre = bool(block.get("pre"))
    raw, bounds, praw, psrc = _line_bounds(block["pieces"], pre)
    lines: list[tuple[str, int, int]] = []
    for s, e in bounds:
        chunk = raw[s:e]
        if pre:
            text = chunk.translate(_CTRL_TABLE).rstrip()
        elif _is_canonical(chunk):
            text = chunk.strip()  # already canonical (common fast path)
        else:
            text = _WS_RUN.sub(" ", chunk.translate(_CTRL_TABLE)).strip()
        if not text and not pre:
            continue
        if not text:
            lines.append(("", -1, -1))
            continue
        # offsets of the first / last canonical-surviving char
        m = (_PRE_CHAR if pre else _REAL_CHAR).search(chunk)
        first = s + m.start()
        last = e - 1
        while last > first:
            ch = raw[last]
            if not ch.isspace() and (ord(ch) >= 32 or ch == "\t"):
                break
            last -= 1
        s0 = _src_of(first, praw, psrc)
        s1 = _src_of(last, praw, psrc)
        lines.append((text, s0, -1 if s1 < 0 else s1 + 1))
    if pre:
        while lines and not lines[0][0]:
            lines.pop(0)
        while lines and not lines[-1][0]:
            lines.pop()
    return lines


def canonical_text(block: dict) -> str:
    """Canonical block text: lines joined by '\\n' (used by scoring/emit)."""
    return "\n".join(t for t, _, _ in segment_block(block))
