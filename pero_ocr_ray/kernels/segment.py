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
    only trailing carriage returns (pre_code fixture case — canonicalization
    must not destroy pre-formatted spans);
  * control characters (C0 minus tab/newline) are removed;
  * empty lines are dropped at block edges but kept interior in ``<pre>``.

Each produced line is ``(text, src_start, src_end)``; offsets point at the
first / one-past-last source character that survived canonicalization
(-1/-1 for lines made only of inserted markers, which are dropped anyway).
"""

from __future__ import annotations

_DROP = {c: None for c in range(32) if c not in (9, 10)}  # keep \t \n


def _char_stream(pieces: list[tuple[str, int]], pre: bool,
                 ) -> tuple[str, list[int], list[bool]]:
    """Concatenate pieces -> (raw_text, per-char source offsets, break mask).

    A char is a line break when it comes from a ``<br>`` marker piece
    (source offset -1), or — inside ``<pre>`` — when it is a literal
    newline in the source. Newlines in normal HTML text are whitespace.
    """
    texts = []
    offsets: list[int] = []
    breaks: list[bool] = []
    for text, start in pieces:
        texts.append(text)
        if start < 0:
            offsets.extend([-1] * len(text))
            breaks.extend([ch == "\n" for ch in text])
        else:
            offsets.extend(range(start, start + len(text)))
            breaks.extend([pre and ch == "\n" for ch in text])
    return "".join(texts), offsets, breaks


def _canon_line(chars: str, offs: list[int], pre: bool) -> tuple[str, int, int]:
    """Canonicalize one line -> (text, src_start, src_end)."""
    out: list[str] = []
    out_offs: list[int] = []
    if pre:
        for ch, off in zip(chars, offs):
            if ch == "\r" or (ord(ch) < 32 and ch != "\t"):
                continue
            out.append(ch)
            out_offs.append(off)
        # strip trailing whitespace only
        while out and out[-1].isspace():
            out.pop()
            out_offs.pop()
    else:
        pending_space = False
        for ch, off in zip(chars, offs):
            if ord(ch) < 32 and ch not in ("\t", "\n"):
                continue
            if ch.isspace():
                pending_space = bool(out)
                continue
            if pending_space:
                out.append(" ")
                out_offs.append(-1)
                pending_space = False
            out.append(ch)
            out_offs.append(off)
    text = "".join(out)
    real = [o for o in out_offs if o >= 0]
    if not real:
        return text, -1, -1
    return text, real[0], real[-1] + 1


def segment_block(block: dict) -> list[tuple[str, int, int]]:
    """Block dict (from htmlparse) -> list of (line_text, src_start, src_end)."""
    pre = bool(block.get("pre"))
    raw, offs, breaks = _char_stream(block["pieces"], pre)
    lines: list[tuple[str, int, int]] = []
    start = 0
    n = len(raw)
    for i in range(n + 1):
        if i == n or breaks[i]:
            seg_text, seg_start, seg_end = _canon_line(raw[start:i], offs[start:i], pre)
            if seg_text or pre:
                lines.append((seg_text, seg_start, seg_end))
            start = i + 1
    if pre:
        while lines and not lines[0][0]:
            lines.pop(0)
        while lines and not lines[-1][0]:
            lines.pop()
    return lines


def canonical_text(block: dict) -> str:
    """Canonical block text: lines joined by '\\n' (used by scoring/emit)."""
    return "\n".join(t for t, _, _ in segment_block(block))
