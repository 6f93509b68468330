"""Reading order: recursive XY-cut over block geometry.

Analog of the reference's SmartRegionSorter recursive XY-cut
(/root/reference/pero_ocr/layout_engines/smart_sorter.py:177-303) and the
NaiveRegionSorter row-band clustering (naive_sorter.py:41-84). In the DOM
world geometry is derived, not rendered: column containers (``td``/``th``
cells, ``div class="col"``) give the x-axis; document sequence gives the
y-axis, banded so that a run of columnized content forms one band (the
row-band analog).

Every tie-break is on ``dom_idx`` — the reference's ε-random tie-breaks
(/root/reference/pero_ocr/layout_engines/layout_helpers.py:251-252,267) are
replaced with this deterministic key (byte-identity requirement).
"""

from __future__ import annotations


def xy_cut(rects: list[tuple[float, float, float, float, int]]) -> list[int]:
    """Recursive XY-cut. ``rects`` = (x0, y0, x1, y1, key); returns keys in
    reading order. Horizontal cuts (top-before-bottom) are preferred, then
    vertical cuts (left-before-right); unsplittable groups fall back to a
    stable (y0, x0, key) sort.
    """
    def try_split(items, lo_i, hi_i):
        # find a gap in the projection onto one axis; returns parts or None
        order = sorted(items, key=lambda r: (r[lo_i], r[hi_i], r[4]))
        parts = []
        cur = [order[0]]
        reach = order[0][hi_i]
        for r in order[1:]:
            if r[lo_i] >= reach:
                parts.append(cur)
                cur = [r]
            else:
                cur.append(r)
            reach = max(reach, r[hi_i])
        parts.append(cur)
        return parts if len(parts) > 1 else None

    # iterative (explicit work stack): a page with thousands of bands would
    # otherwise exceed Python's recursion limit
    out: list[int] = []
    stack = [rects]
    while stack:
        group = stack.pop()
        if len(group) <= 1:
            out.extend(r[4] for r in group)
            continue
        parts = try_split(group, 1, 3)  # horizontal cut on y
        if parts is None:
            parts = try_split(group, 0, 2)  # vertical cut on x
        if parts is None:
            out.extend(r[4] for r in
                       sorted(group, key=lambda r: (r[1], r[0], r[4])))
            continue
        stack.extend(reversed(parts))  # preserve top-to-bottom order
    return out


def block_rects(blocks: list[dict]) -> list[tuple[float, float, float, float, int]]:
    """Derive layout rectangles from DOM column structure.

    Bands: consecutive blocks sharing a ``col_group`` form one band (all its
    rects share one y range, so a horizontal cut cannot slice a band's
    columns into rows); every non-columnized block is its own full-width
    band. Within a band, x = column ordinal (with inter-column gaps);
    within a column, order falls to the deterministic dom_idx tie-break."""
    rects = []
    band = -1
    prev_group = object()  # sentinel != any col_group
    for b in blocks:
        group = b["col_group"]
        if group != prev_group or group < 0:
            # each full-width block and each columnized run opens a new band
            band += 1
            prev_group = group
        y0, y1 = float(band), band + 0.9
        if group >= 0:
            col = b["col_ord"]
            x0, x1 = col * 2.0, col * 2.0 + 1.0  # gap between columns
        else:
            x0, x1 = 0.0, 1e9  # full width
        rects.append((x0, y0, x1, y1, b["dom_idx"]))
    return rects


def reading_order(blocks: list[dict]) -> None:
    """Annotate each block with ``order`` (0-based reading position) in place."""
    if not blocks:
        return
    ordered = xy_cut(block_rects(blocks))
    pos = {dom_idx: i for i, dom_idx in enumerate(ordered)}
    for b in blocks:
        b["order"] = pos[b["dom_idx"]]
