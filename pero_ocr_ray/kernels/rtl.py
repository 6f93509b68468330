"""RTL / bidi text helpers (ArabicHelper analog).

The reference ships an Arabic label/visual-form transformer with script
detection (/root/reference/pero_ocr/core/arabic_helper.py:7-559, detection
:146-154). This module provides the same capabilities, independently built:

* script detection (:func:`is_arabic_word` / :func:`is_arabic_line` mirror
  the reference's whole-word pattern + any-word-hits line rule);
* a UAX#9-subset bidi reordering (:func:`logical_to_visual`) with explicit
  embedding levels — R runs get level 1, numeric runs inside an R context
  get level 2 (so digits stay visually LTR inside RTL text), neutrals
  resolve N1/N2-style, and the L2 reversal runs highest-level-first. This
  replaces naive run reversal; brackets are not mirrored (documented);
* presentation-form shaping (:func:`string_to_presentation` /
  :func:`presentation_to_string`) — the reference's string_to_label_form /
  label_form_to_string capability. The contextual-form and lam-alef
  ligature tables are DERIVED at import from ``unicodedata``
  compatibility decompositions (``<isolated>/<initial>/<medial>/<final>``)
  rather than hard-coded, so they cover the full Arabic Presentation
  Forms blocks.

Extraction always stores *logical* order bytes (byte-identity); these
transforms are opt-in post-processing, never in the hot path.
"""

from __future__ import annotations

import re
import unicodedata

# Arabic Unicode blocks (base + supplement + presentation forms)
_AR = "؀-ۿݐ-ݿࢠ-ࣿﭐ-﷿ﹰ-﻿"
_ARABIC_RE = re.compile(f"[{_AR}]")
_ARABIC_WORD_RE = re.compile(f"^[{_AR}]+$")

# Hebrew + Arabic = strong R for the bidi subset
_R_RE = re.compile(f"[{_AR}֐-׿]")
_DIGIT_RE = re.compile("[0-9٠-٩۰-۹]")


def is_arabic_word(word: str) -> bool:
    """Whole word in Arabic script (arabic_helper.py:135-144 semantics)."""
    return bool(_ARABIC_WORD_RE.match(word))


def is_arabic_line(text: str) -> bool:
    """Any whitespace-token fully Arabic (arabic_helper.py:146-154)."""
    return any(is_arabic_word(w) for w in text.split())


def is_arabic(text: str, threshold: float = 0.5) -> bool:
    """True when the majority of non-space chars are Arabic script."""
    letters = [c for c in text if not c.isspace()]
    if not letters:
        return False
    arabic = sum(1 for c in letters if _ARABIC_RE.match(c))
    return arabic / len(letters) >= threshold


# ---------------------------------------------------------------------------
# UAX#9-subset bidi
# ---------------------------------------------------------------------------


def _char_class(c: str) -> str:
    """Strong-R / number / neutral / strong-L (subset of UAX#9 classes)."""
    if _R_RE.match(c):
        return "R"
    if _DIGIT_RE.match(c):
        return "EN"
    if c.isspace() or unicodedata.category(c)[0] in ("P", "S", "Z"):
        return "N"
    return "L"


def _resolve_levels(text: str, base_level: int = 0) -> list[int]:
    """Embedding levels for an LTR paragraph (base 0): R→1, EN inside an R
    context→2 (W-rule subset), neutrals take the surrounding level when
    both sides agree (N1), else the base level (N2)."""
    classes = [_char_class(c) for c in text]
    n = len(classes)
    levels = [base_level] * n

    # numbers: an EN run embeds at level 2 iff its nearest strong chars on
    # BOTH sides are R (symmetric variant of W2/W7 — symmetry is what makes
    # the L2 reorder its own inverse, the involution the tests pin)
    def nearest_strong(idx: int, step: int) -> str:
        j = idx
        while 0 <= j < n:
            if classes[j] in ("L", "R"):
                return classes[j]
            j += step
        return "L"  # paragraph boundary acts as base-direction strong

    i = 0
    while i < n:
        if classes[i] != "EN":
            i += 1
            continue
        j = i
        while j < n and classes[j] == "EN":
            j += 1
        if nearest_strong(i - 1, -1) == "R" and nearest_strong(j, 1) == "R":
            for k in range(i, j):
                levels[k] = base_level + 2
        i = j
    for i, cls in enumerate(classes):
        if cls == "R":
            levels[i] = base_level + 1

    # neutrals: N1 (same strong context both sides) else N2 (base)
    i = 0
    while i < n:
        if classes[i] != "N":
            i += 1
            continue
        j = i
        while j < n and classes[j] == "N":
            j += 1
        left = levels[i - 1] if i > 0 else base_level
        right = levels[j] if j < n else base_level
        fill = min(left, right) if left != right else left
        # neutrals between an R run and an embedded number stay at the R
        # level (both neighbors are RTL-context)
        if left >= base_level + 1 and right >= base_level + 1:
            fill = base_level + 1
        elif left != right:
            fill = base_level
        for k in range(i, j):
            levels[k] = fill
        i = j
    return levels


def bidi_visual_order(text: str, base_level: int = 0) -> list[int]:
    """Permutation ``perm`` with ``visual[i] = logical[perm[i]]`` (rule L2:
    reverse contiguous runs of each level, highest level first)."""
    levels = _resolve_levels(text, base_level)
    order = list(range(len(text)))
    if not levels:
        return order
    for level in range(max(levels), base_level, -1):
        i = 0
        n = len(levels)
        while i < n:
            if levels[i] >= level:
                j = i
                while j < n and levels[j] >= level:
                    j += 1
                order[i:j] = order[i:j][::-1]
                i = j
            else:
                i += 1
    return order


def logical_to_visual(line: str) -> str:
    """Reorder one logical-order line for LTR display (UAX#9 subset)."""
    return "".join(line[i] for i in bidi_visual_order(line))


def visual_to_logical(line: str) -> str:
    """Inverse transform. For the level structure this subset produces
    (levels ≤ 2 resolved purely from per-char classes), applying the
    forward reorder to the visual string restores logical order — the
    involution the property tests pin down."""
    return logical_to_visual(line)


# ---------------------------------------------------------------------------
# presentation forms (shaping) — tables derived from unicodedata
# ---------------------------------------------------------------------------


def _build_tables():
    forms: dict[str, dict[str, str]] = {}       # base char -> form -> glyph
    ligatures: dict[str, dict[str, str]] = {}   # base pair  -> form -> glyph
    backward: dict[str, str] = {}               # glyph -> base char(s)
    for cp in range(0xFB50, 0xFF00):
        ch = chr(cp)
        decomp = unicodedata.decomposition(ch)
        if not decomp.startswith("<"):
            continue
        tag, _, rest = decomp.partition("> ")
        tag = tag[1:]
        if tag not in ("isolated", "initial", "medial", "final"):
            continue
        base = "".join(chr(int(h, 16)) for h in rest.split())
        backward[ch] = base
        target = ligatures if len(base) > 1 else forms
        target.setdefault(base, {})[tag] = ch
    return forms, ligatures, backward


_FORMS, _LIGATURES, _BACKWARD = _build_tables()

# dual-joining letters have initial+medial presentation forms; right-joining
# letters (ا د ذ ر ز و …) only isolated+final
_DUAL = {c for c, f in _FORMS.items() if "initial" in f and "medial" in f}


def _is_arabic_letter(c: str) -> bool:
    return c in _FORMS


def string_to_presentation(text: str) -> str:
    """Shape logical-order Arabic into presentation forms (contextual
    isolated/initial/medial/final + lam-alef ligatures) — the
    string_to_label_form capability. Non-Arabic chars pass through."""
    out: list[str] = []
    i, n = 0, len(text)
    prev_joins = False  # does the previous emitted letter connect forward?
    while i < n:
        c = text[i]
        if not _is_arabic_letter(c):
            out.append(c)
            prev_joins = False
            i += 1
            continue
        # lam-alef ligature (lam + any alef variant with a ligature form)
        if i + 1 < n and (c + text[i + 1]) in _LIGATURES:
            lig = _LIGATURES[c + text[i + 1]]
            form = "final" if prev_joins else "isolated"
            out.append(lig.get(form) or lig.get("isolated") or c + text[i + 1])
            prev_joins = False  # lam-alef never joins forward
            i += 2
            continue
        joins_after = (c in _DUAL and i + 1 < n
                       and _is_arabic_letter(text[i + 1]))
        fs = _FORMS[c]
        if prev_joins and joins_after:
            glyph = fs.get("medial") or fs.get("final") or fs.get("isolated")
        elif prev_joins:
            glyph = fs.get("final") or fs.get("isolated")
        elif joins_after:
            glyph = fs.get("initial") or fs.get("isolated")
        else:
            glyph = fs.get("isolated")
        out.append(glyph or c)
        prev_joins = joins_after
        i += 1
    return "".join(out)


def presentation_to_string(text: str) -> str:
    """Unshape presentation forms back to base letters (the
    label_form_to_string inverse); unknown chars pass through."""
    return "".join(_BACKWARD.get(c, c) for c in text)
