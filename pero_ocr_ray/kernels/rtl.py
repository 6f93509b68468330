"""RTL / bidi text helpers (ArabicHelper analog).

The reference ships an Arabic label/visual-form transformer with script
detection (/root/reference/pero_ocr/core/arabic_helper.py:7-559, detection
:146-154). The extraction engine needs (a) script detection to key
normalization by the ``lang`` column, and (b) a deterministic logical<->
visual reordering for display-oriented sinks. Extraction itself always
stores *logical* order bytes (byte-identity), so these transforms are
opt-in post-processing, never in the hot path.
"""

from __future__ import annotations

import re

# Arabic Unicode blocks (base + supplement + presentation forms)
_ARABIC_RE = re.compile(
    "[؀-ۿݐ-ݿࢠ-ࣿﭐ-﷿ﹰ-﻿]")
# a maximal run starting AND ending on an Arabic char (interior may hold
# spaces and Arabic punctuation) — anchoring both ends keeps the transform
# an involution
_AR = "؀-ۿݐ-ݿࢠ-ࣿﭐ-﷿ﹰ-﻿"
_ARABIC_RUN = re.compile(f"[{_AR}](?:[{_AR} ،؛؟]*[{_AR}،؛؟])?")


def is_arabic(text: str, threshold: float = 0.5) -> bool:
    """True when the majority of non-space chars are Arabic script."""
    letters = [c for c in text if not c.isspace()]
    if not letters:
        return False
    arabic = sum(1 for c in letters if _ARABIC_RE.match(c))
    return arabic / len(letters) >= threshold


def logical_to_visual(line: str) -> str:
    """Reorder one logical-order line for LTR display: each maximal Arabic
    run is reversed in place (simplified bidi — no nesting levels).
    Involution: applying twice returns the input."""
    def flip(m: re.Match) -> str:
        return m.group(0)[::-1]
    return _ARABIC_RUN.sub(flip, line)


def visual_to_logical(line: str) -> str:
    return logical_to_visual(line)  # the simplified transform is symmetric
