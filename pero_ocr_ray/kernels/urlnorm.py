"""URL canonicalization: one ordered rule list drives Python and SQL.

Web-corpus dedup and link-graph joins need urls in a canonical form —
the same page arrives as ``HTTPS://Site.Example:443/a//b?utm_source=x#f``
and ``https://site.example/a/b``. The chain below is the widely-used
conservative subset (case-fold the authority, drop default ports,
fragments, tracking params, duplicate slashes) that never changes which
resource a url names.

Structure mirrors ``functions/textstats.NORMALIZE_RULES``: a structural
prefix step (lowercase scheme+host — regex replacement cannot case-fold)
followed by an ordered (RE2-compatible pattern, replacement) list applied
globally. Both engines evaluate the SAME prefix rule and rule list — the
SQL side is generated from these constants (one source of truth). RE2
constraints: ASCII classes, no lookaround; unmatched optional capture
groups substitute as empty in BOTH Python (>=3.5) and RE2.
"""

from __future__ import annotations

import re

# scheme://authority prefix (case-preserving match; lowercased as a unit)
URL_PREFIX_STR = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
URL_PREFIX_RE = re.compile(URL_PREFIX_STR)

URL_RULES: tuple[tuple[str, str], ...] = (
    (r"#.*$", ""),                                    # fragment
    (r"^(http://[^/:?#]*):80([/?#].*)?$", r"\1\2"),   # default port http
    (r"^(https://[^/:?#]*):443([/?#].*)?$", r"\1\2"), # default port https
    # tracking params (value may be empty); the delimiter survives as \1
    (r"([?&])(?:utm_[a-zA-Z0-9_]+|fbclid|gclid|msclkid|mc_eid|igshid)"
     r"=[^&#]*", r"\1"),
    (r"([?&])&+", r"\1"),                             # ?&& / &&& left behind
    (r"[?&]+$", ""),                                  # trailing delimiters
    (r"([^:/])/{2,}", r"\1/"),                        # duplicate path slashes
)

_COMPILED = tuple((re.compile(p), r) for p, r in URL_RULES)


def canonical_url(url: str) -> str:
    """One url through the full chain (sequential reference kernel)."""
    url = url or ""
    m = URL_PREFIX_RE.match(url)
    if m:
        url = url[: m.end()].lower() + url[m.end():]
    for pat, rep in _COMPILED:
        url = pat.sub(rep, url)
    return url
