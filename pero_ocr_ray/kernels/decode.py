"""Payload decode / normalize kernel.

DOM-world analog of the reference's rotation/encoding normalization step
(/root/reference/pero_ocr/layout_engines/layout_helpers.py:345-390): take the
raw ``html:binary`` payload, sniff the charset, and produce a normalized
``str`` deterministically. Also classifies the payload (html vs pdf) for the
parse router, and applies the skew guard (max payload truncation).
"""

from __future__ import annotations

import codecs
import re

from pero_ocr_ray.kernels.config import ExtractConfig, DEFAULT_CONFIG

# <meta charset="..."> / <meta http-equiv content="...; charset=..."> sniffers,
# run on ASCII-ish prefix bytes.
_META_CHARSET = re.compile(rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_.:-]+)""",
                           re.IGNORECASE)
_XML_ENC = re.compile(rb"""<\?xml[^>]+encoding\s*=\s*["']([a-zA-Z0-9_.:-]+)""",
                      re.IGNORECASE)

PDF_MAGIC = b"%PDF-"


def payload_kind(raw: bytes) -> str:
    """'pdf' if the payload sniffs as a PDF document, else 'html'."""
    return "pdf" if raw[:5] == PDF_MAGIC else "html"


def _normalize_charset(name: str) -> str | None:
    try:
        return codecs.lookup(name).name
    except (LookupError, ValueError):
        return None


def sniff_charset(raw: bytes, sniff_bytes: int = 2048) -> str | None:
    """Declared charset from BOM or <meta>/<?xml> in the payload prefix."""
    if raw[:3] == codecs.BOM_UTF8:
        return "utf-8"
    if raw[:2] in (codecs.BOM_UTF16_LE, codecs.BOM_UTF16_BE):
        return "utf-16"
    head = raw[:sniff_bytes]
    m = _META_CHARSET.search(head) or _XML_ENC.search(head)
    if m:
        return _normalize_charset(m.group(1).decode("ascii", "replace"))
    return None


def decode_payload(raw: bytes, cfg: ExtractConfig = DEFAULT_CONFIG) -> tuple[str, str, str]:
    """Decode html bytes -> (text, encoding_used, error).

    Policy (deterministic, mirrors the reference's lenient import stance,
    /root/reference/pero_ocr/core/layout.py:263-309):
      1. truncate payloads beyond ``cfg.max_payload_bytes`` (error noted);
      2. strict UTF-8 if it decodes;
      3. else the declared <meta>/BOM charset, strict;
      4. else UTF-8 with replacement characters (error noted).
    """
    error = ""
    if len(raw) > cfg.max_payload_bytes:
        raw = raw[: cfg.max_payload_bytes]
        error = "truncated_payload"
    if raw[:3] == codecs.BOM_UTF8:
        raw = raw[3:]
    try:
        return raw.decode("utf-8", "strict"), "utf-8", error
    except UnicodeDecodeError:
        pass
    declared = sniff_charset(raw, cfg.sniff_bytes)
    if declared and declared not in ("utf-8",):
        try:
            return raw.decode(declared, "strict"), declared, error
        except (UnicodeDecodeError, LookupError):
            pass
    text = raw.decode("utf-8", "replace")
    error = (error + ";" if error else "") + "decode_replace"
    return text, "utf-8-replace", error
