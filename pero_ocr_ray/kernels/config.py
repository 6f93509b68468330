"""Extraction pipeline configuration.

Analog of the reference's INI-driven ``PageParser`` assembly
(/root/reference/pero_ocr/document_ocr/page_parser.py:457-483): one flat,
serializable config object consumed by every stage. All values are plain
Python scalars so the config ships to Ray workers without surprises.
"""

from __future__ import annotations

from dataclasses import dataclass, asdict


@dataclass(frozen=True)
class ExtractConfig:
    # --- decode stage (charset sniff; bad_bytes fixture case) ---
    sniff_bytes: int = 2048          # bytes scanned for a <meta charset=...>
    max_payload_bytes: int = 8 * 1024 * 1024   # skew guard: larger payloads are
    # truncated at this many bytes (deterministic; error column records it).
    # Analog of the reference's 5 Mpx adaptive-downsample cap
    # (/root/reference/pero_ocr/layout_engines/torch_parsenet.py:8,66-93).

    # --- block classification (ParseNet-analog scoring; see score.py) ---
    score_threshold: float = 0.0     # keep block iff score >= threshold
    len_weight: float = 1.0          # * log1p(n_chars)
    link_weight: float = 6.0         # * link_density
    depth_soft: int = 12             # depth beyond this is penalized
    depth_weight: float = 0.5        # per level beyond depth_soft
    boiler_penalty: float = 4.0      # inside nav/aside/footer/header
    kind_bonus_heading: float = 1.5  # h1..h6, title
    kind_bonus_content: float = 1.0  # p, li, pre, blockquote, figcaption, dd, td

    keep_all_blocks: bool = False    # WholePageRegion analog
    # (page_parser.py:159-171): bypass classification, keep every block

    # --- edge / page filters (layout_helpers.py:16-34 analogs) ---
    edge_min_chars: int = 15         # drop short non-heading blocks at doc edges
    page_min_chars: int = 25         # if no kept block reaches this, drop page

    # --- segmentation ---
    # lines are produced only at explicit breaks (<br>, newlines in <pre>);
    # normal blocks canonicalize whitespace to single spaces (one line).

    # --- pipeline shape (Ray-side knobs; ignored by the oracle) ---
    parse_batch_size: int = 64       # rows per batch through the parser actors
    # (measured: 64 balances per-task overhead vs heavy-tail skew; 16 tripled
    # wall time from task overhead, 128 hurt balancing)
    parse_concurrency: int = 0       # 0 = auto (derived from cluster CPUs)
    vector_batch_size: int = 1024    # rows per batch through vectorized stages
    dedup_urls: bool = False         # groupby(url) keep latest warc_ts first
    size_bucketing: bool = False     # repartition by byte-length bucket pre-parse

    def to_dict(self) -> dict:
        return asdict(self)


DEFAULT_CONFIG = ExtractConfig()

# Block-level HTML tags: opening one of these terminates the current text
# block. Mirrors the region/line structural split in the reference's layout
# model (/root/reference/pero_ocr/core/layout.py:75-83) recast for the DOM.
BLOCK_TAGS = frozenset({
    "address", "article", "aside", "blockquote", "body", "caption", "dd",
    "details", "div", "dl", "dt", "fieldset", "figcaption", "figure",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr",
    "html", "li", "main", "nav", "ol", "p", "pre", "section", "summary",
    "table", "tbody", "td", "tfoot", "th", "thead", "title", "tr", "ul",
})

# Tags that open an accumulating text block of their own kind.
PARA_TAGS = frozenset({
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th", "pre",
    "blockquote", "figcaption", "dt", "dd", "title", "caption", "summary",
})

# Paragraph-level tags implicitly closed when a sibling opens (lenient HTML).
IMPLIED_CLOSE = {
    "p": frozenset({"p"}),
    "li": frozenset({"li"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "tr": frozenset({"tr", "td", "th"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
}

# Semantic boilerplate containers (penalized in scoring).
BOILER_TAGS = frozenset({"nav", "aside", "footer", "header"})

# Content inside these is invisible (dropped entirely).
SKIP_TAGS = frozenset({"script", "style", "template", "noscript"})

HEADING_KINDS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "title"})
CONTENT_KINDS = frozenset({"p", "li", "pre", "blockquote", "figcaption",
                           "dd", "td", "caption", "summary"})
