"""Block classification: ParseNet-analog boilerplate scoring.

The reference scores candidate regions with a CNN over pixel maps
(/root/reference/pero_ocr/layout_engines/cnn_layout_engine.py:126-196,
torch_parsenet.py:20-102). The DOM-world analog is a deterministic linear
score over structural features — text length, link density, tag depth,
semantic boilerplate ancestry, element kind — thresholded to keep/drop.

Also hosts the edge filter and whole-page drop, analogs of
/root/reference/pero_ocr/layout_engines/layout_helpers.py:16-26 (short lines
hugging the page edge) and :29-34 with page_parser.py:328-331 (drop all
regions when no line is long enough).
"""

from __future__ import annotations

import math

from pero_ocr_ray.kernels.config import (
    CONTENT_KINDS, HEADING_KINDS, ExtractConfig, DEFAULT_CONFIG,
)


def score_block(n_chars: int, link_chars: int, raw_len: int, depth: int,
                boiler: bool, kind: str,
                cfg: ExtractConfig = DEFAULT_CONFIG) -> float:
    """Deterministic keep-score for one block (higher = more content-like)."""
    link_density = link_chars / raw_len if raw_len > 0 else 0.0
    score = cfg.len_weight * math.log1p(float(n_chars))
    score -= cfg.link_weight * link_density
    if depth > cfg.depth_soft:
        score -= cfg.depth_weight * (depth - cfg.depth_soft)
    if boiler:
        score -= cfg.boiler_penalty
    if kind in HEADING_KINDS:
        score += cfg.kind_bonus_heading
    elif kind in CONTENT_KINDS:
        score += cfg.kind_bonus_content
    return score


def classify_blocks(blocks: list[dict], cfg: ExtractConfig = DEFAULT_CONFIG) -> None:
    """Annotate each block with ``score`` / ``keep`` in place.

    ``n_chars`` (canonical length) must already be present (segment stage).
    Edge filter: the first/last candidate block is dropped when short and not
    a heading (crumbs / footer stubs at document edges). Whole-page drop:
    when no kept block reaches ``page_min_chars``, everything is dropped.
    """
    if cfg.keep_all_blocks:  # WholePageRegion analog: no classification
        for b in blocks:
            b["score"] = 0.0
            b["keep"] = b["n_chars"] > 0
        return
    n = len(blocks)
    for i, b in enumerate(blocks):
        s = score_block(b["n_chars"], b["link_chars"], b["raw_len"],
                        b["depth"], b["boiler"], b["kind"], cfg)
        keep = s >= cfg.score_threshold
        if keep and (i == 0 or i == n - 1):
            if b["n_chars"] < cfg.edge_min_chars and b["kind"] not in HEADING_KINDS:
                keep = False
        b["score"] = s
        b["keep"] = keep
    if not any(b["keep"] and b["n_chars"] >= cfg.page_min_chars for b in blocks):
        for b in blocks:
            b["keep"] = False


def block_confidence(score: float) -> float:
    """Map the unbounded linear keep-score to a (0,1) confidence (logistic)
    — the per-block analog of the reference's word confidences feeding the
    page quality summary (/root/reference/pero_ocr/core/layout.py:778-847)."""
    return 1.0 / (1.0 + math.exp(-score))


def page_quality_score(blocks: list[dict], p: int = 6) -> float:
    """Page quality: power-mean (default p=6, the reference's exponent) of
    the kept blocks' confidences — emphasises the strongest blocks, exactly
    as the reference's power-mean over word confidences does
    (/root/reference/pero_ocr/core/layout.py:778-847, the ``get_quality``
    bbox-filtered power mean). 0.0 when nothing is kept (dropped page).

    Shared verbatim by the Ray stage and the SQL oracle mirror (which
    recomputes ln/exp/pow in DuckDB); callers serialize as
    ``floor(q * 1e6)`` so the hash gate is float-rounding-proof."""
    confs = [block_confidence(b["score"]) for b in blocks if b.get("keep")]
    if not confs:
        return 0.0
    return (sum(c ** p for c in confs) / len(confs)) ** (1.0 / p)
