"""Config-sweep selection: the ``select_embed_id`` analog.

The reference tool (/root/reference/user_scripts/select_embed_id.py:1-233)
picks the best writer-adaptation embedding for an OCR engine: it clusters
the embedding table to representatives, runs the engine once per candidate
over a small ground-truth line sample, scores each by CER, and reports the
argmin. The extraction engine's adaptation parameter is the
:class:`ExtractConfig` knob vector, so the analog selects the best
extraction config:

* :func:`select_representative_configs` — deterministic farthest-point
  clustering over the numeric knob vectors (the KMeans step, without RNG:
  the engine bans nondeterminism);
* :func:`select_best_config` — per-candidate CER over a bounded sample of
  (page, ground-truth) rows, argmin with index tie-break.

Scale shape mirrors the reference: the SAMPLE is small (``n_lines=100``
analog) and rides in one broadcastable table; each candidate run is a
short Ray pipeline over the sample, sequentially like the reference's
per-embed-id loop. This is a selection/calibration tool, not a corpus job.
"""

from __future__ import annotations

import numpy as np

import ray.data as rd

from pero_ocr_ray.kernels.align import levenshtein_distance
from pero_ocr_ray.kernels.config import ExtractConfig

_NUMERIC_KNOBS = (
    "score_threshold", "len_weight", "link_weight", "depth_soft",
    "depth_weight", "boiler_penalty", "kind_bonus_heading",
    "kind_bonus_content", "edge_min_chars", "page_min_chars",
)


def _knob_vector(cfg: ExtractConfig) -> np.ndarray:
    return np.array([float(getattr(cfg, k)) for k in _NUMERIC_KNOBS])


def select_representative_configs(configs: list[ExtractConfig],
                                  n_clusters: int) -> list[int]:
    """Indices of ``n_clusters`` representative configs: deterministic
    farthest-point traversal over standardized knob vectors (the
    select_representative_embeddings KMeans step, RNG-free; ties on the
    smaller index)."""
    if n_clusters >= len(configs):
        return list(range(len(configs)))
    mat = np.stack([_knob_vector(c) for c in configs])
    scale = mat.std(axis=0)
    scale[scale == 0] = 1.0
    mat = (mat - mat.mean(axis=0)) / scale
    chosen = [0]  # start from the first candidate (deterministic)
    dists = np.linalg.norm(mat - mat[0], axis=1)
    while len(chosen) < n_clusters:
        nxt = int(np.argmax(dists))  # argmax takes the first max: tie-break
        chosen.append(nxt)
        dists = np.minimum(dists, np.linalg.norm(mat - mat[nxt], axis=1))
    return sorted(chosen)


def _sample_cer(pages: rd.Dataset, cfg: ExtractConfig,
                gt: dict[str, str], concurrency: int) -> float:
    """Corpus CER of one candidate config over the sample (partial per-doc
    stats inside map_batches, tiny final sum)."""
    import ray
    import pandas as pd
    from ray.data.aggregate import Sum
    from pero_ocr_ray.pipelines.extract import extract_pipeline
    gt_ref = ray.put(gt)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        refs = ray.get(gt_ref)
        errs, chars = [], []
        for url, hyp in zip(df["url"], df["extracted_text"]):
            ref = refs.get(url)
            if ref is None:
                continue
            errs.append(levenshtein_distance(hyp, ref))
            chars.append(len(ref))
        return pd.DataFrame({"errs": pd.Series(errs, dtype="int64"),
                             "chars": pd.Series(chars, dtype="int64")})

    out = extract_pipeline(pages, cfg, concurrency=concurrency)
    agg = (out.map_batches(partial, batch_format="pandas")
              .aggregate(Sum("errs"), Sum("chars"))) or {}
    errs = agg.get("sum(errs)") or 0
    chars = agg.get("sum(chars)") or 0
    return (errs / chars) if chars else 0.0


def select_best_config(pages: rd.Dataset, ground_truth: dict[str, str],
                       candidates: list[ExtractConfig],
                       n_clusters: int | None = None,
                       sample_n: int = 100,
                       concurrency: int = 2) -> dict:
    """Evaluate candidate configs on a bounded (page, ground-truth) sample;
    -> {best_index, best_cer, cers, representative_ids}.

    ``ground_truth`` maps url -> expected extracted text (the transcription
    sample; small by contract — it is broadcast with ``ray.put``). The
    sample of pages is ``limit(sample_n)`` (the --n-lines analog)."""
    if n_clusters is not None:
        rep_ids = select_representative_configs(candidates, n_clusters)
    else:
        rep_ids = list(range(len(candidates)))
    sample = pages.limit(sample_n).materialize()
    cers = {}
    for i in rep_ids:
        cers[i] = _sample_cer(sample, candidates[i], ground_truth,
                              concurrency)
    best = min(rep_ids, key=lambda i: (cers[i], i))
    return {"best_index": best, "best_cer": cers[best],
            "cers": cers, "representative_ids": rep_ids}
