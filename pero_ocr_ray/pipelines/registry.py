"""Config-assembled pipelines: the user-extension surface.

Mirror of the reference's INI-driven stage assembly — ``PAGE_PARSER``
sections dispatched by METHOD strings through ``layout_parser_factory``
(/root/reference/pero_ocr/document_ocr/page_parser.py:29-51,457-483): a
registry maps stage names to builders; a pipeline spec (list of
``{"stage": name, **params}``) compiles onto a Dataset as a chain of
``map_batches`` calls. Users extend the engine by registering a builder.

A builder has signature ``(ds, cfg, **params) -> ds``. Every built-in
builder accepts ``ray_remote_args`` (a dict merged into the stage's
``map_batches`` call) so a spec can schedule a heavy stage on specific
resources — ``{"stage": "classify", "ray_remote_args": {"num_gpus": 1}}``
mirrors the reference's GPU placement of its parser/OCR engines
(/root/reference/user_scripts/parse_folder.py:105-115 safe_gpu). Defaults
(e.g. ``num_cpus=1`` on actor pools) apply unless the spec overrides them.
"""

from __future__ import annotations

import functools

from pero_ocr_ray.kernels.config import ExtractConfig, DEFAULT_CONFIG
from pero_ocr_ray.stages.extract import (
    ClassifyStage, ParseExtractStage, decode_stage, emit_stage, order_stage,
    parse_stage, segment_stage,
)

STAGE_REGISTRY: dict = {}


def register_stage(name: str):
    def deco(builder):
        STAGE_REGISTRY[name] = builder
        return builder
    return deco


def _remote_args(defaults: dict, override: dict | None) -> dict:
    """Merge per-stage scheduling defaults with the spec's
    ``ray_remote_args`` (spec wins)."""
    return {**defaults, **(override or {})}


def _vector_stage(fn):
    def builder(ds, cfg: ExtractConfig, batch_size: int | None = None,
                ray_remote_args: dict | None = None, **_):
        return ds.map_batches(functools.partial(fn, cfg=cfg),
                              batch_format="pyarrow",
                              batch_size=batch_size or cfg.vector_batch_size,
                              **(ray_remote_args or {}))
    return builder


STAGE_REGISTRY.update({
    "decode": _vector_stage(decode_stage),
    "parse": lambda ds, cfg, **p: ds.map_batches(
        functools.partial(parse_stage, cfg=cfg), batch_format="pyarrow",
        batch_size=p.get("batch_size", cfg.parse_batch_size),
        **(p.get("ray_remote_args") or {})),
    "segment": _vector_stage(segment_stage),
    "order": _vector_stage(order_stage),
    "emit": _vector_stage(emit_stage),
})


@register_stage("classify")
def _classify(ds, cfg: ExtractConfig, concurrency: int = 2,
              ray_remote_args: dict | None = None, **_):
    return ds.map_batches(ClassifyStage,
                          fn_constructor_kwargs={"cfg": cfg.to_dict()},
                          batch_format="pyarrow",
                          batch_size=cfg.vector_batch_size,
                          concurrency=concurrency,
                          **_remote_args({"num_cpus": 1}, ray_remote_args))


@register_stage("extract_fused")
def _fused(ds, cfg: ExtractConfig, concurrency: int = 2,
           ray_remote_args: dict | None = None, **_):
    return ds.map_batches(ParseExtractStage,
                          fn_constructor_kwargs={"cfg": cfg.to_dict()},
                          batch_format="pyarrow",
                          batch_size=cfg.parse_batch_size,
                          concurrency=concurrency,
                          **_remote_args({"num_cpus": 1}, ray_remote_args))


@register_stage("to_pagexml")
def _to_pagexml(ds, cfg: ExtractConfig, **_):
    """Serialize the nested blocks state to real PAGE-XML strings (W1)."""
    from pero_ocr_ray.sources.pagexml import to_pagexml_stage
    return ds.map_batches(functools.partial(to_pagexml_stage, cfg=cfg),
                          batch_format="pyarrow",
                          batch_size=cfg.vector_batch_size)


@register_stage("from_pagexml")
def _from_pagexml(ds, cfg: ExtractConfig, **_):
    """Parse PAGE-XML strings back into the nested blocks state (S2)."""
    from pero_ocr_ray.sources.pagexml import from_pagexml_stage
    return ds.map_batches(functools.partial(from_pagexml_stage, cfg=cfg),
                          batch_format="pyarrow",
                          batch_size=cfg.vector_batch_size)


@register_stage("to_alto")
def _to_alto(ds, cfg: ExtractConfig, min_line_confidence: float = 0.0, **_):
    """Serialize kept blocks to ALTO v2 strings (W2)."""
    from pero_ocr_ray.sources.pagexml import to_alto_stage
    return ds.map_batches(
        functools.partial(to_alto_stage, cfg=cfg,
                          min_line_confidence=min_line_confidence),
        batch_format="pyarrow", batch_size=cfg.vector_batch_size)


@register_stage("to_alto_aligned")
def _to_alto_aligned(ds, cfg: ExtractConfig,
                     min_line_confidence: float = 0.0, **_):
    """ALTO v2 with WC word confidences from CTC Viterbi forced alignment
    (F2 wired into W2; kernels/ctc_align.py)."""
    from pero_ocr_ray.sources.pagexml import to_alto_aligned_stage
    return ds.map_batches(
        functools.partial(to_alto_aligned_stage, cfg=cfg,
                          min_line_confidence=min_line_confidence),
        batch_format="pyarrow", batch_size=cfg.vector_batch_size)


@register_stage("beam_decode")
def _beam_decode(ds, cfg: ExtractConfig, concurrency: int = 2,
                 batch_size: int = 32, ray_remote_args: dict | None = None,
                 **params):
    """LM-carryover beam decoding as a spec stage (A5). ``lm_factory``
    may be a ``"module:attr"`` string naming a user LM factory — the
    decoding_itf.py:107-136 construction-path analog; see
    stages/beamdecode.py for the LM protocol."""
    from pero_ocr_ray.stages.beamdecode import BeamDecodeStage
    return ds.map_batches(BeamDecodeStage, fn_constructor_kwargs=params,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency,
                          **_remote_args({"num_cpus": 1}, ray_remote_args))


@register_stage("image_features")
def _image_features(ds, cfg: ExtractConfig, concurrency: int = 2,
                    batch_size: int = 32, codec=None,
                    ray_remote_args: dict | None = None, **_):
    """Multimodal feature extraction as a spec stage. ``codec`` may be a
    ``"module:attr"`` string naming a real decoder (e.g. a cv2.imdecode
    wrapper) — the documented deployment seam; resolved once per actor
    (stages/multimodal.py module docstring)."""
    from pero_ocr_ray.stages.multimodal import image_features
    return image_features(ds, concurrency=concurrency,
                          batch_size=batch_size, codec=codec,
                          ray_remote_args=ray_remote_args)


@register_stage("audio_features")
def _audio_features(ds, cfg: ExtractConfig, concurrency: int = 2,
                    batch_size: int = 32, codec=None,
                    ray_remote_args: dict | None = None, **_):
    from pero_ocr_ray.stages.multimodal import audio_features
    return audio_features(ds, concurrency=concurrency,
                          batch_size=batch_size, codec=codec,
                          ray_remote_args=ray_remote_args)


@register_stage("image_resize")
def _image_resize(ds, cfg: ExtractConfig, out_w: int = 8, out_h: int = 8,
                  concurrency: int = 2, batch_size: int = 32, codec=None,
                  ray_remote_args: dict | None = None, **_):
    from pero_ocr_ray.stages.multimodal import resize_images
    return resize_images(ds, out_w=out_w, out_h=out_h,
                         concurrency=concurrency, batch_size=batch_size,
                         codec=codec, ray_remote_args=ray_remote_args)


@register_stage("video_frames")
def _video_frames(ds, cfg: ExtractConfig, every_k: int = 4,
                  concurrency: int = 2, batch_size: int = 8, codec=None,
                  ray_remote_args: dict | None = None, **_):
    from pero_ocr_ray.stages.multimodal import video_frame_samples
    return video_frame_samples(ds, every_k=every_k, concurrency=concurrency,
                               batch_size=batch_size, codec=codec,
                               ray_remote_args=ray_remote_args)


@register_stage("checkpoint")
def _checkpoint(ds, cfg: ExtractConfig, path: str = "", **_):
    """Write the current intermediate table to parquet and continue from the
    materialized checkpoint (PAGE-XML round-trip analog, SURVEY §2.1 S2)."""
    import os
    import ray.data as rd
    ds.write_parquet(path)
    files = sorted(os.path.join(path, f) for f in os.listdir(path)
                   if f.endswith(".parquet"))
    return rd.read_parquet(files)


DEFAULT_SPEC = [
    {"stage": "decode"}, {"stage": "parse"}, {"stage": "segment"},
    {"stage": "classify"}, {"stage": "order"}, {"stage": "emit"},
]


def build_from_spec(ds, spec: list[dict] | None = None,
                    cfg: ExtractConfig = DEFAULT_CONFIG):
    """Compile a pipeline spec onto a Dataset."""
    for step in (spec or DEFAULT_SPEC):
        params = {k: v for k, v in step.items() if k != "stage"}
        name = step["stage"]
        if name not in STAGE_REGISTRY:
            raise KeyError(f"unknown stage {name!r}; registered: "
                           f"{sorted(STAGE_REGISTRY)}")
        ds = STAGE_REGISTRY[name](ds, cfg, **params)
    return ds
