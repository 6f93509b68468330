"""Ray Data stages: map_batches callables over Arrow batches."""

from pero_ocr_ray.stages.extract import (  # noqa: F401
    ParseExtractStage, BLOCK_TYPE,
    decode_stage, parse_stage, segment_stage, ClassifyStage,
    order_stage, emit_stage,
)
