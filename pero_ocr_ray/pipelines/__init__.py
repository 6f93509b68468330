"""Pipeline assembly: declarative specs compiled to map_batches chains."""

from pero_ocr_ray.pipelines.extract import (  # noqa: F401
    extract_pipeline, read_pages, dedup_pages, run_job,
)
