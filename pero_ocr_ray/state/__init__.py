"""Shared job state: manifests for resumable output."""

from pero_ocr_ray.state.manifest import Manifest  # noqa: F401
