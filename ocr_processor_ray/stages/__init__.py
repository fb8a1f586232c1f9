"""Ray Data stages: stateless batch functions and stateful actor classes."""

from ocr_processor_ray.stages.sniff import sniff_batch
from ocr_processor_ray.stages.extractor import ExtractTurns

__all__ = ["sniff_batch", "ExtractTurns"]
