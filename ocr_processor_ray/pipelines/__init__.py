"""End-to-end Dataset pipelines."""

from ocr_processor_ray.pipelines.extract_pipeline import (
    extract_turns,
    read_transcripts,
    run_extract,
)

__all__ = ["extract_turns", "read_transcripts", "run_extract"]
