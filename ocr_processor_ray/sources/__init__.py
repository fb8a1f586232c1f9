"""Sources: Parquet readers and the deterministic transcript generator."""

from ocr_processor_ray.sources.synth import make_transcripts, write_transcripts

__all__ = ["make_transcripts", "write_transcripts"]
