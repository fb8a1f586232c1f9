"""Pure extraction kernels — no Ray imports.

These functions are the engine's deterministic ground truth: the
single-threaded oracle (``ocr_processor_ray.oracle``) loops over rows
calling them, and the distributed pipeline calls the same kernels inside
``map_batches`` actors. Tests assert the distributed output equals the
single-threaded oracle per turn (the analog of the reference's sidecar
text being the ground-truth artifact, ocr_combined.py:169,196).
"""

from ocr_processor_ray.extract.normalize import normalize_inline, normalize_text
from ocr_processor_ray.extract.sniff import sniff_kind
from ocr_processor_ray.extract.core import ParseError, extract_turn

__all__ = [
    "normalize_inline",
    "normalize_text",
    "sniff_kind",
    "ParseError",
    "extract_turn",
]
