"""ocr_processor_ray — a Ray-Data-native main-content extraction engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of the reference ``Jakobish/ocr-processor``: per-record
main-content extraction (HTML boilerplate removal, layout-stream parse
with reading-order reconstruction, tool-markup span parsing, whitespace /
encoding normalization), skip / force modes, per-item outcome counters,
and resumable partitioned output — re-expressed as streaming
``ray.data.Dataset`` pipelines over Parquet tables of multi-turn
transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.

Layout:
    extract/    pure extraction kernels (no Ray) — the reference oracle
    stages/     Ray Data map_batches stages (stateless fns + actor classes)
    pipelines/  end-to-end Dataset pipelines (flagship extraction)
    state/      checkpoint manifests, resume anti-join, counters
    functions/  training-data ops: dedup, similarity, text analysis
    sources/    readers / synthetic transcript generator
"""

from ocr_processor_ray.config import ExtractConfig

__all__ = ["ExtractConfig"]
__version__ = "0.1.0"
