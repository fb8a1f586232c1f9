"""Flagship pipeline: transcript Parquet → per-turn extracted output.

The Ray-Data-first replacement for the reference's sequential per-file
loop (``process_input`` → ``ocr_process``, ocr_combined.py:232-264):

    read_parquet (column-pruned)
      → map_batches(ExtractTurns actor pool)   # row-local, no shuffle
      → write_parquet / counters / groupby-conv assembly

Per-turn extraction is row-local, so the hot path carries **no
shuffle** — that is what makes 10^12-turn streaming viable. Ordering is
keyed, not positional: every output row carries ``(conv_id, turn_idx)``,
and stages needing in-conversation order (conversation assembly,
checkpoint partition writes) sort *within their group/partition* only.
"""

from __future__ import annotations

import functools

import ray.data as rd
from ray.data import Dataset

from ocr_processor_ray.config import ExtractConfig
from ocr_processor_ray.stages.extractor import ExtractTurns, extract_batch

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
# columns the extraction stage actually consumes — pruned at the read
EXTRACT_COLUMNS = ["conv_id", "turn_idx", "role", "text"]


def read_transcripts(
    path: str | list[str],
    columns: list[str] | None = None,
    num_blocks: int | None = None,
) -> Dataset:
    """Column-pruned Parquet read of a transcripts table.

    ``num_blocks`` caps the read fan-out: Ray's parallelism heuristic
    over-splits small corpora into hundreds of tiny blocks and every
    downstream all-to-all pays coordination overhead per block. Leave
    None at real scale (size-based splitting)."""
    if num_blocks:
        return rd.read_parquet(
            path, columns=columns or EXTRACT_COLUMNS, override_num_blocks=num_blocks
        )
    return rd.read_parquet(path, columns=columns or EXTRACT_COLUMNS)


def extract_turns(ds: Dataset, cfg: ExtractConfig | None = None) -> Dataset:
    """Attach the extraction stage. Lazy; no shuffle.

    Default: stateless task pool (``extract_batch``) — elastic, no pool
    management, warm module state in reused workers. With
    ``cfg.use_actor_pool``: fixed/autoscaling actor pool for heavy
    per-worker init.
    """
    cfg = cfg or ExtractConfig()
    if cfg.use_actor_pool:
        return ds.map_batches(
            ExtractTurns,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.batch_size,
            concurrency=cfg.concurrency,
            num_cpus=cfg.num_cpus,
        )
    return ds.map_batches(
        functools.partial(
            extract_batch, mode=cfg.mode, max_payload_bytes=cfg.max_payload_bytes
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )


def run_extract(
    in_path: str | list[str],
    cfg: ExtractConfig | None = None,
    out_dir: str | None = None,
) -> Dataset:
    """Build the flagship pipeline; write Parquet when ``out_dir`` given.

    For checkpointed/resumable output use
    ``ocr_processor_ray.state.checkpoint.run_checkpointed`` instead.
    """
    nb = cfg.read_num_blocks if cfg is not None else None
    ds = extract_turns(read_transcripts(in_path, num_blocks=nb), cfg)
    if out_dir is not None:
        ds.write_parquet(out_dir)
    return ds
