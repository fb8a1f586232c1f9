"""Pipeline configuration.

Mirrors the reference's layered config + engine-settings projection
(reference: config.py:11-178 dataclass hydrated from env; ocr_combined.py:107-145
``get_ocr_settings(mode, lang)``) as a single frozen dataclass. The three
processing modes are the reference's (ocr_combined.py:124-143):

* ``cli``    — skip payloads that are already clean text (the analog of
               ocrmypdf's ``PriorOcrFoundError`` skip, ocr_combined.py:219-222).
* ``force``  — re-extract everything, including already-clean text
               (``force_ocr=True``, ocr_combined.py:136).
* ``visual`` — like ``cli`` but additionally emit word-level spans
               (the analog of the HOCR word-bbox overlay, ocr_combined.py:84-105).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace

MODES = ("cli", "force", "visual")


@dataclass(frozen=True)
class ExtractConfig:
    """Frozen config for the extraction pipeline.

    Scale notes (defaults target a multi-node cluster streaming Parquet):

    * ``batch_size`` is rows per actor call; payloads are multi-KB strings so
      keep it modest — a 512-row batch of 4 KB payloads is ~2 MB in, and the
      DOM expansion per row is transient.
    * ``concurrency`` is the actor-pool size; ``(min, max)`` autoscales.
      Size ``concurrency × num_cpus`` below the node's CPUs so the read /
      write stages don't starve (the reference instead used ``jobs=0`` =
      all cores inside one engine call, ocr_combined.py:120).
    * ``num_output_partitions`` drives the checkpoint layout:
      ``part = hash(conv_id) % num_output_partitions`` — a pure function of
      the input so reruns land in the same partition (resume idempotence).
    * ``salt_turn_threshold``: conversations with more turns than this are
      split into ``conv_id#k`` salted groups before a conv-level groupby
      (skew handling; per-turn extraction is row-local so the split is
      semantics-preserving).
    """

    mode: str = "cli"
    # stateless task pool by default (elastic, measured faster); flip to an
    # actor pool only when per-worker init must load heavy state (models)
    use_actor_pool: bool = False
    batch_size: int = 1024
    concurrency: tuple[int, int] | int = (2, 8)
    num_cpus: float = 1.0
    num_output_partitions: int = 64
    # read fan-out for the checkpointed path; None → one block per output
    # partition. Ray's parallelism heuristic over-splits small corpora into
    # hundreds of tiny blocks, and the sort-shuffle's coordination overhead
    # scales with block count (measured: 29 s → 11 s on a 471k-turn corpus).
    # At real scale (blocks near target_max_block_size) pass a value of 0 to
    # keep Ray's size-based splitting.
    read_num_blocks: int | None = None
    salt_turn_threshold: int = 512
    # validation gates (analog of security_validator's max_file_size,
    # security_validator.py:177-179): payloads above this many bytes are
    # classified parse_failure, not processed.
    max_payload_bytes: int = 100 * 1024 * 1024
    languages: tuple[str, ...] = ("heb", "eng")  # parity: ocr_combined.py:116

    def __post_init__(self) -> None:
        if self.mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {self.mode!r}")
        if self.batch_size <= 0:
            raise ValueError("batch_size must be positive")
        if self.num_output_partitions <= 0:
            raise ValueError("num_output_partitions must be positive")

    @property
    def skip_if_clean(self) -> bool:
        """cli/visual skip already-clean payloads; force re-extracts them."""
        return self.mode != "force"

    @property
    def emit_word_spans(self) -> bool:
        return self.mode == "visual"

    def with_mode(self, mode: str) -> "ExtractConfig":
        return replace(self, mode=mode)

    @classmethod
    def from_env(cls, **overrides) -> "ExtractConfig":
        """Env-overridable construction (parity with reference config.py:77-152)."""
        env = {}
        if "OPR_MODE" in os.environ:
            env["mode"] = os.environ["OPR_MODE"]
        if "OPR_BATCH_SIZE" in os.environ:
            env["batch_size"] = int(os.environ["OPR_BATCH_SIZE"])
        if "OPR_NUM_PARTITIONS" in os.environ:
            env["num_output_partitions"] = int(os.environ["OPR_NUM_PARTITIONS"])
        env.update(overrides)
        return cls(**env)
