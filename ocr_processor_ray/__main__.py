"""CLI entry point — the single-entry analog of the reference's
``python ocr_combined.py <path> --mode … --lang …`` (ocr_combined.py:266-334),
launchable locally or via ``ray job submit -- python -m ocr_processor_ray …``.

Runs the checkpointed flagship extraction: resumable, partitioned output
with per-partition manifests and a job-summary JSON.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ocr_processor_ray")
    p.add_argument("input", help="transcript parquet file/dir (or comma-separated list)")
    p.add_argument("output", help="output directory (part=NNNNN/ layout)")
    p.add_argument("--mode", default="cli", choices=["cli", "force", "visual"])
    p.add_argument("--partitions", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus when starting a fresh local session")
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        from ocr_processor_ray.config import ExtractConfig
        from ocr_processor_ray.state.checkpoint import run_checkpointed

        cfg = ExtractConfig(
            mode=args.mode,
            num_output_partitions=args.partitions,
            batch_size=args.batch_size,
        )
        in_path = args.input.split(",") if "," in args.input else args.input
        summary = run_checkpointed(in_path, args.output, cfg)
        json.dump(summary, sys.stdout, indent=1, sort_keys=True)
        print()
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
