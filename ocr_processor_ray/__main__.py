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


def _query_main(argv: list[str]) -> int:
    """``python -m ocr_processor_ray query <name> <sf_dir> --out DIR``:
    run one catalog query and export its result."""
    p = argparse.ArgumentParser(prog="ocr_processor_ray query")
    p.add_argument("name", help="catalog query name (see queries_catalog.QUERIES)")
    p.add_argument("sf_dir", help="directory with the parquet tables")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--format", default="parquet", choices=["parquet", "json", "csv"])
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        from ocr_processor_ray.pipelines.export import export_result
        from ocr_processor_ray.queries_catalog import QUERIES

        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}; known: {', '.join(sorted(QUERIES))}",
                  file=sys.stderr)
            return 2
        export_result(QUERIES[args.name](args.sf_dir), args.out, args.format)
        print(json.dumps({"query": args.name, "out": args.out, "format": args.format}))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


def _compact_main(argv: list[str]) -> int:
    """``python -m ocr_processor_ray compact <src> <dst> --partitions N``:
    rewrite a completed output root into fewer partitions (same layout,
    manifests and atomicity as the original run; resumable)."""
    p = argparse.ArgumentParser(prog="ocr_processor_ray compact")
    p.add_argument("src", help="completed output root (part=NNNNN/ layout)")
    p.add_argument("dst", help="destination root (must differ from src)")
    p.add_argument("--partitions", type=int, required=True)
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        from ocr_processor_ray.state.compact import compact_output

        summary = compact_output(args.src, args.dst, args.partitions)
        json.dump(summary, sys.stdout, indent=1, sort_keys=True)
        print()
        return 0
    finally:
        if owns_session:
            ray.shutdown()


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "query":
        return _query_main(argv[1:])
    if argv and argv[0] == "compact":
        return _compact_main(argv[1:])
    p = argparse.ArgumentParser(prog="ocr_processor_ray")
    p.add_argument("input", help="transcript file/dir (or comma-separated list)")
    p.add_argument("output", help="output directory (part=NNNNN/ layout)")
    p.add_argument("--mode", default="cli", choices=["cli", "force", "visual"])
    p.add_argument("--input-format", default="parquet",
                   choices=["parquet", "json", "csv"])
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
        summary = run_checkpointed(
            in_path, args.output, cfg, input_format=args.input_format
        )
        json.dump(summary, sys.stdout, indent=1, sort_keys=True)
        print()
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
