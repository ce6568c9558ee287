"""Job entrypoint for ``ray job submit`` (north_rule: runs via ray job
submit on fixed-size clusters).

Usage (cluster):
    ray job submit --working-dir . -- \
        python -m ocr_lib_ray.cli extract --input <pages-parquet-dir> \
            --output /data/out --partitions 256 --resume

Usage (local sandbox):
    python -m ocr_lib_ray.cli extract --sf-dir /root/testdata/sf0.001 \
        --output /tmp/out

``--input`` reads a real pages table (input_hint schema);
``--sf-dir`` synthesizes the deterministic fixture pages from the
documents table instead.  Exactly one of the two is required.

This is the only module besides bench.py/tests that owns a Ray session.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ocr_lib_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("extract", help="run the extraction job")
    ex.add_argument("--input", help="pages parquet dir (url, warc_ts, html, text, lang)")
    ex.add_argument("--sf-dir", help="testdata dir; synthesize fixture pages")
    ex.add_argument("--output", required=True, help="job output root")
    ex.add_argument("--partitions", type=int, default=16)
    ex.add_argument("--repeat", type=int, default=1)
    ex.add_argument("--resume", action="store_true", default=True)
    ex.add_argument("--no-resume", dest="resume", action="store_false")
    ex.add_argument("--skew-route", action="store_true")
    va = sub.add_parser("validate", help="audit a job's partitions against its manifests")
    va.add_argument("--output", required=True, help="job output root to audit")
    args = p.parse_args(argv)

    if args.cmd == "validate":
        from .stages.manifest import validate_job

        result = validate_job(args.output)
        print(json.dumps(result))
        return 0 if not result["invalid"] else 1

    if bool(args.input) == bool(args.sf_dir):
        p.error("exactly one of --input / --sf-dir is required")

    import ray

    if not ray.is_initialized():
        ray.init(logging_level="ERROR")  # on a cluster: RAY_ADDRESS from env
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from .config import ExtractConfig
    from .pipelines.extract import (
        build_pages_dataset,
        extract_pipeline,
        write_with_manifest,
    )

    cfg = ExtractConfig(num_partitions=args.partitions)
    t0 = time.time()
    if args.input:
        pages = rd.read_parquet(args.input)
    else:
        pages = build_pages_dataset(args.sf_dir, repeat=args.repeat)
    extracted = extract_pipeline(pages, cfg, skew_route=args.skew_route)
    stats = write_with_manifest(extracted, args.output, resume=args.resume)
    stats["wall_sec"] = round(time.time() - t0, 3)
    print(json.dumps(stats))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
