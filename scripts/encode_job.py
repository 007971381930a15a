"""Cluster entrypoint for the resumable encode job — the script a user
submits with `ray job submit` on a real multi-node cluster:

    ray job submit --address http://<head>:8265 \
        --working-dir . \
        -- python scripts/encode_job.py s3://bucket/source-code-parquet/ \
           /mnt/shared/encoded --block-rows 8000 --stats page

In-cluster, `ray.init(address="auto")` attaches to the running cluster;
standalone (no running Ray instance), the ConnectionError falls back to
local mode so the script works in both environments. The out_root must live on storage every node can
reach (the manifest is the resume log). This sandbox has no dashboard /
job server, so the submission itself cannot be exercised here — the
entrypoint logic is what run_encode_job tests cover.
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> int:
    p = argparse.ArgumentParser(description="rayenc resumable encode job")
    p.add_argument("input", help="parquet file/dir of (repo,path,commit,lang,content)")
    p.add_argument("out_root", help="shared-storage output root (blocks/ + manifest/)")
    p.add_argument("--block-rows", type=int, default=8000)
    p.add_argument("--level", type=int, default=3)
    p.add_argument("--hash-column", default="content")
    p.add_argument("--columns", default=None)
    p.add_argument("--stats", choices=["none", "block", "page"], default="block")
    p.add_argument("--page-rows", type=int, default=None)
    p.add_argument("--decode-weight", type=float, default=0.0)
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        try:
            # in-cluster (ray job submit): attach to the running cluster
            ray.init(
                address=os.environ.get("RAY_ADDRESS", "auto"),
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
        except ConnectionError:
            # no running Ray instance: standalone local mode
            ray.init(
                address="local", ignore_reinit_error=True, logging_level="ERROR"
            )
    from rayenc.jobs import run_encode_job

    summary = run_encode_job(
        args.input,
        args.out_root,
        columns=args.columns.split(",") if args.columns else None,
        block_rows=args.block_rows,
        level=args.level,
        hash_column=args.hash_column or None,
        stats=args.stats,
        page_rows=args.page_rows,
        decode_weight=args.decode_weight,
    )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
