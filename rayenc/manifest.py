"""Checkpoint manifest: per-partition codec lineage, metrics, commit log.

The reference has no checkpointing — `process.sh` reprocesses everything
(/root/reference/scripts/process.sh:42-59); the north rule requires the
opposite: a resumable commit log. Design:

- one JSON file per committed partition under ``<root>/manifest/``,
  written atomically (tmp + rename) by the worker that finished the
  partition — the idempotent-sink pattern (write-temp -> rename/commit);
- an entry records the partition's input fingerprint (path + row-group
  range), row count, per-column codec choices + sizes + timings, the
  content chain hashes of its blocks, and the output file;
- resume = `committed_ids()` -> filter the partition plan; a partially
  written output without its manifest entry is invisible and re-done.

Works on any fsspec-free shared filesystem path (NFS / local); at real
cluster scale the root lives on shared storage.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path


class Manifest:
    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        self.dir = self.root / "manifest"

    def ensure(self) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)

    def entry_path(self, partition_id: str) -> Path:
        return self.dir / f"{partition_id}.json"

    def commit(self, entry: dict) -> None:
        """Atomic publish: a partition exists iff its manifest file does."""
        self.ensure()
        pid = entry["partition_id"]
        fd, tmp = tempfile.mkstemp(dir=self.dir, prefix=f".{pid}.", suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(entry, f, separators=(",", ":"))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.entry_path(pid))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def committed_ids(self) -> set[str]:
        if not self.dir.is_dir():
            return set()
        return {p.stem for p in self.dir.glob("*.json")}

    def entries(self) -> list[dict]:
        out = []
        if not self.dir.is_dir():
            return out
        for p in sorted(self.dir.glob("*.json")):
            with open(p) as f:
                out.append(json.load(f))
        return out

    def summary(self) -> dict:
        es = self.entries()
        src = sum(e.get("source_bytes", 0) for e in es)
        enc = sum(e.get("encoded_bytes", 0) for e in es)
        codec_counts: dict[str, int] = {}
        for e in es:
            for col, info in e.get("columns", {}).items():
                for codec, cnt in info.get("codecs", {}).items():
                    codec_counts[f"{col}:{codec}"] = (
                        codec_counts.get(f"{col}:{codec}", 0) + cnt
                    )
        return {
            "partitions": len(es),
            "rows": sum(e.get("rows", 0) for e in es),
            "blocks": sum(e.get("blocks", 0) for e in es),
            "source_bytes": src,
            "encoded_bytes": enc,
            "ratio": (enc / src) if src else None,
            "codec_counts": codec_counts,
        }
