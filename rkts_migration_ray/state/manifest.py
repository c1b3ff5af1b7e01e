"""Per-partition lineage manifests — the resume/checkpoint layer.

The reference appends everything to one shared fd (migrate.php:87-88) and has
no resume story (rerun everything). Here every output partition (a
subject-hash bucket, ≈ the md5-prefix sharding of migrate-bvm.py:412-418) is
written atomically (tmp file + rename) together with a manifest JSON carrying
lineage: source path, row count, order-insensitive content checksum, engine
version. A rerun verifies/skips committed buckets.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa

MANIFEST_SUFFIX = ".manifest.json"


def content_checksum(table: pa.Table, columns: list[str]) -> str:
    """Order-insensitive checksum: XOR of per-row sha256-derived 64-bit words.
    Commutative, so block order / shuffle nondeterminism never changes it."""
    if table.num_rows == 0:
        return "0" * 16
    cols = [table[c].to_pylist() for c in columns]
    acc = 0
    for row in zip(*cols):
        h = hashlib.sha256("\x1f".join("" if v is None else str(v) for v in row).encode())
        acc ^= int.from_bytes(h.digest()[:8], "big")
    return f"{acc:016x}"


def manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, f"bucket={bucket:05d}{MANIFEST_SUFFIX}")


def write_manifest(out_dir: str, bucket: int, meta: dict) -> None:
    p = manifest_path(out_dir, bucket)
    tmp = p + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.rename(tmp, p)


def committed_buckets(out_dir: str) -> dict[int, dict]:
    """Buckets whose manifest exists AND whose data file matches it."""
    out: dict[int, dict] = {}
    if not os.path.isdir(out_dir):
        return out
    for name in os.listdir(out_dir):
        if not name.endswith(MANIFEST_SUFFIX):
            continue
        try:
            with open(os.path.join(out_dir, name)) as f:
                meta = json.load(f)
            if os.path.exists(os.path.join(out_dir, meta["file"])):
                out[int(meta["bucket"])] = meta
        except (json.JSONDecodeError, KeyError, ValueError):
            continue
    return out
