"""Per-partition lineage manifests — the resume/checkpoint layer.

The reference appends everything to one shared fd (migrate.php:87-88) and has
no resume story (rerun everything). Here every output partition (a
subject-hash bucket, ≈ the md5-prefix sharding of migrate-bvm.py:412-418) is
written atomically (tmp file + rename) together with a manifest JSON carrying
lineage: source path, row count, order-insensitive content checksum, engine
version. A rerun verifies/skips committed buckets.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

MANIFEST_SUFFIX = ".manifest.json"


def content_checksum(table: pa.Table, columns: list[str]) -> str:
    """Order-insensitive checksum: XOR of vectorized per-row 64-bit hashes.
    Commutative, so block order / shuffle nondeterminism never changes it.
    (pandas hash_pandas_object: C-speed siphash with a fixed default key —
    stable across processes; recorded manifests are only comparable within
    one pandas major version, which is fine for job-resume lineage.)"""
    if table.num_rows == 0:
        return "0" * 16
    import pandas as pd

    df = table.select(columns).to_pandas()
    hashes = pd.util.hash_pandas_object(df, index=False).to_numpy()
    acc = int(np.bitwise_xor.reduce(hashes))
    return f"{acc & 0xFFFFFFFFFFFFFFFF:016x}"


def manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, f"bucket={bucket:05d}{MANIFEST_SUFFIX}")


def write_manifest(out_dir: str, bucket: int, meta: dict) -> None:
    from ..functions.arrowutils import hash_fingerprint

    meta.setdefault("hash_fp", hash_fingerprint())
    p = manifest_path(out_dir, bucket)
    tmp = p + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.rename(tmp, p)


def _bucket_verifies(out_dir: str, meta: dict) -> bool:
    """EVERY fragment listed in the manifest must exist and verify — a
    truncated or partially deleted fragment set must NOT be treated as
    committed (it would be silently skipped on resume, losing rows).
    Parquet fragments verify by footer row counts (metadata-only read, no
    data pages — cheap even for thousands of buckets); text fragments (.nt)
    verify by the recorded per-file byte sizes."""
    files = meta.get("files", [meta["file"]])
    sizes = meta.get("sizes")
    if sizes is not None:
        if len(sizes) != len(files):
            return False
        return all(os.path.exists(os.path.join(out_dir, f))
                   and os.path.getsize(os.path.join(out_dir, f)) == int(s)
                   for f, s in zip(files, sizes))
    total = 0
    for f in files:
        p = os.path.join(out_dir, f)
        if not os.path.exists(p):
            return False
        try:
            import pyarrow.parquet as pq

            total += pq.ParquetFile(p).metadata.num_rows
        except Exception:
            return False  # truncated/corrupt footer
    return total == int(meta["rows"])


def assert_source_matches(done: dict[int, dict], source: str) -> None:
    """Refuse a resume that would silently drop rows — two identity checks:

    1. INPUT identity: buckets are subject-hash partitions, so new input rows
       land in EVERY bucket — skipping committed buckets from another source
       would silently drop their new rows. Enforced only when both the
       recorded and current source are non-empty (tests and ad-hoc writes
       pass source='').
    2. HASH-FUNCTION identity: bucket assignment is polars' hash(seed=0),
       stable only per polars version. After an upgrade, rows that newly hash
       into an already-committed bucket would be silently dropped on resume.
       Manifests record a probe fingerprint (arrowutils.hash_fingerprint);
       mismatch refuses resume. Manifests predating the fingerprint (no
       'hash_fp' key) are tolerated as legacy."""
    from ..functions.arrowutils import hash_fingerprint

    fp = hash_fingerprint()
    bad_fp = sorted({m.get("hash_fp") for m in done.values()}
                    - {None, fp})
    if bad_fp:
        raise ValueError(
            f"resume refused: committed buckets were written with a "
            f"different bucket-hash function (fingerprint(s) {bad_fp}; "
            f"current {fp!r} — polars version change?). Resuming would "
            f"silently drop rows that now hash into committed buckets. "
            f"Use resume=False (full rewrite) or a fresh output dir.")
    if not source:
        return
    others = sorted({m.get("source", "") for m in done.values()}
                    - {"", source})
    if others:
        raise ValueError(
            f"resume refused: output dir holds buckets committed from "
            f"different source(s) {others}; current source is {source!r}. "
            f"Use resume=False (full rewrite) or a fresh output dir.")


def committed_buckets(out_dir: str) -> dict[int, dict]:
    """Buckets whose manifest exists AND whose every data file verifies
    (existence + footer row counts vs the recorded lineage)."""
    out: dict[int, dict] = {}
    if not os.path.isdir(out_dir):
        return out
    for name in os.listdir(out_dir):
        if not name.endswith(MANIFEST_SUFFIX):
            continue
        try:
            with open(os.path.join(out_dir, name)) as f:
                meta = json.load(f)
            if _bucket_verifies(out_dir, meta):
                out[int(meta["bucket"])] = meta
        except (json.JSONDecodeError, KeyError, ValueError):
            continue
    return out
