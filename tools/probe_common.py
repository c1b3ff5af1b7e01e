"""Shared helpers for the resilience probes (spill_probe / fault_probe).

Both probes prove output parity by fingerprinting the lineage manifests;
the fingerprint MUST be computed identically in both or their outputs stop
being comparable — hence one shared implementation.
"""

from __future__ import annotations

import hashlib
import json
import os


def manifest_fingerprint(out_dir: str) -> tuple[int, str]:
    """(bucket_count, 16-hex fingerprint) over the sorted set of
    (manifest file, rows, order-insensitive content checksum) tuples."""
    rows = []
    for f in sorted(os.listdir(out_dir)):
        if f.endswith(".manifest.json"):
            with open(os.path.join(out_dir, f)) as fh:
                meta = json.load(fh)
            rows.append((f, int(meta["rows"]), meta["checksum"]))
    fp = hashlib.sha256(json.dumps(sorted(rows)).encode()).hexdigest()[:16]
    return len(rows), fp
