"""Graph materialization: bucket-partitioned Parquet + manifests + resume.

W1/W2/W5 analog (SURVEY.md §2.2): instead of one Turtle file per subject
(utils.php:844-850) and one global append-only N-Quads fd (utils.php:833-840),
the triple Dataset is hash-partitioned by subject into ``n_buckets``
directories-of-one-file, each committed atomically with a lineage manifest
(state/manifest.py). Blank-node renaming (Nquads.php:182-200) is unnecessary:
minted ids are already deterministic content hashes (M7).

Resume semantics: a rerun lists committed buckets first and drops their rows
right after the bucket-assignment map — upstream stages still stream, but no
committed partition is rewritten.

Performance notes (measured at sf0.1/32cpu): the bucket write runs as
groupby(bucket).map_groups in **pyarrow** batch format — pandas boxing of
millions of string rows cost ~4.5s/task; Arrow-native slicing + write is
~10×x cheaper. Input is coalesced to ~2×CPU blocks before the sort (sort cost
grows with input block count).
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import TRIPLE_COLUMNS
from ..state import manifest as mf


def add_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    subj = batch["subj"].to_pylist()
    buckets = np.fromiter((zlib.crc32(s.encode()) % n_buckets for s in subj),
                          dtype=np.int32, count=len(subj))
    return batch.append_column("bucket", pa.array(buckets, pa.int32()))


def write_graph(triples_ds, out_dir: str, n_buckets: int = 64,
                resume: bool = True, source: str = "") -> pd.DataFrame:
    """Write a triple Dataset → out_dir/bucket=K/part.parquet + manifests.

    Returns the (small) manifest summary DataFrame."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    done = mf.committed_buckets(out_dir) if resume else {}

    n_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    ds = triples_ds.repartition(n_blocks).map_batches(
        lambda t: add_bucket(t, n_buckets), batch_format="pyarrow")
    if done:
        done_arr = pa.array(sorted(done), pa.int32())

        def drop_done(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.invert(pc.is_in(t["bucket"], value_set=done_arr)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    def write_bucket(t: pa.Table) -> pa.Table:
        bucket = int(t["bucket"][0].as_py())
        table = t.select(TRIPLE_COLUMNS)
        bdir = os.path.join(out_dir, f"bucket={bucket:05d}")
        os.makedirs(bdir, exist_ok=True)
        final = os.path.join(bdir, "part.parquet")
        tmp = final + f".tmp.{os.getpid()}"
        pq.write_table(table, tmp)
        os.rename(tmp, final)
        meta = {
            "bucket": bucket,
            "file": os.path.join(f"bucket={bucket:05d}", "part.parquet"),
            "rows": int(table.num_rows),
            "checksum": mf.content_checksum(table, TRIPLE_COLUMNS),
            "source": source,
        }
        mf.write_manifest(out_dir, bucket, meta)
        return pa.table({"bucket": pa.array([bucket], pa.int32()),
                         "rows": pa.array([meta["rows"]], pa.int64()),
                         "checksum": pa.array([meta["checksum"]], pa.string()),
                         "skipped": pa.array([False], pa.bool_())})

    written = (ds.groupby("bucket")
                 .map_groups(write_bucket, batch_format="pyarrow")
                 .to_pandas())
    skipped = pd.DataFrame({
        "bucket": pd.Series(list(done), dtype="int32"),
        "rows": pd.Series([m["rows"] for m in done.values()], dtype="int64"),
        "checksum": [m["checksum"] for m in done.values()],
        "skipped": [True] * len(done),
    })
    return (pd.concat([written, skipped], ignore_index=True)
            .sort_values("bucket").reset_index(drop=True))
