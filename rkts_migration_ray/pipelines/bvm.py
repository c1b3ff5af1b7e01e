"""BVM pipeline: co-grouped ordered merge of pagination ⟂ image lists.

Ray-Data shape of the reference's per-file driver loop (migrate-bvm.py
:395-418 glob → migrate_one_file): the two inputs are unified into one
stream with a source tag, hash-bucketed by volume id, and every bucket's
volumes are reconciled inside ONE map_groups call (SURVEY.md J7: "per-group
sorted merge … as-of-style ordered join within group"). A bucket holds every
pagination row AND every image-list row of its volumes, so the per-volume
merge is exact; buckets scale with the cluster (scale_buckets). No driver
materialization, no broadcast of the (data-proportional) image lists.

Per-volume semantics live in stages/bvm.py (validate_volume /
build_manifest), cited line-by-line against migrate-bvm.py:189-356.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import fixtures
from ..functions.arrowutils import from_pandas_clean, hash_bucket, scale_buckets
from ..stages import bvm

MANIFEST_SCHEMA = pa.schema([
    ("vol_id", pa.string()), ("seq", pa.int64()), ("filename", pa.string()),
    ("pagination", pa.string()), ("psection", pa.string()),
    ("imggroup", pa.string()), ("hidden", pa.bool_()), ("tags", pa.string()),
])
MANIFEST_COLUMNS = [f.name for f in MANIFEST_SCHEMA]

QUARANTINE_SCHEMA = pa.schema([
    ("vol_id", pa.string()), ("idx", pa.int64()), ("rule", pa.string()),
    ("detail", pa.string()),
])
QUARANTINE_COLUMNS = [f.name for f in QUARANTINE_SCHEMA]


def _tagged_union(sf_dir: str):
    """pagination ∪ image_list under one schema (src 0/1) + volume bucket."""
    import ray.data as rd

    fixtures.ensure_fixture(sf_dir)
    nb = scale_buckets(floor=64, per_cpu=4)

    def pag_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "vol_id": t["vol_id"], "src": pa.array(np.zeros(n, np.int8)),
            "ord": t["idx"], "pagination": t["pagination"],
            "psection": t["psection"], "file": t["file"],
            "filename": pa.nulls(n, pa.string()),
        }).append_column("vbucket", hash_bucket(t["vol_id"], nb))

    def img_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "vol_id": t["vol_id"], "src": pa.array(np.ones(n, np.int8)),
            "ord": t["pos"], "pagination": pa.nulls(n, pa.string()),
            "psection": pa.nulls(n, pa.string()),
            "file": pa.nulls(n, pa.string()), "filename": t["filename"],
        }).append_column("vbucket", hash_bucket(t["vol_id"], nb))

    pag = rd.read_parquet(fixtures.aux_path(sf_dir, "pagination")) \
            .map_batches(pag_rows, batch_format="pyarrow")
    img = rd.read_parquet(fixtures.aux_path(sf_dir, "image_list")) \
            .map_batches(img_rows, batch_format="pyarrow")
    return pag.union(img)


def _per_volume(df: pd.DataFrame, which: str) -> pa.Table:
    """One bucket of whole volumes → manifest or quarantine rows."""
    out_frames = []
    df = df.sort_values(["vol_id", "src", "ord"], kind="stable")
    for vol_id, g in df.groupby("vol_id", sort=False):
        pag = g[g["src"] == 0]
        pag_rows = [{"idx": int(i), "pagination": p,
                     "psection": ps if ps else "",
                     "file": None if f is None or (isinstance(f, float)) else f}
                    for i, p, ps, f in zip(pag["ord"], pag["pagination"],
                                           pag["psection"], pag["file"])]
        img_filenames = list(g.loc[g["src"] == 1, "filename"])
        if which == "manifests":
            rows = bvm.build_manifest(vol_id, pag_rows, img_filenames)
            out_frames.append(pd.DataFrame(
                rows, columns=MANIFEST_COLUMNS if rows else MANIFEST_COLUMNS))
        else:
            rows = bvm.validate_volume(vol_id, pag_rows, img_filenames)
            out_frames.append(pd.DataFrame(
                rows, columns=QUARANTINE_COLUMNS if rows else QUARANTINE_COLUMNS))
    schema = MANIFEST_SCHEMA if which == "manifests" else QUARANTINE_SCHEMA
    if not out_frames:
        return schema.empty_table()
    out = pd.concat(out_frames, ignore_index=True)
    if len(out) == 0:
        return schema.empty_table()
    return from_pandas_clean(out[[f.name for f in schema]], schema=schema)


def _grouped(sf_dir: str, which: str):
    return (_tagged_union(sf_dir)
            .groupby("vbucket")
            .map_groups(lambda df: _per_volume(df, which),
                        batch_format="pandas"))


def bvm_manifests_ds(sf_dir: str):
    """Final ordered imagelists (the BVM 'view1' imagelist of
    migrate-bvm.py:317-352 + boilerplate view, flattened to rows)."""
    return _grouped(sf_dir, "manifests")


def bvm_quarantine_ds(sf_dir: str):
    """Validation error channel (migrate-bvm.py:238-282 print statements as
    typed quarantine rows)."""
    return _grouped(sf_dir, "quarantine")
