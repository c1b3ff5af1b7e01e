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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import TRIPLE_COLUMNS
from ..functions.arrowutils import hash_bucket
from ..state import manifest as mf


def add_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    return batch.append_column("bucket", hash_bucket(batch["subj"], n_buckets))


def write_graph(triples_ds, out_dir: str, n_buckets: int = 64,
                resume: bool = True, source: str = "") -> pd.DataFrame:
    """Write a triple Dataset → out_dir/bucket=K/part.parquet + manifests.

    Returns the (small) manifest summary DataFrame."""
    os.makedirs(out_dir, exist_ok=True)
    done = mf.committed_buckets(out_dir) if resume else {}
    mf.assert_source_matches(done, source)

    import ray

    # coalesce before the bucket shuffle: the sort's driver-side metadata and
    # scheduling cost grow with input block count (upstream unions produce
    # hundreds of small blocks and streaming repartition splits but never
    # merges), while too FEW blocks produce multi-GB blocks that stall the
    # memory budgeter. 8×CPU keeps blocks ~100-400MB across tested scales.
    n_blocks = max(16, int(ray.cluster_resources().get("CPU", 8)) * 8)
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


def write_fragments(triples_ds, out_dir: str, n_buckets: int,
                    stream_tag: str, skip_buckets=frozenset()) -> pd.DataFrame:
    """Map-only fragment write for ONE triple stream (no shuffle, no union).

    Returns the small per-fragment metadata frame; commit_manifests() merges
    the frames of all streams into per-bucket manifests. Running each stream
    as its own simple execution avoids the multi-branch union DAGs that wedge
    the streaming executor at low CPU counts."""
    os.makedirs(out_dir, exist_ok=True)
    done_set = frozenset(skip_buckets)

    def write_frags(t: pa.Table) -> pa.Table:
        t = add_bucket(t, n_buckets)
        out = {"bucket": [], "rows": [], "checksum": [], "file": []}
        buckets = t["bucket"].to_numpy()
        order = np.argsort(buckets, kind="stable")
        sorted_t = t.take(pa.array(order))
        sb = sorted_t["bucket"].to_numpy()
        edges = np.concatenate([[0], np.nonzero(np.diff(sb))[0] + 1, [len(sb)]])
        for i in range(len(edges) - 1):
            lo, hi = int(edges[i]), int(edges[i + 1])
            b = int(sb[lo])
            if b in done_set:
                continue
            frag = sorted_t.slice(lo, hi - lo).select(TRIPLE_COLUMNS)
            csum = mf.content_checksum(frag, TRIPLE_COLUMNS)
            bdir = os.path.join(out_dir, f"bucket={b:05d}")
            os.makedirs(bdir, exist_ok=True)
            fname = f"frag-{stream_tag}-{csum}.parquet"
            final = os.path.join(bdir, fname)
            tmp = final + f".tmp.{os.getpid()}"
            pq.write_table(frag, tmp)
            os.rename(tmp, final)
            out["bucket"].append(b)
            out["rows"].append(hi - lo)
            out["checksum"].append(csum)
            out["file"].append(os.path.join(f"bucket={b:05d}", fname))
        return pa.table({"bucket": pa.array(out["bucket"], pa.int32()),
                         "rows": pa.array(out["rows"], pa.int64()),
                         "checksum": pa.array(out["checksum"], pa.string()),
                         "file": pa.array(out["file"], pa.string())})

    return (triples_ds.map_batches(write_frags, batch_format="pyarrow")
            .to_pandas())


def commit_manifests(out_dir: str, frag_metas: list[pd.DataFrame],
                     done: dict, source: str = "") -> pd.DataFrame:
    """Merge fragment metadata of all streams → one manifest per bucket
    (XOR-combined checksum, commutative) + stale-fragment cleanup. A 'bytes'
    column (text sinks) is recorded as per-file 'sizes' for resume verify."""
    frag_metas = [m for m in frag_metas if "bucket" in m.columns]
    frag_meta = (pd.concat(frag_metas, ignore_index=True) if frag_metas
                 else pd.DataFrame(columns=["bucket", "rows", "checksum", "file"]))
    rows_out = []
    for b, g in frag_meta.groupby("bucket"):
        acc = 0
        for c in g["checksum"]:
            acc ^= int(c, 16)
        g = g.sort_values("file")
        files = list(g["file"])
        meta = {"bucket": int(b), "file": files[0], "files": files,
                "rows": int(g["rows"].sum()), "checksum": f"{acc:016x}",
                "source": source}
        if "bytes" in g.columns and g["bytes"].notna().all():
            meta["sizes"] = [int(x) for x in g["bytes"]]
        bdir = os.path.join(out_dir, f"bucket={int(b):05d}")
        keep = {os.path.basename(f) for f in files}
        for name in os.listdir(bdir):
            if name.startswith("frag-") and name not in keep:
                os.remove(os.path.join(bdir, name))
        mf.write_manifest(out_dir, int(b), meta)
        rows_out.append({"bucket": int(b), "rows": meta["rows"],
                         "checksum": meta["checksum"], "skipped": False})
    for b, m in done.items():
        rows_out.append({"bucket": b, "rows": m["rows"],
                         "checksum": m["checksum"], "skipped": True})
    if not rows_out:  # nothing written, nothing previously committed
        return pd.DataFrame(columns=["bucket", "rows", "checksum", "skipped"])
    return (pd.DataFrame(rows_out).sort_values("bucket").reset_index(drop=True))


def write_ntriples_fragments(triples_ds, out_dir: str, n_buckets: int,
                             stream_tag: str,
                             skip_buckets=frozenset()) -> pd.DataFrame:
    """Map-only N-Triples TEXT fragment write — the W2 analog sink
    (global.nt, utils.php:833-840) re-expressed as per-bucket ``.nt``
    fragments under the same manifest/commit scheme as the Parquet writer.
    Checksums are computed over the TRIPLE rows (order-insensitive XOR), so
    a bucket's .nt manifest checksum equals its Parquet twin's."""
    from ..functions.ntriples import lines_table

    os.makedirs(out_dir, exist_ok=True)
    done_set = frozenset(skip_buckets)

    def write_frags(t: pa.Table) -> pa.Table:
        t = add_bucket(t, n_buckets)
        out = {"bucket": [], "rows": [], "checksum": [], "file": [], "bytes": []}
        buckets = t["bucket"].to_numpy()
        order = np.argsort(buckets, kind="stable")
        sorted_t = t.take(pa.array(order))
        sb = sorted_t["bucket"].to_numpy()
        edges = np.concatenate([[0], np.nonzero(np.diff(sb))[0] + 1, [len(sb)]])
        for i in range(len(edges) - 1):
            lo, hi = int(edges[i]), int(edges[i + 1])
            b = int(sb[lo])
            if b in done_set:
                continue
            frag = sorted_t.slice(lo, hi - lo).select(TRIPLE_COLUMNS)
            csum = mf.content_checksum(frag, TRIPLE_COLUMNS)
            lines = lines_table(frag)["line"]
            payload = ("\n".join(lines.to_pylist()) + "\n").encode()
            bdir = os.path.join(out_dir, f"bucket={b:05d}")
            os.makedirs(bdir, exist_ok=True)
            fname = f"frag-{stream_tag}-{csum}.nt"
            final = os.path.join(bdir, fname)
            tmp = final + f".tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.rename(tmp, final)
            out["bucket"].append(b)
            out["rows"].append(hi - lo)
            out["checksum"].append(csum)
            out["file"].append(os.path.join(f"bucket={b:05d}", fname))
            out["bytes"].append(len(payload))
        return pa.table({"bucket": pa.array(out["bucket"], pa.int32()),
                         "rows": pa.array(out["rows"], pa.int64()),
                         "checksum": pa.array(out["checksum"], pa.string()),
                         "file": pa.array(out["file"], pa.string()),
                         "bytes": pa.array(out["bytes"], pa.int64())})

    return (triples_ds.map_batches(write_frags, batch_format="pyarrow")
            .to_pandas())


def write_graph_ntriples(streams: dict, out_dir: str, n_buckets: int = 64,
                         resume: bool = True, source: str = "") -> pd.DataFrame:
    """Materialize the kg_bundle streams as bucket-partitioned N-Triples text
    (the reference's real output format) with the same manifest/resume
    machinery as write_graph_streams."""
    os.makedirs(out_dir, exist_ok=True)
    done = mf.committed_buckets(out_dir) if resume else {}
    mf.assert_source_matches(done, source)
    skip = frozenset(done)
    metas = [write_ntriples_fragments(ds() if callable(ds) else ds,
                                      out_dir, n_buckets, tag, skip_buckets=skip)
             for tag, ds in _stream_jobs(streams)]
    return commit_manifests(out_dir, metas, done, source)


MAP_ONLY_STREAMS = ("structloc", "mentions")


def _stream_jobs(streams: dict) -> list[tuple[str, object]]:
    """kg_bundle streams → (tag, ds-or-thunk) write jobs.

    Non-callable MAP_ONLY streams are unioned into one execution (each saved
    execution is ~2-3s fixed executor overhead). Callable streams (lazy
    checkpoint consumers) always run as their own job: resolving the thunk
    inside the job's thread is what lets the independent streams overlap the
    checkpoint barrier."""
    jobs: list[tuple[str, object]] = []
    maponly = [streams[t] for t in MAP_ONLY_STREAMS
               if t in streams and not callable(streams[t])]
    if maponly:
        merged = maponly[0].union(*maponly[1:]) if len(maponly) > 1 else maponly[0]
        jobs.append(("maponly", merged))
    for tag, ds in streams.items():
        if tag == "ckpt_root" or (tag in MAP_ONLY_STREAMS and not callable(ds)):
            continue
        jobs.append((tag, ds))
    return jobs


def write_graph_streams(streams: dict, out_dir: str, n_buckets: int = 64,
                        resume: bool = True, source: str = "",
                        overlap: bool = True) -> pd.DataFrame:
    """Materialize a dict of triple streams (kg.kg_bundle output); manifests
    commit once at the end. This is the headline write path.

    Pure MAP-ONLY streams (no sort, no actor pool downstream) are safe to
    union into a single execution — each saved execution is ~2-3s of fixed
    executor overhead, which dominates the high-CPU wall time. Streams with
    shuffles (conv windows, entity merge) each run as their own simple
    execution: mixing sorts + actor pools + union in one DAG wedges the
    streaming executor at low CPU counts (observed repeatedly at 8 CPUs).

    ``overlap=True`` (the default; measured ~25% faster end-to-end at both
    8 and 32 CPUs on sf0.1, identical output) drives the per-stream
    executions from driver THREADS:
    each execution is still its own simple DAG (no union wedge), but their
    fixed executor startup/teardown overlaps instead of serializing — the
    fixed-overhead term that caps scaling efficiency shrinks toward one
    execution's worth. Fragment writes are path-disjoint (content-addressed
    filenames carry the stream tag), and the manifest commit still happens
    once, after every stream finishes."""
    os.makedirs(out_dir, exist_ok=True)
    done = mf.committed_buckets(out_dir) if resume else {}
    mf.assert_source_matches(done, source)
    skip = frozenset(done)
    jobs = _stream_jobs(streams)

    def write_one(tag, ds):
        return write_fragments(ds() if callable(ds) else ds,
                               out_dir, n_buckets, tag, skip_buckets=skip)

    if overlap and len(jobs) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
            futs = [ex.submit(write_one, tag, ds) for tag, ds in jobs]
            metas = [f.result() for f in futs]
    else:
        metas = [write_one(tag, ds) for tag, ds in jobs]
    return commit_manifests(out_dir, metas, done, source)


def write_graph_sharded(triples_ds, out_dir: str, n_buckets: int = 64,
                        resume: bool = True, source: str = "") -> pd.DataFrame:
    """Shuffle-FREE bucket-partitioned write (the scale path).

    Each map task splits its block by subject-hash bucket and writes one
    content-addressed fragment file per (block, bucket):
    ``bucket=K/frag-<checksum16>.parquet``. Only tiny per-fragment metadata
    (bucket, rows, checksum, file) flows back to the driver, which XOR-merges
    checksums (commutative) and commits one manifest per bucket — files not
    listed in a committed manifest are stale garbage from interrupted runs
    and are deleted at commit. Readers must read manifest-listed files only.

    Compared to write_graph (sort-based groupby): zero all-to-all, linear
    scaling, write amplification 1×; the cost is ~blocks×buckets small files,
    compacted on demand by compact_bucket() (per-bucket, embarrassingly
    parallel, no shuffle).
    """
    os.makedirs(out_dir, exist_ok=True)
    done = mf.committed_buckets(out_dir) if resume else {}
    mf.assert_source_matches(done, source)
    done_set = frozenset(done)

    def write_frags(t: pa.Table) -> pa.Table:
        t = add_bucket(t, n_buckets)
        out = {"bucket": [], "rows": [], "checksum": [], "file": []}
        buckets = t["bucket"].to_numpy()
        order = np.argsort(buckets, kind="stable")
        sorted_t = t.take(pa.array(order))
        sb = sorted_t["bucket"].to_numpy()
        edges = np.concatenate([[0], np.nonzero(np.diff(sb))[0] + 1, [len(sb)]])
        for i in range(len(edges) - 1):
            lo, hi = int(edges[i]), int(edges[i + 1])
            b = int(sb[lo])
            if b in done_set:
                continue
            frag = sorted_t.slice(lo, hi - lo).select(TRIPLE_COLUMNS)
            csum = mf.content_checksum(frag, TRIPLE_COLUMNS)
            bdir = os.path.join(out_dir, f"bucket={b:05d}")
            os.makedirs(bdir, exist_ok=True)
            fname = f"frag-{csum}.parquet"
            final = os.path.join(bdir, fname)
            tmp = final + f".tmp.{os.getpid()}"
            pq.write_table(frag, tmp)
            os.rename(tmp, final)
            out["bucket"].append(b)
            out["rows"].append(hi - lo)
            out["checksum"].append(csum)
            out["file"].append(os.path.join(f"bucket={b:05d}", fname))
        return pa.table({"bucket": pa.array(out["bucket"], pa.int32()),
                         "rows": pa.array(out["rows"], pa.int64()),
                         "checksum": pa.array(out["checksum"], pa.string()),
                         "file": pa.array(out["file"], pa.string())})

    frag_meta = (triples_ds.map_batches(write_frags, batch_format="pyarrow")
                 .to_pandas())
    if "bucket" not in frag_meta.columns:  # all batches skipped → no schema
        frag_meta = pd.DataFrame(columns=["bucket", "rows", "checksum", "file"])
    rows_out = []
    for b, g in frag_meta.groupby("bucket"):
        acc = 0
        for c in g["checksum"]:
            acc ^= int(c, 16)
        files = sorted(g["file"])
        meta = {"bucket": int(b), "file": files[0], "files": files,
                "rows": int(g["rows"].sum()), "checksum": f"{acc:016x}",
                "source": source}
        # stale fragments from interrupted runs: anything not in the manifest
        bdir = os.path.join(out_dir, f"bucket={int(b):05d}")
        keep = {os.path.basename(f) for f in files}
        for name in os.listdir(bdir):
            if name.startswith("frag-") and name not in keep:
                os.remove(os.path.join(bdir, name))
        mf.write_manifest(out_dir, int(b), meta)
        rows_out.append({"bucket": int(b), "rows": meta["rows"],
                         "checksum": meta["checksum"], "skipped": False})
    for b, m in done.items():
        rows_out.append({"bucket": b, "rows": m["rows"],
                         "checksum": m["checksum"], "skipped": True})
    if not rows_out:  # nothing written, nothing previously committed
        return pd.DataFrame(columns=["bucket", "rows", "checksum", "skipped"])
    return (pd.DataFrame(rows_out).sort_values("bucket").reset_index(drop=True))


def read_graph(out_dir: str):
    """Read a committed graph back as a Dataset — manifest-listed files only
    (fragments not in a committed manifest are stale and must be ignored)."""
    import ray.data as rd

    done = mf.committed_buckets(out_dir)
    paths = []
    for meta in done.values():
        paths.extend(os.path.join(out_dir, f)
                     for f in meta.get("files", [meta["file"]]))
    return rd.read_parquet(sorted(paths))


def compact_bucket(out_dir: str, bucket: int) -> None:
    """Optional compaction: merge a committed bucket's fragments into one
    file and re-commit (content checksum unchanged — order-insensitive)."""
    done = mf.committed_buckets(out_dir)
    meta = done[bucket]
    bdir = os.path.join(out_dir, f"bucket={bucket:05d}")
    files = meta.get("files", [meta["file"]])
    table = pa.concat_tables([pq.read_table(os.path.join(out_dir, f))
                              for f in files])
    final = os.path.join(bdir, "part.parquet")
    tmp = final + f".tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.rename(tmp, final)
    new_meta = dict(meta, file=os.path.join(f"bucket={bucket:05d}", "part.parquet"),
                    files=[os.path.join(f"bucket={bucket:05d}", "part.parquet")])
    mf.write_manifest(out_dir, bucket, new_meta)
    for f in files:
        p = os.path.join(out_dir, f)
        if os.path.basename(p) != "part.parquet" and os.path.exists(p):
            os.remove(p)


def write_bucket_adjacency(out_dir: str, bucket: int) -> str:
    """Build the bucket's ADJACENCY table (north-star 'adjacency + edge
    tables'): one row per subject with its edges as a list<struct(pred, obj,
    obj_lang, obj_dt, graph)>, written as ``adjacency.parquet`` next to the
    bucket's edge fragments. Subject-hash bucketing guarantees every row of
    a subject is in this bucket, so the build is bucket-local (per-bucket,
    embarrassingly parallel across buckets — same contract as
    compact_bucket). Atomic via tmp+rename; derived data, so resume just
    rebuilds it."""
    meta = mf.committed_buckets(out_dir).get(bucket)
    if meta is None:
        raise ValueError(f"bucket {bucket} has no committed manifest")
    files = [os.path.join(out_dir, f) for f in meta.get("files", [meta["file"]])]
    t = pa.concat_tables([pq.read_table(f) for f in files]).combine_chunks()
    # Arrow offsets build (round-2 verdict #8): the former
    # groupby(subj).apply(to_dict('records')) was per-row Python — measured
    # 72.2 s vs 1.3 s (incl. the write) on a 932k-edge bucket, with
    # byte-identical adjacency.parquet on the fixture.
    t = t.sort_by([("subj", "ascending"), ("pred", "ascending"),
                   ("obj", "ascending")])  # stable, nulls last — as before
    edge_cols = ["pred", "obj", "obj_lang", "obj_dt", "graph"]
    subj = t["subj"].combine_chunks()
    s = subj.to_numpy(zero_copy_only=False)
    change = np.flatnonzero(s[1:] != s[:-1]) + 1
    offsets = np.concatenate(([0], change, [len(s)]))
    edges = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.StructArray.from_arrays(
            [pc.fill_null(t[c].combine_chunks(), "") for c in edge_cols],
            names=edge_cols))
    adj = pa.table({
        "subj": subj.take(pa.array(offsets[:-1], pa.int64())),
        "edges": edges,
    })
    bdir = os.path.join(out_dir, f"bucket={bucket:05d}")
    final = os.path.join(bdir, "adjacency.parquet")
    tmp = final + f".tmp.{os.getpid()}"
    pq.write_table(adj, tmp)
    os.rename(tmp, final)
    return final
