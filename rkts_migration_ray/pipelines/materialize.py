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


# ---------------------------------------------------------------------------
# incremental updates: LSM-style generations + graph tombstones
#
# The reference has no incremental story (rerun everything); at 100 TB a
# re-migrated slice of conversations must NOT force a full-graph rewrite.
# Model (classic LSM): the base graph is generation 0 (the per-bucket
# manifests); each update appends content-addressed delta fragments at
# generation N plus ONE atomically-renamed commit file
# (_gen/gen-N.json) that simultaneously publishes the fragments and
# tombstones the superseded graphs. Readers reconcile: a row from a
# generation-g file is dead iff some tombstone on its graph has
# generation > g. Compaction folds generations back into the bucket
# manifests, one bucket at a time (each bucket independently crash-safe
# via a compacted_gen watermark in its manifest).
# ---------------------------------------------------------------------------

GEN_DIRNAME = "_gen"


def _gen_path(out_dir: str, gen: int) -> str:
    return os.path.join(out_dir, GEN_DIRNAME, f"gen-{gen:04d}.json")


def generation_files(out_dir: str) -> list[dict]:
    """Committed generation files, ascending. A generation is committed iff
    its json exists (the rename IS the commit point) and every fragment it
    lists still exists — except fragments already folded into their
    bucket's manifest (compacted_gen >= gen), which compaction may have
    removed."""
    import json

    gdir = os.path.join(out_dir, GEN_DIRNAME)
    if not os.path.isdir(gdir):
        return []
    done = mf.committed_buckets(out_dir)
    out = []
    for name in sorted(os.listdir(gdir)):
        if not (name.startswith("gen-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(gdir, name)) as f:
                meta = json.load(f)
        except json.JSONDecodeError:
            continue
        ok = True
        for fr in meta["fragments"]:
            cg = int(done.get(int(fr["bucket"]), {}).get("compacted_gen", 0))
            if cg >= int(meta["gen"]):
                continue  # folded into the bucket manifest already
            if not os.path.exists(os.path.join(out_dir, fr["file"])):
                ok = False
                break
        if ok:
            out.append(meta)
    return out


def graph_tombstones(out_dir: str, gens: list[dict] | None = None) -> dict:
    """graph uri -> highest generation that superseded it."""
    tomb: dict[str, int] = {}
    for g in (generation_files(out_dir) if gens is None else gens):
        for gr in g.get("superseded", []):
            tomb[gr] = max(tomb.get(gr, 0), int(g["gen"]))
    return tomb


def update_graph(out_dir: str, delta_triples_ds, superseded_graphs,
                 n_buckets: int = 64, source: str = "") -> dict:
    """Apply a delta (re-extracted / new conversations) to a committed
    graph WITHOUT rewriting it: ingest cost is proportional to the DELTA,
    not the corpus.

    Contract: ``delta_triples_ds`` holds every triple derived from the
    conversations being replaced or added; ``superseded_graphs`` lists the
    graph uris whose OLD triples must disappear (a graph present in both
    the base and the delta MUST be listed, or reads double-count it).
    Streams derived per-conversation (structural, mentions, conv windows)
    re-extract exactly; globally-derived streams (the entity merge) must
    be re-derived by the caller if the delta changes them.

    Mechanics: content-addressed fragment writes (map-only, same
    write_fragments path as the base graph — rerunning a crashed update
    rewrites the identical files), then ONE tmp+rename of
    _gen/gen-N.json as the single commit point publishing fragments +
    tombstones together. Before the rename, readers see the old graph
    exactly; after it, the new one — no window of loss or duplication.
    Refuses on a bucket-hash fingerprint mismatch (same silent-row-drop
    hazard as resume, state/manifest.py:82)."""
    import json

    done = mf.committed_buckets(out_dir)
    if not done:
        raise ValueError(f"update_graph: no committed base graph in {out_dir}")
    mf.assert_source_matches(done, "")  # hash-fp check only
    if max(done) >= n_buckets:
        raise ValueError(
            f"update_graph: base has bucket {max(done)} >= n_buckets="
            f"{n_buckets}; delta must use the base's bucket count")
    # next generation = 1 + the high-water mark across BOTH live gen files
    # and the buckets' compacted_gen watermarks: compaction retires gen
    # files, and reusing a retired number would make the new fragments
    # read as already-folded (invisible)
    gens = generation_files(out_dir)
    hwm = max([int(g["gen"]) for g in gens]
              + [int(m.get("compacted_gen", 0)) for m in done.values()]
              + [0])
    gen = hwm + 1

    frag_meta = write_fragments(delta_triples_ds, out_dir, n_buckets,
                                f"g{gen:04d}")
    frags = ([] if "bucket" not in frag_meta.columns else [
        {"bucket": int(r.bucket), "file": r.file, "rows": int(r.rows),
         "checksum": r.checksum}
        for r in frag_meta.itertuples()])
    from ..functions.arrowutils import hash_fingerprint

    meta = {"gen": gen, "fragments": sorted(frags, key=lambda d: d["file"]),
            "superseded": sorted(set(superseded_graphs)),
            "n_buckets": n_buckets, "source": source,
            "hash_fp": hash_fingerprint()}
    os.makedirs(os.path.join(out_dir, GEN_DIRNAME), exist_ok=True)
    p = _gen_path(out_dir, gen)
    tmp = p + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.rename(tmp, p)  # commit point
    return meta


def _live_paths_by_gen(out_dir: str) -> dict[int, list[str]]:
    """generation -> file paths whose rows are governed by that generation
    (base/compacted bucket files govern at the bucket's compacted_gen)."""
    done = mf.committed_buckets(out_dir)
    gens = generation_files(out_dir)
    by_gen: dict[int, list[str]] = {}
    for b, meta in done.items():
        cg = int(meta.get("compacted_gen", 0))
        by_gen.setdefault(cg, []).extend(
            os.path.join(out_dir, f)
            for f in meta.get("files", [meta["file"]]))
    for g in gens:
        for fr in g["fragments"]:
            cg = int(done.get(int(fr["bucket"]), {}).get("compacted_gen", 0))
            if int(g["gen"]) > cg:  # not yet folded into the bucket file
                by_gen.setdefault(int(g["gen"]), []).append(
                    os.path.join(out_dir, fr["file"]))
    return {g: sorted(ps) for g, ps in by_gen.items() if ps}


def read_graph(out_dir: str, reconcile: bool = True):
    """Read a committed graph back as a Dataset — manifest- and
    generation-listed files only (anything else is stale garbage from an
    interrupted run). With updates present, rows are reconciled against the
    graph tombstones: a row from a generation-g file is dropped iff a
    tombstone on its graph has generation > g. One broadcastable dict of
    tombstoned graphs per generation tier — no shuffle, no driver data."""
    import ray.data as rd

    by_gen = _live_paths_by_gen(out_dir)
    if not by_gen:
        return rd.from_arrow(pa.table(
            {c: pa.array([], pa.string()) for c in TRIPLE_COLUMNS}))
    tomb = graph_tombstones(out_dir) if reconcile else {}
    parts = []
    for g, paths in sorted(by_gen.items()):
        # columns= also drops the hive-inferred 'bucket' partition column
        # (the physical files hold exactly TRIPLE_COLUMNS)
        ds = rd.read_parquet(paths, columns=TRIPLE_COLUMNS)
        dead = pa.array([k for k, v in tomb.items() if v > g], pa.string())
        if len(dead):
            ds = ds.map_batches(
                lambda t, dead=dead: t.filter(
                    pc.invert(pc.is_in(t["graph"], value_set=dead))),
                batch_format="pyarrow")
        parts.append(ds)
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])


def compact_graph(out_dir: str) -> pd.DataFrame:
    """Fold every generation into the per-bucket manifests: physically drop
    tombstoned rows, merge delta fragments into one file per bucket, then
    retire the generation files. Per-bucket and embarrassingly parallel
    (Ray tasks; no data touches the driver), and each bucket is
    INDEPENDENTLY crash-safe: its manifest's compacted_gen watermark makes
    readers ignore the generations it already folded, so a compaction
    interrupted halfway leaves every bucket readable and exact. The
    generation files (and the fragments they list) are deleted only once
    EVERY bucket's watermark has passed them."""
    import json

    import ray

    gens = generation_files(out_dir)
    if not gens:
        return pd.DataFrame(columns=["bucket", "rows", "checksum"])
    target_gen = max(int(g["gen"]) for g in gens)
    tomb = graph_tombstones(out_dir, gens)
    done = mf.committed_buckets(out_dir)
    frag_by_bucket: dict[int, list[tuple[int, str]]] = {}
    for g in gens:
        for fr in g["fragments"]:
            frag_by_bucket.setdefault(int(fr["bucket"]), []).append(
                (int(g["gen"]), fr["file"]))
    # new conversations can land in buckets the base never wrote
    all_buckets = sorted(set(done) | set(frag_by_bucket))

    @ray.remote(num_cpus=1)
    def compact_one(b: int) -> dict:
        meta = done.get(b)
        cg = int(meta.get("compacted_gen", 0)) if meta else 0
        if cg >= target_gen:
            return {"bucket": b, "rows": int(meta["rows"]),
                    "checksum": meta["checksum"], "skipped": True}
        tiers: list[tuple[int, list[str]]] = []
        if meta:
            tiers.append((cg, [os.path.join(out_dir, f)
                               for f in meta.get("files", [meta["file"]])]))
        for gnum, f in frag_by_bucket.get(b, []):
            if gnum > cg:
                tiers.append((gnum, [os.path.join(out_dir, f)]))
        tables = []
        for gnum, paths in tiers:
            dead = pa.array([k for k, v in tomb.items() if v > gnum],
                            pa.string())
            for p in paths:
                t = pq.read_table(p)
                if len(dead):
                    t = t.filter(pc.invert(
                        pc.is_in(t["graph"], value_set=dead)))
                tables.append(t)
        merged = pa.concat_tables(tables) if tables else pa.table(
            {c: pa.array([], pa.string()) for c in TRIPLE_COLUMNS})
        bdir = os.path.join(out_dir, f"bucket={b:05d}")
        os.makedirs(bdir, exist_ok=True)
        fname = f"part-c{target_gen:04d}.parquet"
        final = os.path.join(bdir, fname)
        tmp = final + f".tmp.{os.getpid()}"
        pq.write_table(merged, tmp)
        os.rename(tmp, final)
        new_meta = dict(meta or {"bucket": b, "source": ""},
                        file=os.path.join(f"bucket={b:05d}", fname),
                        files=[os.path.join(f"bucket={b:05d}", fname)],
                        rows=int(merged.num_rows),
                        checksum=mf.content_checksum(merged, TRIPLE_COLUMNS),
                        compacted_gen=target_gen)
        new_meta.pop("sizes", None)
        mf.write_manifest(out_dir, b, new_meta)
        # the bucket's superseded data files are unreferenced now
        for name in os.listdir(bdir):
            if name != fname and not name.startswith("adjacency") \
                    and (name.startswith("frag-") or name.startswith("part")):
                os.remove(os.path.join(bdir, name))
        return {"bucket": b, "rows": new_meta["rows"],
                "checksum": new_meta["checksum"], "skipped": False}

    rows = ray.get([compact_one.remote(b) for b in all_buckets])
    # every bucket passed target_gen -> the generation layer is retired
    now_done = mf.committed_buckets(out_dir)
    if all(int(now_done[b].get("compacted_gen", 0)) >= target_gen
           for b in all_buckets):
        for g in gens:
            p = _gen_path(out_dir, int(g["gen"]))
            if os.path.exists(p):
                os.remove(p)
    return (pd.DataFrame(rows).sort_values("bucket")
            .reset_index(drop=True))
