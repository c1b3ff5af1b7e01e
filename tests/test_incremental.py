"""Incremental graph updates: LSM generations + graph tombstones.

The reference has no incremental story (rerun everything, utils.php:844-850
rewrites every TTL); at 100 TB a re-migrated slice must not force a
full-graph rewrite. Covers: base write -> update -> reconciled read ->
crash-window invisibility -> compaction -> post-compaction update (the
generation counter must respect the compacted_gen watermark)."""

import os

import pandas as pd
import pyarrow as pa
import pytest

from rkts_migration_ray.config import TRIPLE_COLUMNS
from rkts_migration_ray.pipelines import materialize
from rkts_migration_ray.state import manifest as mf


def _triples(rows):
    """rows: list of (subj, pred, obj, graph) -> triple Dataset."""
    import ray.data as rd

    n = len(rows)
    return rd.from_arrow(pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
        "obj_lang": pa.array([""] * n, pa.string()),
        "obj_dt": pa.array([""] * n, pa.string()),
        "graph": pa.array([r[3] for r in rows], pa.string()),
    }))


def _rows(graph, version, n=20):
    return [(f"s:{graph}{i}", "p:v", f"o:{version}{i}", f"g:{graph}")
            for i in range(n)]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(TRIPLE_COLUMNS)
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def _read(out_dir) -> pd.DataFrame:
    return _norm(materialize.read_graph(out_dir).to_pandas())


@pytest.fixture()
def base_graph(tmp_path):
    out = str(tmp_path / "g")
    base = _rows("A", "v1") + _rows("B", "v1") + _rows("C", "v1")
    materialize.write_graph_sharded(_triples(base), out, n_buckets=8,
                                    resume=False)
    return out, base


def test_update_and_reconciled_read(base_graph):
    out, base = base_graph
    # replace graph B (fewer rows, new values) and add graph D
    delta = _rows("B", "v2", n=15) + _rows("D", "v1")
    meta = materialize.update_graph(out, _triples(delta),
                                    superseded_graphs=["g:B"], n_buckets=8)
    assert meta["gen"] == 1 and meta["superseded"] == ["g:B"]
    want = [r for r in base if r[3] != "g:B"] + delta
    pd.testing.assert_frame_equal(_read(out), _norm(
        _triples(want).to_pandas()))
    # unreconciled read still sees every live file's rows (base B included)
    raw = materialize.read_graph(out, reconcile=False).to_pandas()
    assert len(raw) == len(base) + len(delta)


def test_crashed_update_is_invisible_and_rerun_idempotent(base_graph):
    out, base = base_graph
    delta = _rows("B", "v2")
    # crash AFTER fragments, BEFORE the gen-file rename (the commit point):
    # simulate by writing fragments under the gen-1 tag with no gen json
    materialize.write_fragments(_triples(delta), out, 8, "g0001")
    assert _read(out).equals(_norm(_triples(base).to_pandas()))
    assert materialize.generation_files(out) == []
    # rerunning the update rewrites the identical content-addressed files
    def frags():
        return {f for b in os.listdir(out)
                if os.path.isdir(os.path.join(out, b))
                for f in os.listdir(os.path.join(out, b))
                if f.startswith("frag-g0001")}

    frag_names = frags()
    materialize.update_graph(out, _triples(delta), ["g:B"], n_buckets=8)
    frag_names2 = frags()
    assert frag_names2 == frag_names  # no orphans, no duplicates
    want = [r for r in base if r[3] != "g:B"] + delta
    pd.testing.assert_frame_equal(_read(out), _norm(_triples(want).to_pandas()))


def test_compact_graph_folds_generations(base_graph):
    out, base = base_graph
    delta = _rows("B", "v2", n=15) + _rows("D", "v1")
    materialize.update_graph(out, _triples(delta), ["g:B"], n_buckets=8)
    want = _read(out)  # reconciled view before compaction
    summary = materialize.compact_graph(out)
    assert not summary.empty and not summary["skipped"].any()
    # generation layer fully retired; watermark advanced on every bucket
    assert materialize.generation_files(out) == []
    assert not os.listdir(os.path.join(out, materialize.GEN_DIRNAME))
    done = mf.committed_buckets(out)
    assert all(int(m["compacted_gen"]) == 1 for m in done.values())
    assert all(len(m["files"]) == 1 for m in done.values())
    # physical rows == reconciled rows (tombstoned rows dropped on disk)
    assert int(summary["rows"].sum()) == len(want)
    pd.testing.assert_frame_equal(_read(out), want)


def test_update_after_compaction_respects_watermark(base_graph):
    """A generation number must never be reused after compaction retires the
    gen files: compacted_gen watermarks would make reused-gen fragments read
    as already-folded (silently invisible rows)."""
    out, base = base_graph
    materialize.update_graph(out, _triples(_rows("D", "v1")), [], n_buckets=8)
    materialize.compact_graph(out)
    # second update: supersede D with D', pure-delete C
    delta2 = _rows("D", "v2", n=10)
    meta2 = materialize.update_graph(out, _triples(delta2),
                                     ["g:D", "g:C"], n_buckets=8)
    assert meta2["gen"] == 2  # NOT 1 — hwm includes compacted_gen
    want = [r for r in base if r[3] not in ("g:B", "g:C", "g:D")] \
        + _rows("B", "v1") + delta2
    pd.testing.assert_frame_equal(_read(out), _norm(_triples(want).to_pandas()))
    # second compaction folds gen 2; read unchanged
    pre = _read(out)
    materialize.compact_graph(out)
    done = mf.committed_buckets(out)
    assert all(int(m["compacted_gen"]) == 2 for m in done.values())
    pd.testing.assert_frame_equal(_read(out), pre)


def test_kg_incremental_equals_from_scratch(sf_tag):
    """End-to-end: base write + slice re-migration (tombstones + delta)
    reconciles to exactly the from-scratch graph."""
    from rkts_migration_ray.pipelines import kg

    inc = _norm(kg.kg_incremental_ds(sf_tag).to_pandas())
    full = _norm(kg.kg_triples_ds(sf_tag).to_pandas())
    pd.testing.assert_frame_equal(inc, full)


def test_update_refuses_bad_base(tmp_path, base_graph):
    with pytest.raises(ValueError, match="no committed base graph"):
        materialize.update_graph(str(tmp_path / "empty"),
                                 _triples(_rows("A", "v1")), [], n_buckets=8)
    out, _ = base_graph
    with pytest.raises(ValueError, match="n_buckets"):
        materialize.update_graph(out, _triples(_rows("A", "v1")), [],
                                 n_buckets=4)
