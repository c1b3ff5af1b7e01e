"""BVM reconciliation: per-volume goldens against migrate-bvm.py:189-356
semantics, the finalimages corner, and the co-grouped pipeline."""

import pandas as pd

from rkts_migration_ray.pipelines import bvm as bvmp
from rkts_migration_ray.stages import bvm


def pag(idx, pg, file=None, ps=""):
    return {"idx": idx, "pagination": pg, "psection": ps, "file": file}


def f(vol, n):
    return f"{vol}{n:04d}.jpg"


def ref(vol, n):
    return f"bdr:{vol}::{f(vol, n)}"


def test_leading_hidden_and_insertafter():
    vol = "IG00000"
    imgs = [f(vol, i) for i in range(1, 9)]  # 1..8
    rows = [pag(1, "1a", ref(vol, 3)), pag(2, "1b", ref(vol, 4)),
            pag(3, "2a", ref(vol, 6)), pag(4, "2b", ref(vol, 7))]
    out = bvm.build_manifest(vol, rows, imgs)
    got = [(r["filename"], r["pagination"], r["hidden"], r["tags"]) for r in out]
    assert got == [
        (f(vol, 1), None, True, "T0005"),   # leading, i<3
        (f(vol, 2), None, True, "T0005"),
        (f(vol, 3), "1a", False, ""),
        (f(vol, 4), "1b", False, ""),
        (f(vol, 5), None, True, ""),        # insertafter img4
        (f(vol, 6), "2a", False, ""),
        (f(vol, 7), "2b", False, ""),
        (f(vol, 8), None, True, ""),        # trailing unused → hidden insert
    ]
    assert [r["seq"] for r in out] == list(range(8))


def test_leading_beyond_three_not_hidden():
    vol = "IG00000"
    imgs = [f(vol, i) for i in range(1, 7)]
    rows = [pag(1, "1a", ref(vol, 6))]
    out = bvm.build_manifest(vol, rows, imgs)
    # i = 0,1,2 hidden+T0005; i = 3,4 plain (migrate-bvm.py:295-301)
    assert [(r["hidden"], r["tags"]) for r in out[:5]] == [
        (True, "T0005")] * 3 + [(False, "")] * 2


def test_missing_detail_tags_and_sections():
    vol = "IG00000"
    imgs = [f(vol, i) for i in range(1, 4)]
    rows = [pag(1, "1a", ref(vol, 1), ps="ps1"),
            pag(2, "1b", "missing", ps="ps1"),
            pag(3, "2a(d2)", ref(vol, 2), ps="ps2"),
            pag(4, "2b", None, ps="ps2")]
    out = bvm.build_manifest(vol, rows, imgs)
    assert out[0]["psection"] == "ps1"            # multi-section → attached
    assert out[1]["tags"] == "T0020" and out[1]["filename"] is None
    assert out[2]["tags"] == "T0016"
    # img 3 is unused → hidden insert anchored after the row using img 2
    assert out[3]["filename"] == f(vol, 3) and out[3]["hidden"]
    assert out[4]["filename"] is None and out[4]["pagination"] == "2b"
    # single-section volume: psection never attached (migrate-bvm.py:330-331)
    rows1 = [pag(1, "1a", ref(vol, 1), ps="ps1")]
    assert bvm.build_manifest(vol, rows1, imgs)[0]["psection"] is None


def test_finalimages_corner_duplicate_last_filename():
    """The :308-311 branch fires only when the LAST image-list entry is a
    seen filename owning insertions — i.e. duplicate filenames. Faithful
    branch-for-branch behavior: the pending insertions are emitted LAST,
    unhidden, instead of as hidden inserts."""
    vol = "IG00000"
    imgs = [f(vol, 1), f(vol, 2), f(vol, 1)]  # duplicate last
    rows = [pag(1, "1a", ref(vol, 1))]
    out = bvm.build_manifest(vol, rows, imgs)
    got = [(r["filename"], r["hidden"]) for r in out]
    assert got == [(f(vol, 1), False), (f(vol, 2), False)]


def test_validate_rules():
    vol = "IG00000"
    imgs = [f(vol, i) for i in range(1, 6)]
    rows = [pag(1, "1a", ref(vol, 1)),
            pag(2, "??", ref(vol, 2)),            # invalid
            pag(3, "1a", ref(vol, 1), ps=""),     # dup + order + used twice
            pag(4, "5b", f"bdr:IGX::{f(vol,3)}"),  # wrong group
            pag(5, "6a", ref(vol, 99)),           # not in list
            pag(6, "2a", ref(vol, 4))]            # order violation (6a>2a)
    q = bvm.validate_volume(vol, rows, imgs)
    rules = sorted((r["idx"], r["rule"]) for r in q)
    assert (2, "invalid_pg") in rules
    assert (3, "pg_duplicate") in rules
    assert (3, "file_used_twice") in rules
    # idx3 order check: lastpg '??' unparsable → comparepg 0 → flagged
    assert (3, "pg_order") in rules
    assert (4, "wrong_imggroup") in rules
    assert (5, "file_not_in_list") in rules
    assert (6, "pg_order") in rules


def test_bad_file_ref_fallthrough():
    """A '::'-less ref gets bad_file_ref AND still runs the elif chain on
    the reference's dblcolidx=-1 slices (migrate-bvm.py:268-277), landing on
    wrong_imggroup; the manifest row keeps pagination but no filename
    (:337-345)."""
    vol = "IG00000"
    imgs = [f(vol, 1), f(vol, 2)]
    bad = f"bdr:{vol}:{f(vol, 2)}"  # single-colon typo
    rows = [pag(1, "1a", ref(vol, 1)), pag(2, "1b", bad)]
    q = bvm.validate_volume(vol, rows, imgs)
    rules = sorted((r["idx"], r["rule"]) for r in q)
    assert (2, "bad_file_ref") in rules
    assert (2, "wrong_imggroup") in rules  # igname = bad[4:-1] != vol
    out = bvm.build_manifest(vol, rows, imgs)
    row2 = [r for r in out if r["pagination"] == "1b"]
    assert len(row2) == 1 and row2[0]["filename"] is None
    assert row2[0]["imggroup"] is None


def test_simple_mode():
    vol = "IGS00000"
    imgs = [f(vol, 1), f(vol, 2)]
    rows = [pag(1, "1", ref(vol, 1)), pag(2, "x?", ref(vol, 2)),
            pag(3, "1", None)]
    q = bvm.validate_volume(vol, rows, imgs)
    rules = sorted((r["idx"], r["rule"]) for r in q)
    assert rules == [(2, "invalid_pg"), (3, "pg_duplicate")]  # no order rule


def test_pipeline_counts(sf_tag):
    m = bvmp.bvm_manifests_ds(sf_tag).to_pandas()
    q = bvmp.bvm_quarantine_ds(sf_tag).to_pandas()
    assert len(m) > 0
    # every volume's seq is dense 0..n-1
    g = m.groupby("vol_id")["seq"]
    assert (g.max() + 1 == g.count()).all() and (g.min() == 0).all()
    assert set(q["rule"]) <= {"invalid_pg", "pg_order", "pg_duplicate",
                              "bad_file_ref", "wrong_imggroup",
                              "file_not_in_list", "file_used_twice"}
