"""Folio→image-number resolution: get_json_full index goldens, the
psection/1a→1b/last-image fallback chain, arithmetic overrides, and the
actor's LRU-1 cache hit rate."""

import pyarrow as pa

from rkts_migration_ray.functions.pagination import (
    build_volume_index,
    resolve_image_number,
)
from rkts_migration_ray.stages.imgnum import ImageNumberResolver, vol_key_of


def _rows(*triples):
    return [{"psection": ps, "pagination": pg, "file": f}
            for ps, pg, f in triples]


def test_build_index_missing_attachment():
    # missing attaches to NEXT non-missing image; trailing missing → last
    imgs = ["f1.jpg", "f2.jpg", "f3.jpg"]
    rows = _rows(("", "1a", "bdr:V::f1.jpg"),
                 ("", "1b", "missing"),
                 ("", "2a", "bdr:V::f2.jpg"),
                 ("", "2b", "missing"))
    ix = build_volume_index(rows, imgs)
    assert ix["sections"][""] == {"1a": 1, "1b": 2, "2a": 2, "2b": 2}
    assert ix["zzlastimgnum"] == 3
    assert ix["first_ps"] == ""


def test_build_index_last_wins_and_null_file():
    imgs = ["f1.jpg", "f2.jpg"]
    rows = _rows(("", "1a", "bdr:V::f1.jpg"),
                 ("", "1a", "bdr:V::f2.jpg"),   # duplicate pg: last wins
                 ("", "1b", None),              # no usable file → None
                 ("", "2a", "bdr:V::nope.jpg"))  # not in list → None
    ix = build_volume_index(rows, imgs)
    assert ix["sections"][""] == {"1a": 2, "1b": None, "2a": None}


def test_resolve_fallback_chain():
    ix = build_volume_index(
        _rows(("ps1", "1b", "bdr:V::f1.jpg"), ("ps1", "2a", "bdr:V::f2.jpg")),
        ["f1.jpg", "f2.jpg", "f3.jpg"])
    # psection 'default' absent → first_ps; exact hit
    assert resolve_image_number(2, "a", 7, ix) == 2
    # 1a missing → 1b fallback (utils.php:379-383)
    assert resolve_image_number(1, "a", 7, ix) == 1
    # miss entirely → zzlastimgnum (utils.php:384-387)
    assert resolve_image_number(250, "b", 7, ix) == 3
    # side-less → folio unchanged (utils.php:353-358)
    assert resolve_image_number(42, None, 7, ix) == 42


def test_resolve_arithmetic_with_overrides():
    # utils.php:389-403: 2*(folio-1) + onea + side
    assert resolve_image_number(1, "a", 5, None) == 1
    assert resolve_image_number(1, "b", 5, None) == 2
    assert resolve_image_number(3, "a", 5, None) == 5
    assert resolve_image_number(3, "a", 13, None, overrides={13: 3}) == 7


def test_actor_cache_hit_rate(sf_tag, tmp_path):
    from rkts_migration_ray import fixtures

    fixtures.ensure_fixture(sf_tag)
    r = ImageNumberResolver(fixtures.aux_path(sf_tag, "pagination"),
                            fixtures.aux_path(sf_tag, "image_list"))
    vols = sorted(r.vols)[:3]
    n_each = 40
    batch = pa.table({
        "conv_id": pa.array(["c"] * (len(vols) * n_each)),
        "turn_idx": pa.array([0] * (len(vols) * n_each), pa.int32()),
        # interleaved volume order: the in-batch sort must restore clustering
        "bvolnum": pa.array([int(v[2:]) for _ in range(n_each) for v in vols],
                            pa.int64()),
        "folio": pa.array(list(range(1, n_each + 1)) * len(vols), pa.int64()),
        "side": pa.array(["a"] * (len(vols) * n_each)),
    })
    out = r(batch)
    assert out.num_rows == len(vols) * n_each
    # one loader miss per distinct volume, not per row (ST3 semantics)
    assert r.cache.misses == len(vols)
