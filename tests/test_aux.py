"""Aux sources + pagination arithmetic (S2/S6/S7/S11, M13/M18, ST3)."""

import gzip
import json

import pytest

from rkts_migration_ray.functions import pagination as pg
from rkts_migration_ray.sources import aux_readers


def test_folio_arithmetic():
    # folio 1a is image 1 (one_a=1); 1b is 2; 2a is 3 …
    assert pg.folio_side_to_pagenum(1, "a") == 1
    assert pg.folio_side_to_pagenum(1, "b") == 2
    assert pg.folio_side_to_pagenum(2, "a") == 3
    # first-folio override: volume film starts at folio 3
    assert pg.folio_side_to_pagenum(3, "a", first_folio=3) == 1
    with pytest.raises(ValueError):
        pg.folio_side_to_pagenum(2, "a", first_folio=3)


def test_pagination_compare():
    # comparepg semantics, migrate-bvm.py:14,58-76
    assert pg.compare_pagination("107a", "107b") < 0
    assert pg.compare_pagination("107b", "108a") < 0
    assert pg.compare_pagination("107a", "107'a") < 0    # apostrophe dup-mark
    assert pg.compare_pagination("107'a", "107''a") < 0  # more marks sort later
    assert pg.compare_pagination("9b", "10a") < 0        # numeric, not lexical
    assert pg.compare_pagination("garbage", "10a") == 0
    assert pg.compare_pagination("xa", "10a") == 0       # wildcard folio
    assert pg.compare_pagination("10a", "xb") == 0
    assert pg.compare_pagination("107a?", "107a") == 0   # '?' ignored
    assert pg.compare_pagination("107a(d2)", "107a") == 0  # '(dN)' ignored
    assert pg.parse_pagination_token("12x") is None      # side is mandatory


def test_pagination_cache_lru1():
    loads = []
    cache = pg.PaginationCache(lambda name: loads.append(name) or name.upper())
    assert cache.get("v1") == "V1"
    assert cache.get("v1") == "V1"
    assert cache.get("v2") == "V2"
    assert cache.get("v1") == "V1"
    assert loads == ["v1", "v2", "v1"] and cache.misses == 3


def test_read_json_gz(tmp_path):
    p = tmp_path / "x.json.gz"
    with gzip.open(p, "wt") as f:
        json.dump({"2": "b", "10": "c", "1": "a"}, f)
    d = aux_readers.read_json_gz(str(p))
    assert aux_readers.sorted_json_keys(d) == ["1", "2", "10"]


def test_glob_denylist(tmp_path):
    for name in ("a.json", "b.json", "skipme.json"):
        (tmp_path / name).write_text("{}")
    got = aux_readers.glob_with_denylist(str(tmp_path / "*.json"), ["skip"])
    assert [g.split("/")[-1] for g in got] == ["a.json", "b.json"]


def test_yaml_config(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"target": "rkts", "n_subj_buckets": 32, "junk": 1}))
    cfg = aux_readers.load_yaml_config(str(p))
    assert cfg.target == "rkts" and cfg.n_subj_buckets == 32


def test_cli_query_subcommand(sf_tag, tmp_path):
    """`python -m rkts_migration_ray query` runs a registry query in-process
    (the CLI owns its own Ray session, so here we drive main() directly
    against the already-running test session via the registry path)."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "rkts_migration_ray", "query", "--name",
         "text_vocab", "--sf", sf_tag, "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-500:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["query"] == "text_vocab" and res["rows"] > 0


def test_image_list_store_fetch_seam(tmp_path):
    """Remote-fetch seam (round-3 verdict fix #6; migrate-bvm.py:369-387):
    a cache miss calls the INJECTED fetcher with the md5-bucketed remote
    key, persists the gz side file atomically, and later gets hit the
    local cache; no fetcher => loud failure, never an invented list."""
    import gzip
    import json

    # key grammar, both suffix branches (migrate-bvm.py:371-375)
    k = pg.image_list_key("W22084", "I0886")
    assert k == "Works/60/W22084/images/W22084-0886/dimensions.json"
    assert pg.image_list_key("W22084", "X123").endswith("W22084-X123/dimensions.json")

    # malformed volume row: explicit error naming the list, not IndexError
    import pytest as _pt
    with _pt.raises(ValueError, match="W22084"):
        pg.image_list_key("W22084", "")

    calls = []

    def fake_fetch(key: str) -> bytes:
        calls.append(key)
        return gzip.compress(json.dumps(
            [{"filename": f"{key.split('/')[2]}-0001.jpg"}]).encode())

    store = pg.ImageListStore(str(tmp_path / "il"), fetch=fake_fetch)
    got = store.get("W22084", "I0886")
    assert got[0]["filename"] == "W22084-0001.jpg"
    assert calls == ["Works/60/W22084/images/W22084-0886/dimensions.json"]

    # LRU-1 memo: same volume again → no fetch, no re-read
    store.get("W22084", "I0886")
    assert store.fetch_calls == 1

    # a FRESH store over the same cache dir hits the side file, not the net
    store2 = pg.ImageListStore(str(tmp_path / "il"), fetch=None)
    assert store2.get("W22084", "I0886") == got

    # default local-cache-only store fails loudly on a missing volume
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError, match="no fetcher"):
        store2.get("W99999", "I9999")


def test_cli_query_csv_export(sf_tag, tmp_path):
    """`query --csv` is the standalone CSV-export path (extractList.php /
    exportlocations.php analog): writes a readable CSV with the query's
    rows."""
    import json
    import subprocess
    import sys

    import pandas as pd

    out_dir = str(tmp_path / "pivot_csv")
    out = subprocess.run(
        [sys.executable, "-m", "rkts_migration_ray", "query", "--name",
         "kg_role_pivot", "--sf", sf_tag, "--num-cpus", "2",
         "--out", out_dir, "--csv"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-500:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    import glob as _glob
    files = _glob.glob(out_dir + "/*.csv") or _glob.glob(out_dir + "/*")
    got = pd.concat([pd.read_csv(f) for f in files], ignore_index=True)
    assert len(got) == res["rows"] > 0


def test_cli_ingest_subcommand(sf_tag, tmp_path):
    """The generational ingest services from the CLI surface: dedup ingest
    (band index) then embed ingest (IVF), each initializing its own index,
    probing a batch and folding it in; --compact folds generations to 1.
    SUBPROCESS like the other CLI tests — main() owns a Ray session and
    calls ray.shutdown() on exit, so driving it in-process would kill the
    pytest session cluster and every later test would auto-init a 32-CPU
    one (this exact mistake exposed the fan-out-64 latency sentinel bug)."""
    import json
    import subprocess
    import sys

    import pandas as pd

    bidx = str(tmp_path / "bandidx")
    out = str(tmp_path / "matches.parquet")
    r1 = subprocess.run(
        [sys.executable, "-m", "rkts_migration_ray", "ingest", "--kind",
         "dedup", "--sf", sf_tag, "--index", bidx, "--gen", "batch1",
         "--out", out, "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r1.returncode == 0, r1.stderr[-500:]
    rep = json.loads(r1.stdout.strip().splitlines()[-1])
    assert rep["generations"] == 2 and rep["matches"] > 0
    got = pd.read_parquet(out)
    assert list(got.columns) == ["delta_id", "base_id", "jaccard"]
    assert len(got) == rep["matches"]

    vidx = str(tmp_path / "ivfidx")
    r2 = subprocess.run(
        [sys.executable, "-m", "rkts_migration_ray", "ingest", "--kind",
         "embed", "--sf", sf_tag, "--index", vidx, "--gen", "batch1",
         "--compact", "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-500:]
    rep = json.loads(r2.stdout.strip().splitlines()[-1])
    assert rep["matches"] > 0 and rep["generations"] == 1  # compacted
