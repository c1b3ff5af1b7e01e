"""Location grammar goldens seeded from the reference's inline doc-tests
(utils.php:748-752) and the chemdo simple dialect (utils.php:570,629-633)."""

import pyarrow as pa

from rkts_migration_ray.functions import locations


def parse_one_full(s: str) -> dict:
    out = locations.parse_loc_full(pa.array([s]))
    return {k: v[0].as_py() for k, v in out.items()}


def test_doc_test_dul_ba():
    # get_text_loc("'dul ba, ka 1b1-nga 302a5 (vol. 1-4)") — utils.php:750
    m = parse_one_full("'dul ba, ka 1b1-nga 302a5 (vol. 1-4)")
    assert m["valid"]
    assert m["section"] == "'dul ba"
    assert m["bvolname"] == "ka" and m["evolname"] == "nga"
    assert m["bpagenum"] == 1 and m["bpageside"] == "b" and m["blinenum"] == 1
    assert m["epagenum"] == 302 and m["epageside"] == "a" and m["elinenum"] == 5
    assert m["bvolnum"] == 1 and m["evolnum"] == 4
    assert m["badvol"] is None


def test_doc_test_single_point():
    # get_text_loc("rgyud, ja 39b7 (vol. 83)") — utils.php:752
    m = parse_one_full("rgyud, ja 39b7 (vol. 83)")
    assert m["valid"] and m["section"] == "rgyud" and m["bvolname"] == "ja"
    assert m["bpagenum"] == 39 and m["bpageside"] == "b" and m["blinenum"] == 7
    assert m["bvolnum"] == 83 and m["evolnum"] is None and m["epagenum"] is None


def test_doc_test_wam():
    # get_text_loc("gzugs, wam 245a4-247a7 (vol. 102)") — utils.php:751.
    # 'wam' is NOT in allowed_vol_letters (only 'waM' is, utils.php:562), so
    # the reference's own doc-test line reports invalid_volname — mirrored
    # here as the badvol flag.
    m = parse_one_full("gzugs, wam 245a4-247a7 (vol. 102)")
    assert m["valid"] and m["bvolname"] == "wam"
    assert m["badvol"] == "wam"
    assert m["epagenum"] == 247 and m["evolname"] is None
    m2 = parse_one_full("gzugs, waM 245a4-247a7 (vol. 102)")
    assert m2["valid"] and m2["badvol"] is None


def test_allowed_vol_letters_matches_reference():
    """Diff ALLOWED_VOL_LETTERS against the verbatim reference list
    (utils.php:562) when the reference tree is present."""
    import os
    import re

    path = "/root/reference/utils.php"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference tree not available")
    with open(path) as f:
        php = f.read()
    m = re.search(r"\$allowed_vol_letters = \[(.*?)\];", php, re.S)
    ref = set(re.findall(r'"([^"]*)"', m.group(1)))
    assert locations.ALLOWED_VOL_LETTERS == ref


def test_invalid_volname_flag():
    m = parse_one_full("mdo, qx 12a3 (vol. 2)")
    assert m["valid"] and m["badvol"] == "qx"  # → invalid_volname quarantine


def test_unparsable():
    m = parse_one_full("%%bad%%")
    assert not m["valid"]
    assert m["section"] is None


def test_simple_dialect():
    out = locations.parse_loc_simple(pa.array(["3.12?, - 4.118", "junk"]))
    assert out["valid"].to_pylist() == [True, False]
    assert out["bvolnum"][0].as_py() == 3 and out["bpagenum"][0].as_py() == 12
    assert out["evolnum"][0].as_py() == 4 and out["epagenum"][0].as_py() == 118
    assert out["bpageside"][0].as_py() is None


def parse_one_chap(s: str) -> dict:
    out = locations.parse_loc_bampo_chap(pa.array([s]))
    return {k: v[0].as_py() for k, v in out.items()}


def test_doc_test_bampo_range():
    # get_bampo_loc("ga 107a7-116a5") — utils.php:748
    m = parse_one_chap("ga 107a7-116a5")
    assert m["valid"] and m["badvol"] is None
    assert m["bvolname"] == "ga" and m["evolname"] is None
    assert m["bpagenum"] == 107 and m["bpageside"] == "a" and m["blinenum"] == 7
    assert m["epagenum"] == 116 and m["epageside"] == "a" and m["elinenum"] == 5


def test_doc_test_chap_point():
    # get_chap_loc("ga 107a7") — utils.php:749
    m = parse_one_chap("ga 107a7")
    assert m["valid"] and m["bvolname"] == "ga"
    assert m["bpagenum"] == 107 and m["bpageside"] == "a" and m["blinenum"] == 7
    assert m["epagenum"] is None and m["evolname"] is None


def test_chap_volless_and_cross_volume():
    m = parse_one_chap("107a7")  # bvolname optional (utils.php:566)
    assert m["valid"] and m["bvolname"] is None and m["bpagenum"] == 107
    m = parse_one_chap("ka 1b1-nga 302a5")
    assert m["valid"] and m["bvolname"] == "ka" and m["evolname"] == "nga"
    assert m["epagenum"] == 302 and m["elinenum"] == 5


def test_chap_whitelist_bvolname_only():
    # only bvolname runs the whitelist (utils.php:718-719/739-740); a miss
    # does NOT invalidate the row — the reference reports and keeps going
    m = parse_one_chap("qx 12a3")
    assert m["valid"] and m["badvol"] == "qx" and m["bpagenum"] == 12
    # evolname is never validated — 'qx' as END volume passes silently
    m = parse_one_chap("ka 1b1-qx 2a1")
    assert m["valid"] and m["badvol"] is None and m["evolname"] == "qx"


def test_chap_invalid():
    m = parse_one_chap("x??")  # report_error 'invalid_chap_loc'
    assert not m["valid"] and m["badvol"] is None


def test_chap_simple_chemdo_dialect():
    # chemdo/chemdot: pattern_loc_simple_small + whitelist/pageline SKIP
    # (utils.php:711-713, 719-724, 731-733, 739-744)
    out = locations.parse_loc_chap_simple(pa.array(["398-417", "qx 12a3", ""]))
    assert out["valid"].to_pylist() == [True, False, False]
    assert out["bpagenum"][0].as_py() == 398
    assert out["epagenum"][0].as_py() == 417
    assert out["bpageside"][0].as_py() is None  # no pageline sub-parse
    assert out["badvol"].to_pylist() == [None, None, None]  # whitelist skipped
