"""Golden tests for the deterministic identifier layer (utils.php:7-56)."""

import hashlib

import pyarrow as pa

from rkts_migration_ray.functions import minting


def test_mint_hash6_golden():
    # sha256('conv-000001bo-x-ewts|foo')[:6].upper() — pure function of content
    expected = hashlib.sha256(b"conv-000001bo-x-ewts|foo").hexdigest()[:6].upper()
    assert minting.mint_hash6("conv-000001", "bo-x-ewts|foo") == expected
    assert minting.mint_node("TT", "conv-000001", "bo-x-ewts|foo") == (
        f"N:TT{expected}_conv-000001")


def test_mint_deterministic_and_content_sensitive():
    a = minting.mint_node("SE", "c1", "'dul ba")
    assert a == minting.mint_node("SE", "c1", "'dul ba")
    assert a != minting.mint_node("SE", "c1", "mdo sde")
    assert a != minting.mint_node("SE", "c2", "'dul ba")
    assert a.startswith("N:SE") and a.endswith("_c1")


def test_pad_id():
    # id_to_str semantics (utils.php:26-37): '7a' → '0007a'
    assert minting.pad_id("7") == "0007"
    assert minting.pad_id("7a") == "0007a"
    assert minting.pad_id("123", width=3) == "123"
    assert minting.pad_id("") == "0000"


def test_normalize_catalogue_index():
    # utils.php:17-24: '(' '.' ',' → '-', ')' dropped, '?' → '_'
    assert minting.normalize_catalogue_index("K12(3).4,5?") == "K12-3-4-5_"
    assert minting.normalize_catalogue_index("EID77", "EID") == "77"


def test_vectorized_matches_scalar():
    local = pa.array(["a", "b", "conv-1"])
    content = pa.array(["x", "y", "title|t"])
    out = minting.mint_node_array("TT", local, content).to_pylist()
    for lo, co, got in zip(local.to_pylist(), content.to_pylist(), out):
        assert got == minting.mint_node("TT", lo, co)


def test_turn_uri_array():
    out = minting.turn_uri_array(pa.array(["c1", "c2"]), pa.array([0, 12345])).to_pylist()
    assert out == ["U:c1/00000", "U:c2/12345"]
    assert minting.turn_uri("c1", 7) == "U:c1/00007"
