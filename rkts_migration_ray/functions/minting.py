"""Deterministic URI / node minting.

Reimplements the *semantics* of the reference's identifier layer:
- sha256-facet blank-node minting (bnode_url, utils.php:7-15) — the keystone
  that makes the whole pipeline order-independent and retry-safe: every node id
  is a pure function of (facet, local name, content), never a counter/UUID.
- zero-padded ids (id_to_str/chapnum_to_str/rdf_ci_to_url, utils.php:26-56).
- catalogue-index normalization (catalogue_index_xml_to_rdf, utils.php:17-24).

Every function here has an exact ANSI-SQL equivalent used by the DuckDB
oracles in __ray_entry__.py (sha256/upper/substr/lpad).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# scalar versions (tests, driver-side tiny lookups)
# ---------------------------------------------------------------------------


def mint_hash6(local: str, content: str) -> str:
    """sha256(local+content) hex [:6] uppercased — bnode_url core (utils.php:9-11)."""
    return hashlib.sha256((local + content).encode("utf-8")).hexdigest()[:6].upper()


def mint_node(facet: str, local: str, content: str) -> str:
    """'N:<FACET><HASH6>_<local>' — facet node URI (bnode_url, utils.php:7-15).

    Facets used: SE (section), TT (title), EN (minted entity), CL (location) —
    analog of the reference's CL/TT/ID/NT/EV/AIR/CR facet call sites.
    """
    return f"N:{facet}{mint_hash6(local, content)}_{local}"


def conv_uri(conv_id: str) -> str:
    return "C:" + conv_id


def turn_uri(conv_id: str, turn_idx: int) -> str:
    return f"U:{conv_id}/{turn_idx:05d}"


def pad_id(id_str: str, width: int = 4) -> str:
    """id_to_str semantics (utils.php:26-37): leading int zero-padded, suffix kept.

    '7a' → '0007a'; rdf_ci_to_url uppercases the suffix ('7a' → '0007A')."""
    n = 0
    while n < len(id_str) and id_str[n].isdigit():
        n += 1
    return f"{int(id_str[:n] or 0):0{width}d}" + id_str[n:]


def normalize_catalogue_index(index: str, edition_prefix: str = "") -> str:
    """catalogue_index_xml_to_rdf (utils.php:17-24): strip edition prefix, then
    '('/'.'/',' → '-', drop ')', '?' → '_'."""
    if edition_prefix and index.startswith(edition_prefix):
        index = index[len(edition_prefix):]
    for a, b in (("(", "-"), (".", "-"), (",", "-"), (")", ""), ("?", "_")):
        index = index.replace(a, b)
    return index


URI_TEMPLATES = {
    # ≈ the %GID/%EID/%SNUM/%CID/%VNUM URL templates of rkts.yaml:2-30,
    # substituted by the id_to_url_* family (utils.php:68-177)
    "conv": "C:%CONV",
    "turn": "U:%CONV/%TURN",
    "tool": "TOOL:%TOOL",
    "entity": "ENT:%EID",
    "graph": "G:%CONV",
}


def mint_from_template(template_key: str, **subs: str) -> str:
    """Template URI minting (M8): '%NAME' placeholders substituted from
    kwargs (turn is zero-padded like id_to_str, utils.php:26-37)."""
    out = URI_TEMPLATES[template_key]
    for k, v in subs.items():
        if k == "turn" and not isinstance(v, str):
            v = f"{int(v):05d}"
        out = out.replace("%" + k.upper(), str(v))
    if "%" in out:
        raise ValueError(f"unsubstituted placeholder in {out!r}")
    return out


# ---------------------------------------------------------------------------
# vectorized versions (hot path, Arrow in / Arrow out)
# ---------------------------------------------------------------------------


def sha256_hex_array(arr: pa.Array | pa.ChunkedArray, nchars: int) -> pa.Array:
    """Vectorized-enough sha256 prefix over a string array.

    hashlib has no Arrow kernel; this is a tight C-loop over the ndarray —
    the only per-row Python in the minting layer, amortized by batch size."""
    np_arr = np.asarray(arr)
    out = np.empty(len(np_arr), dtype=object)
    sha = hashlib.sha256
    for i, s in enumerate(np_arr):
        out[i] = sha(s.encode("utf-8")).hexdigest()[:nchars] if s is not None else None
    return pa.array(out, type=pa.string())


def mint_node_array(facet: str, local: pa.Array, content: pa.Array) -> pa.Array:
    """Vectorized mint_node: 'N:<facet><H6>_<local>' per row."""
    data = pc.binary_join_element_wise(local, content, "")
    h6 = pc.utf8_upper(sha256_hex_array(data, 6))
    return pc.binary_join_element_wise(
        pa.scalar("N:" + facet), h6, "_", local, ""
    )


def turn_uri_array(conv_id: pa.Array, turn_idx: pa.Array) -> pa.Array:
    """'U:<conv>/<%05d turn>' — zero-padded like id_to_str (utils.php:26-37)."""
    padded = pc.utf8_lpad(pc.cast(turn_idx, pa.string()), 5, "0")
    return pc.binary_join_element_wise(
        pa.scalar("U:"), conv_id, "/", padded, ""
    )
