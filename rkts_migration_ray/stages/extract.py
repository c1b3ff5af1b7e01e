"""Turn-level feature extraction + structural triple emission.

The flagship map_batches stage (M1/M2 analog, SURVEY.md §2.3): one catalog
record → N triples becomes one transcript turn → feature columns → N triples.
Everything here is stateless, batch_format="pyarrow", zero-copy, built from
Arrow kernels (extract_regex / split_pattern / string joins); module-level
compiled patterns play the role of per-actor state for stateless tasks.

Emission semantics mirrored from the reference:
- per-record typed node + structural edges (editionxmltottl.php:21-289)
- deterministic sha256 facet minting (bnode_url, utils.php:7-15)
- placeholder-id filtering '-', '?', 'new' (editionxmltottl.php:33-34)
- invalid-loc / invalid-volname error channel (report_error utils.php:558-560)
  emitted as quarantine triples in graph 'G:quarantine' (W6 analog).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import (
    DT_LONG,
    NAME_TO_BCP,
    P_AT_TIME,
    P_PART_OF,
    P_ROLE,
    P_ROOT,
    P_TEXT_DIGEST,
    P_TOOL,
    P_TYPE,
    PLACEHOLDER_IDS,
    RULE_INVALID_LOC,
    RULE_INVALID_VOLNAME,
    T_TURN,
)
from ..functions.arrowutils import extract_all, from_pandas_clean
from ..functions.locations import parse_loc_full, parse_loc_simple
from ..functions.minting import sha256_hex_array, turn_uri_array
from ..functions.normalize import normalize_title_array, title_dedup_key

SEC_PATTERN = r"sec\{(?P<sec>[^}]*)\}"
CHAP_TAIL = r"^(?P<title>[^}]*)\}"
LOC_PATTERN = r"loc\{(?P<body>[^}]*)\}"
LOCS_PATTERN = r"locs\{(?P<body>[^}]*)\}"
TITLE_TAIL = r"^(?P<k>\w+)\]\{(?P<title>[^}]*)\}"
MENTION_TAIL = r"^(?P<alias>[^\]]*)\]"

GRAPH_QUARANTINE = "G:quarantine"


def _chunk(table: pa.Table, name: str) -> pa.Array:
    col = table[name]
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
    return col


def _first_group(text: pa.Array, pattern: str, group: str) -> pa.Array:
    ext = pc.extract_regex(text, pattern)
    if len(text):
        ext = pc.if_else(pc.is_valid(ext), ext, pa.nulls(len(text), ext.type))
    return pc.struct_field(ext, group)


def _list_column(n_rows: int, rows: np.ndarray, values: pa.Array) -> pa.ListArray:
    """Pack (row_idx, value) pairs (row_idx non-decreasing) into list<...>."""
    counts = (np.bincount(rows, minlength=n_rows) if len(rows)
              else np.zeros(n_rows, np.int64))
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)


def extract_features(batch: pa.Table, target: str = "bdrc",
                     include_chaploc: bool = False) -> pa.Table:
    """transcripts batch → per-turn feature columns (pure, vectorized).

    ``include_chaploc`` adds the chapter-location quarantine list columns
    (two more regex passes over text) — only the structural emission branch
    consumes them, so the conv/mention branches skip the cost."""
    batch = batch.combine_chunks()
    text = _chunk(batch, "text")
    n = len(batch)

    sec = _first_group(text, SEC_PATTERN, "sec")
    loc_full_body = _first_group(text, LOC_PATTERN, "body")
    loc_simple_body = _first_group(text, LOCS_PATTERN, "body")

    full = parse_loc_full(loc_full_body)
    simple = parse_loc_simple(loc_simple_body)
    has_full = pc.is_valid(loc_full_body)
    loc_kind = pc.if_else(
        has_full, pa.scalar("full", pa.string()),
        pc.if_else(pc.is_valid(loc_simple_body), pa.scalar("simple", pa.string()),
                   pa.scalar(None, pa.string())))
    merged = {
        k: pc.if_else(has_full, full[k], simple[k])
        for k in ("section", "bvolname", "evolname", "bvolnum", "evolnum",
                  "bpagenum", "bpageside", "blinenum", "epagenum", "epageside",
                  "elinenum", "valid", "badvol")
    }
    loc_body = pc.if_else(has_full, loc_full_body, loc_simple_body)

    # titles → parallel list columns (lang-bcp, normalized label, dedup key)
    t_rows, t_ext = extract_all(text, "ttl[", TITLE_TAIL)
    t_k = pc.struct_field(t_ext, "k")
    t_title = pc.struct_field(t_ext, "title")
    t_bcp = pa.array([NAME_TO_BCP.get(k) for k in t_k.to_pylist()], pa.string())
    t_label = normalize_title_array(t_title, t_bcp, target)
    t_key = title_dedup_key(t_title)
    keep = np.asarray(pc.and_(pc.is_valid(t_bcp), pc.is_valid(t_label))).astype(bool)
    keep_arr = pa.array(keep)
    title_bcp = _list_column(n, t_rows[keep], t_bcp.filter(keep_arr))
    title_label = _list_column(n, t_rows[keep], t_label.filter(keep_arr))
    title_key = _list_column(n, t_rows[keep], t_key.filter(keep_arr))

    # chapters → list column of normalized labels (editionxmltottl.php:236-245:
    # '. ' before position 5 strips the numbering prefix; a missing '. '
    # triggers PHP's strpos-false quirk — false+2 == 2 — chopping the first
    # two characters; then normalize_lit as bo-x-ewts, i.e. shad rules)
    from ..functions.normalize import add_shad

    def _chapter_label(raw: str) -> str:
        dot = raw.find(". ")
        if dot == -1:
            raw = raw[2:]
        elif dot < 5:
            raw = raw[dot + 2:]
        return add_shad(raw)

    c_rows, c_ext = extract_all(text, "chap{", CHAP_TAIL)
    c_raw = pc.struct_field(c_ext, "title")
    # raw-empty titles are skipped WITHOUT consuming a chapter number
    # (editionxmltottl.php:222-224: the empty check precedes chapnum += 1)
    keep_c = np.asarray(pc.invert(pc.equal(c_raw, ""))).astype(bool)
    c_label = pa.array([_chapter_label(x)
                        for x in c_raw.filter(pa.array(keep_c)).to_pylist()],
                       pa.string())
    chap_label = _list_column(n, c_rows[keep_c], c_label)

    # chapter-location quarantine payloads (bampo/chap dialect,
    # utils.php:707-746) — compact per-turn lists; the full parse is the
    # separate chap_loc_rows surface (kg_chap_locations)
    if include_chaploc:
        (qi_rows, qi_vals), (qv_rows, qv_vals) = _chap_loc_quarantine_lists(text)
        chaploc_invalid = _list_column(n, qi_rows, qi_vals)
        chaploc_badvol = _list_column(n, qv_rows, qv_vals)

    # mentions → list column (placeholders dropped per editionxmltottl.php:33-34)
    m_rows, m_ext = extract_all(text, "@[", MENTION_TAIL)
    m_alias = pc.struct_field(m_ext, "alias")
    keep_m = np.asarray(pc.invert(
        pc.is_in(m_alias, value_set=pa.array(sorted(PLACEHOLDER_IDS)))))
    mentions = _list_column(n, m_rows[keep_m], m_alias.filter(pa.array(keep_m)))

    cols = {
        "conv_id": batch["conv_id"],
        "turn_idx": batch["turn_idx"],
        "role": batch["role"],
        "tool": batch["tool"],
        "ts_us": pc.cast(batch["ts"], pa.int64()),
        "text_digest": sha256_hex_array(pc.fill_null(text, ""), 12),
        "sec": sec,
        "loc_kind": loc_kind,
        "loc_body": loc_body,
        "loc_valid": pc.fill_null(merged["valid"], False),
        "loc_badvol": merged["badvol"],
        "title_bcp": title_bcp,
        "title_label": title_label,
        "title_key": title_key,
        "chap_label": chap_label,
        "mentions": mentions,
    }
    if include_chaploc:
        cols["chaploc_invalid"] = chaploc_invalid
        cols["chaploc_badvol"] = chaploc_badvol
    for k in ("section", "bvolname", "evolname", "bvolnum", "evolnum",
              "bpagenum", "bpageside", "blinenum", "epagenum", "epageside",
              "elinenum"):
        cols["loc_" + k] = merged[k]
    return pa.table(cols)


def _const(v: str, n: int) -> pa.Array:
    return pa.array(np.repeat(v, n), pa.string())


def _triple_block(subj, pred, obj, lang, dt, graph) -> pa.Table:
    n = len(subj)
    mk = lambda v: _const(v, n) if isinstance(v, str) else v  # noqa: E731
    return pa.table({"subj": mk(subj), "pred": mk(pred), "obj": mk(obj),
                     "obj_lang": mk(lang), "obj_dt": mk(dt), "graph": mk(graph)})


def structural_triples(feats: pa.Table) -> pa.Table:
    """Per-turn structural triples + quarantine rows — no shuffle needed.

    Predicate set ≈ the per-item emission of edition_item_to_ttl
    (editionxmltottl.php:21-289) transposed to turns."""
    feats = feats.combine_chunks()
    n = len(feats)
    conv = _chunk(feats, "conv_id")
    turn = turn_uri_array(conv, _chunk(feats, "turn_idx"))
    conv_uri = pc.binary_join_element_wise(pa.scalar("C:"), conv, "")
    graph = pc.binary_join_element_wise(pa.scalar("G:"), conv, "")
    e = _const("", n)

    blocks = [
        _triple_block(turn, P_TYPE, T_TURN, e, e, graph),
        _triple_block(turn, P_PART_OF, conv_uri, e, e, graph),
        _triple_block(turn, P_ROOT, conv_uri, e, e, graph),
        _triple_block(turn, P_ROLE, _chunk(feats, "role"), e, e, graph),
        _triple_block(turn, P_AT_TIME, pc.cast(_chunk(feats, "ts_us"), pa.string()),
                      e, _const(DT_LONG, n), graph),
        _triple_block(turn, P_TEXT_DIGEST, _chunk(feats, "text_digest"), e, e, graph),
    ]
    # tool edges only where tool != '' (sparse)
    tool = _chunk(feats, "tool")
    tmask = pc.invert(pc.equal(pc.fill_null(tool, ""), ""))
    if pc.any(tmask).as_py():
        tool_obj = pc.binary_join_element_wise(pa.scalar("TOOL:"), tool, "")
        blocks.append(_triple_block(
            turn.filter(tmask), P_TOOL, tool_obj.filter(tmask),
            "", "", graph.filter(tmask)))

    # quarantine: unparsable loc body (report_error 'invalid_loc', utils.php:626)
    bmask = pc.and_(pc.is_valid(_chunk(feats, "loc_kind")),
                    pc.invert(_chunk(feats, "loc_valid")))
    if pc.any(bmask).as_py():
        blocks.append(_triple_block(
            turn.filter(bmask), "q:" + RULE_INVALID_LOC,
            pc.fill_null(_chunk(feats, "loc_body"), "").filter(bmask),
            "", "", GRAPH_QUARANTINE))
    # quarantine: volume letter outside whitelist (utils.php:634-639)
    vmask = pc.is_valid(_chunk(feats, "loc_badvol"))
    if pc.any(vmask).as_py():
        blocks.append(_triple_block(
            turn.filter(vmask), "q:" + RULE_INVALID_VOLNAME,
            _chunk(feats, "loc_badvol").filter(vmask),
            "", "", GRAPH_QUARANTINE))
    # quarantine: chapter-location grammar miss (invalid_chap_loc,
    # utils.php:713-716/730-733) + bvolname whitelist (utils.php:718-719,
    # 739-740; never fires for the chemdo dialect — whitelist skipped).
    # Present only when the feature stage ran with include_chaploc=True.
    from ..config import RULE_INVALID_CHAP_LOC

    for col, rule in (("chaploc_invalid", RULE_INVALID_CHAP_LOC),
                      ("chaploc_badvol", RULE_INVALID_VOLNAME)):
        if col not in feats.column_names:
            continue
        lst = _chunk(feats, col)
        flat = lst.flatten()
        if len(flat):
            parents = pc.list_parent_indices(lst)
            blocks.append(_triple_block(
                turn.take(parents), "q:" + rule, flat,
                "", "", GRAPH_QUARANTINE))
    return pa.concat_tables(blocks).combine_chunks()


CHAPLOC_TAIL = r"^(?P<body>[^}]*)\}"
CHAP_LOC_FIELD_NAMES = ("section", "bvolname", "evolname", "bvolnum",
                        "evolnum", "bpagenum", "bpageside", "blinenum",
                        "epagenum", "epageside", "elinenum")


def _run_ordinals(rows: np.ndarray) -> np.ndarray:
    """1-based ordinal of each element within its run of equal row indices
    (rows is non-decreasing, as produced by extract_all)."""
    if len(rows) == 0:
        return np.array([], dtype=np.int64)
    starts = np.concatenate(([0], np.flatnonzero(rows[1:] != rows[:-1]) + 1))
    runlens = np.diff(np.concatenate((starts, [len(rows)])))
    return np.arange(len(rows), dtype=np.int64) - np.repeat(starts, runlens) + 1


def chap_loc_rows(batch: pa.Table) -> pa.Table:
    """One flat row per chapter-location marker (M3 bampo/chapter dialect,
    utils.php:707-746): ``chl{...}`` carries the standard bampo/chapter
    grammar (get_chap_loc non-chemdo branch, whitelist on bvolname only);
    ``chls{...}`` the chemdo/chemdot simple dialect (whitelist + pageline
    sub-parse SKIPPED — the fileName conditional at utils.php:719-724 /
    739-744, encoded at the marker level exactly like the loc{}/locs{}
    split models the reference's per-edition dialect switch).

    cidx is the 1-based ordinal of the marker within its turn — the
    reference's per-part chapter counter (editionxmltottl.php:220,225)."""
    from ..functions.locations import parse_loc_bampo_chap, parse_loc_chap_simple

    batch = batch.combine_chunks()
    text = _chunk(batch, "text")
    conv = _chunk(batch, "conv_id")
    tidx = _chunk(batch, "turn_idx")
    out = []
    for prefix, kind, parser in (
            ("chl{", "chap", parse_loc_bampo_chap),
            ("chls{", "chap_simple", parse_loc_chap_simple)):
        rows, ext = extract_all(text, prefix, CHAPLOC_TAIL)
        body = pc.struct_field(ext, "body")
        parsed = parser(body)
        take = pa.array(rows, pa.int64())
        cols = {
            "conv_id": conv.take(take),
            "turn_idx": pc.cast(tidx.take(take), pa.int64()),
            "cidx": pa.array(_run_ordinals(rows), pa.int64()),
            "kind": _const(kind, len(rows)),
            "body": body,
            "valid": parsed["valid"],
            "badvol": parsed["badvol"],
        }
        for k in CHAP_LOC_FIELD_NAMES:
            cols[k] = parsed[k]
        out.append(pa.table(cols))
    return pa.concat_tables(out).combine_chunks()


def _chap_loc_quarantine_lists(text: pa.Array):
    """Per-turn compact quarantine payloads for chapter-location markers:
    (rows, bodies) of grammar misses and (rows, letters) of whitelist
    violations, each sorted by row so _list_column can pack them. The full
    parse surface is chap_loc_rows; these two lists are all structural
    emission needs."""
    from ..functions.locations import parse_loc_bampo_chap, parse_loc_chap_simple

    inv_rows, inv_vals, bad_rows, bad_vals = [], [], [], []
    for prefix, parser in (("chl{", parse_loc_bampo_chap),
                           ("chls{", parse_loc_chap_simple)):
        rows, ext = extract_all(text, prefix, CHAPLOC_TAIL)
        body = pc.struct_field(ext, "body")
        parsed = parser(body)
        imask = np.asarray(pc.invert(parsed["valid"])).astype(bool)
        inv_rows.append(rows[imask])
        inv_vals.append(pc.fill_null(body, "").filter(pa.array(imask)))
        vmask = np.asarray(pc.is_valid(parsed["badvol"])).astype(bool)
        bad_rows.append(rows[vmask])
        bad_vals.append(parsed["badvol"].filter(pa.array(vmask)))

    def _merge(row_parts, val_parts):
        rows = np.concatenate(row_parts) if row_parts else np.array([], np.int64)
        vals = pa.concat_arrays([v.combine_chunks() if isinstance(v, pa.ChunkedArray)
                                 else v for v in val_parts])
        order = np.argsort(rows, kind="stable")
        return rows[order], vals.take(pa.array(order, pa.int64()))

    return _merge(inv_rows, inv_vals), _merge(bad_rows, bad_vals)


def location_triples(feats: pa.Table) -> pa.Table:
    """Valid location markers → ContentLocation facet nodes + typed edges.

    ≈ add_location_simple/add_location (utils.php:412-544): one minted CL node
    per (conv, loc string) — bnode_url facet 'CL' (utils.php:415) — carrying
    begin/end volume/page/line properties. Identical loc strings in one conv
    mint the same node (content-addressed), exactly like the reference."""
    from ..config import (
        DT_INT,
        P_CONTENT_LOC,
        P_LOC_END_LINENUM,
        P_LOC_END_PAGENUM,
        P_LOC_END_PAGESIDE,
        P_LOC_END_VOLNUM,
        P_LOC_END_VOLNAME,
        P_LOC_LINENUM,
        P_LOC_PAGENUM,
        P_LOC_PAGESIDE,
        P_LOC_SECTION,
        P_LOC_VOLNAME,
        P_LOC_VOLNUM,
        T_CONTENT_LOCATION,
    )
    from ..functions.minting import mint_node_array

    feats = feats.combine_chunks()
    ok = pc.and_(pc.is_valid(_chunk(feats, "loc_kind")), _chunk(feats, "loc_valid"))
    mask = pa.array(np.asarray(ok))
    t = feats.filter(mask)
    if t.num_rows == 0:
        return pa.table({c: pa.array([], pa.string())
                         for c in ("subj", "pred", "obj", "obj_lang", "obj_dt", "graph")})
    conv = _chunk(t, "conv_id")
    turn = turn_uri_array(conv, _chunk(t, "turn_idx"))
    graph = pc.binary_join_element_wise(pa.scalar("G:"), conv, "")
    cl = mint_node_array("CL", conv, _chunk(t, "loc_body"))
    n = t.num_rows
    e = _const("", n)
    blocks = [
        _triple_block(cl, P_TYPE, T_CONTENT_LOCATION, e, e, graph),
        _triple_block(turn, P_CONTENT_LOC, cl, e, e, graph),
    ]
    str_props = [("loc_section", P_LOC_SECTION), ("loc_bvolname", P_LOC_VOLNAME),
                 ("loc_evolname", P_LOC_END_VOLNAME),
                 ("loc_bpageside", P_LOC_PAGESIDE),
                 ("loc_epageside", P_LOC_END_PAGESIDE)]
    int_props = [("loc_bvolnum", P_LOC_VOLNUM), ("loc_evolnum", P_LOC_END_VOLNUM),
                 ("loc_bpagenum", P_LOC_PAGENUM), ("loc_epagenum", P_LOC_END_PAGENUM),
                 ("loc_blinenum", P_LOC_LINENUM), ("loc_elinenum", P_LOC_END_LINENUM)]
    for col, pred in str_props:
        v = _chunk(t, col)
        m = pa.array(np.asarray(pc.is_valid(v)))
        if pc.any(m).as_py():
            blocks.append(_triple_block(cl.filter(m), pred, v.filter(m),
                                        "", "", graph.filter(m)))
    for col, pred in int_props:
        v = _chunk(t, col)
        m = pa.array(np.asarray(pc.is_valid(v)))
        if pc.any(m).as_py():
            blocks.append(_triple_block(
                cl.filter(m), pred, pc.cast(v.filter(m), pa.string()),
                "", DT_INT, graph.filter(m)))
    return pa.concat_tables(blocks).combine_chunks()


# User-extension surface (SURVEY.md §2.10): the map-only triple emitters run
# as a REGISTRY of named extractors inside one map_batches pass — adding a
# custom predicate family is registering one function(feats)->triples, the
# analog of adding a rkts.yaml collection block + extractor. The default
# registry reproduces the reference's emission exactly; extensions append.
EXTRACTORS: dict[str, "object"] = {}


def register_extractor(name: str, fn) -> None:
    """Register fn(feats: pa.Table) -> triples pa.Table (columns
    TRIPLE_COLUMNS) to run fused with the built-in emitters. Names are
    unique; re-registering a name replaces it (tests clean up after
    themselves)."""
    EXTRACTORS[name] = fn


register_extractor("structural", structural_triples)
register_extractor("locations", location_triples)


def structural_and_location_triples(feats: pa.Table) -> pa.Table:
    """Fused map stage: every registered extractor in ONE pass (default:
    structural + ContentLocation).

    The emitters are map-only over the same feats batch; fusing them halves
    the number of read+extract subtree executions in the materialize path
    (the two streams were separate Dataset branches, each recomputing
    extract_features over the full corpus)."""
    return pa.concat_tables([fn(feats) for fn in EXTRACTORS.values()])


def explode_mentions(feats: pa.Table) -> pa.Table:
    """(conv_id, turn_idx, alias) rows; per-turn duplicate aliases collapsed
    (a turn lives wholly inside one batch row, so in-batch dedup is exact)."""
    feats = feats.combine_chunks()
    ml = _chunk(feats, "mentions")
    counts = np.asarray(pc.list_value_length(ml).fill_null(0))
    rows = np.repeat(np.arange(len(feats)), counts)
    aliases = pc.list_flatten(ml)
    t = pa.table({
        "conv_id": _chunk(feats, "conv_id").take(pa.array(rows)),
        "turn_idx": _chunk(feats, "turn_idx").take(pa.array(rows)),
        "alias": aliases,
    })
    if len(t) == 0:
        return t
    # in-batch distinct without leaving Arrow: group_by on all columns with
    # no aggregates yields the unique key rows
    uniq = t.group_by(["conv_id", "turn_idx", "alias"],
                      use_threads=False).aggregate([])
    return uniq.select(t.column_names).cast(t.schema)
