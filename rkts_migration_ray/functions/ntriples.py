"""N-Triples / N-Quads text serialization (W2 analog).

The reference's actual output format: every finished resource graph is
serialized and appended to one global ``global.nt`` fd (utils.php:833-840,
migrate.php:87-88) through the vendored EasyRdf N-Quads class. The escaping
semantics here are a verbatim transposition of Nquads.php:52-124
(escapedChar): codepoints 0-8, 11-12, 14-31 → ``\\uXXXX``; 9/10/13 →
``\\t``/``\\n``/``\\r``; ``"`` → ``\\"``; ``\\`` → ``\\\\``; everything else
— including all codepoints ≥ 0x5D and raw UTF-8 beyond ASCII — passes
through unescaped. Resources serialize as ``<uri>`` unless they are blank
nodes (``_:`` prefix, Nquads.php:127-135); literals as ``"value"`` with
``@lang`` or ``^^<datatype>`` (Nquads.php:149-171). The reference's
blank-node rename pass (utils.php:838) is unnecessary here: all minted ids
are deterministic content hashes (M7), so no ``_:genid`` ever exists.

Engine URIs are compact CURIEs (``U:conv/00012``); they serialize verbatim
inside the angle brackets. Whether an object is a resource or a literal is
decided by PREDICATE (OBJ_URI_PREDS) — deterministic and mirrored exactly by
the DuckDB oracle's CASE expression.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import (
    P_CONTENT_LOC,
    P_GENRE,
    P_HAS_PART,
    P_HAS_TITLE,
    P_IDENTIFIED_BY,
    P_IN_SECTION,
    P_IS_ABOUT,
    P_LANGUAGE,
    P_MENTIONS,
    P_PARALLELS,
    P_PART_OF,
    P_ROOT,
    P_TOOL,
    P_TYPE,
)

# predicates whose object is a resource URI; all others carry literals
OBJ_URI_PREDS = frozenset({
    P_TYPE, P_PART_OF, P_HAS_PART, P_ROOT, P_TOOL, P_CONTENT_LOC, P_MENTIONS,
    P_HAS_TITLE, P_IN_SECTION, P_IS_ABOUT, P_GENRE,
    # abstract-node + identifier families (kernelxmltottl.php:116-157):
    # addResource() calls in the reference, so their objects are URIs
    P_PARALLELS, P_LANGUAGE, P_IDENTIFIED_BY,
})


def _esc_char(no: int, c: str) -> str:
    """escapedChar (Nquads.php:97-124), branch for branch."""
    if no < 9:
        return f"\\u{no:04X}"
    if no == 9:
        return "\\t"
    if no == 10:
        return "\\n"
    if no < 13:
        return f"\\u{no:04X}"
    if no == 13:
        return "\\r"
    if no < 32:
        return f"\\u{no:04X}"
    if no == 34:
        return '\\"'
    if no == 92:
        return "\\\\"
    return c


_ESC_TABLE = {no: _esc_char(no, chr(no)) for no in list(range(0x20)) + [0x22, 0x5C]}


def escape_ntriples(s: str) -> str:
    """Scalar reference implementation (golden-testable)."""
    return s.translate(_ESC_TABLE)


# rows containing any char that needs escaping (rare in practice)
_NEEDS_ESC_RE = r'[\x00-\x1f"\\]'


def escape_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized escape: C-speed regex detection of the (rare) rows that
    contain an escapable char, Python translate only on those."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    hits = pc.match_substring_regex(arr, _NEEDS_ESC_RE)
    hits_np = np.asarray(pc.fill_null(hits, False))
    if not hits_np.any():
        return arr
    idx = np.nonzero(hits_np)[0]
    escaped = pa.array([escape_ntriples(s)
                        for s in arr.take(pa.array(idx)).to_pylist()], pa.string())
    # scatter the escaped values back
    out = arr.to_numpy(zero_copy_only=False).copy()
    out[idx] = escaped.to_numpy(zero_copy_only=False)
    return pa.array(out, pa.string())


def _resource_term(arr: pa.Array) -> pa.Array:
    """<uri>, or bare for blank nodes (Nquads.php:127-135). The engine never
    emits blank nodes, but the branch is kept for format completeness."""
    esc = escape_array(arr)
    bracketed = pc.binary_join_element_wise(pa.scalar("<"), esc, pa.scalar(">"), "")
    is_bnode = pc.starts_with(arr, "_:")
    if not pc.any(is_bnode).as_py():
        return bracketed
    return pc.if_else(is_bnode, esc, bracketed)


def term_columns(batch: pa.Table) -> tuple[pa.Array, pa.Array, pa.Array]:
    """Formatted (subj_term, pred_term, obj_term) arrays for a triple batch —
    the shared term grammar of the N-Triples, N-Quads and Turtle writers."""
    subj_t = _resource_term(batch["subj"].combine_chunks())
    pred_t = _resource_term(batch["pred"].combine_chunks())

    obj = batch["obj"].combine_chunks()
    lang = pc.fill_null(batch["obj_lang"].combine_chunks(), "")
    dt = pc.fill_null(batch["obj_dt"].combine_chunks(), "")
    obj_esc = escape_array(obj)
    uri_term = pc.binary_join_element_wise(pa.scalar("<"), obj_esc, pa.scalar(">"), "")
    # literal suffix: @lang, else ^^<dt>, else nothing (Nquads.php:156-165)
    has_lang = pc.invert(pc.equal(lang, ""))
    has_dt = pc.invert(pc.equal(dt, ""))
    suffix = pc.if_else(
        has_lang,
        pc.binary_join_element_wise(pa.scalar("@"), escape_array(lang), ""),
        pc.if_else(
            has_dt,
            pc.binary_join_element_wise(pa.scalar("^^<"), escape_array(dt),
                                        pa.scalar(">"), ""),
            pa.scalar("")))
    lit_term = pc.binary_join_element_wise(pa.scalar('"'), obj_esc,
                                           pa.scalar('"'), suffix, "")
    pred_vals = batch["pred"].combine_chunks()
    is_uri_obj = pc.is_in(pred_vals,
                          value_set=pa.array(sorted(OBJ_URI_PREDS), pa.string()))
    obj_term = pc.if_else(is_uri_obj, uri_term, lit_term)
    return subj_t, pred_t, obj_term


def lines_table(batch: pa.Table, with_graph: bool = False) -> pa.Table:
    """Triple rows → one 'line' column of N-Triples (or N-Quads when
    ``with_graph``; the reference writes global.nt WITHOUT the graph term,
    Nquads.php:192-197 else-branch)."""
    batch = batch.combine_chunks()
    if batch.num_rows == 0:
        return pa.table({"line": pa.array([], pa.string())})
    subj_t, pred_t, obj_term = term_columns(batch)

    if with_graph:
        graph_t = _resource_term(batch["graph"].combine_chunks())
        line = pc.binary_join_element_wise(
            subj_t, pred_t, obj_term,
            pc.binary_join_element_wise(graph_t, pa.scalar("."), " "), " ")
    else:
        line = pc.binary_join_element_wise(subj_t, pred_t, obj_term,
                                           pa.scalar("."), " ")
    return pa.table({"line": line})
