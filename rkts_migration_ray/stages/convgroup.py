"""Per-conversation ordered windows: hierarchy indices, section rollup, titles.

Runs as groupby("conv_id").map_groups(..., batch_format="pandas") — the
engine's single conv-keyed shuffle replaces every document-order dependency of
the reference (SURVEY.md §2.9):

- partIndex: dense sibling index within the enclosing section
  (countValues('bdo:hasPart')+1, editionxmltottl.php:192-195)
- partTreeIndex: zero-padded path 'SS.PPPP' (editionxmltottl.php:171,196)
- section rollover on marker change (ST8 state machine,
  editionxmltottl.php:150-206) with begin-loc from the first item and end-loc
  from the last (utils.php:447-488) — computed *before* emission, eliminating
  the reference's mutate-after-emit patch (utils.php:472-487)
- ordered-distinct volume letters per section (volumeMap accumulation,
  editionxmltottl.php:360-376, exportvolumemap.php:11-59)
- per-conv title dedup, case/separator-insensitive (kernelxmltottl.php:205-227)

In-group order is explicit (sort by turn_idx), never block-arrival order.
"""

from __future__ import annotations

import pandas as pd

from ..config import (
    DT_INT,
    P_BEGIN_LOC,
    P_END_LOC,
    P_HAS_TITLE,
    P_IN_SECTION,
    P_LABEL,
    P_PART_INDEX,
    P_SECTION_NAME,
    P_SECTION_VOLS,
    P_TREE_INDEX,
    P_TURN_COUNT,
    P_TYPE,
    T_CONV,
    T_SECTION,
    TRIPLE_COLUMNS,
)
from ..functions.minting import mint_node

CONV_GROUP_COLUMNS = [
    "conv_id", "turn_idx", "sec", "loc_valid", "loc_body", "loc_bvolname",
    "title_bcp", "title_label", "title_key",
]


def conv_group_triples(df: pd.DataFrame, one_title_per_lang: bool = False) -> pd.DataFrame:
    """One conversation (arbitrary arrival order) → window-derived triples."""
    df = df.sort_values("turn_idx", kind="stable").reset_index(drop=True)
    conv = df["conv_id"].iloc[0]
    conv_uri = "C:" + conv
    graph = "G:" + conv

    sec_marker = df["sec"]
    sec_ord = sec_marker.notna().cumsum()
    sec_name = sec_marker.ffill()
    pos = df.groupby(sec_ord).cumcount() + 1

    turn_uris = "U:" + conv + "/" + df["turn_idx"].astype(int).astype(str).str.zfill(5)
    tree_idx = sec_ord.astype(str).str.zfill(2) + "." + pos.astype(str).str.zfill(4)

    subj, pred, obj, lang, dt = [], [], [], [], []

    def emit(s, p, o, la="", d=""):
        subj.append(s); pred.append(p); obj.append(o); lang.append(la); dt.append(d)

    # vectorized per-turn window triples
    n = len(df)
    subj.extend(turn_uris); pred.extend([P_PART_INDEX] * n)
    obj.extend(pos.astype(str)); lang.extend([""] * n); dt.extend([DT_INT] * n)
    subj.extend(turn_uris); pred.extend([P_TREE_INDEX] * n)
    obj.extend(tree_idx); lang.extend([""] * n); dt.extend([""] * n)

    # conversation node
    emit(conv_uri, P_TYPE, T_CONV)
    emit(conv_uri, P_TURN_COUNT, str(n), "", DT_INT)

    # sections (rollover windows; skip turns before the first marker)
    in_sec = sec_ord > 0
    if in_sec.any():
        sec_uris = {}
        for so, g in df[in_sec].groupby(sec_ord[in_sec]):
            name = sec_name.loc[g.index[0]]
            s_uri = mint_node("SE", conv, name)
            sec_uris[so] = s_uri
            emit(s_uri, P_TYPE, T_SECTION)
            emit(s_uri, P_SECTION_NAME, name)
            locs = g[g["loc_valid"].fillna(False) & g["loc_body"].notna()]
            if len(locs):
                emit(s_uri, P_BEGIN_LOC, locs["loc_body"].iloc[0])
                emit(s_uri, P_END_LOC, locs["loc_body"].iloc[-1])
            vols = g["loc_bvolname"].dropna()
            if len(vols):
                ordered_distinct = list(dict.fromkeys(vols))
                emit(s_uri, P_SECTION_VOLS, " ".join(ordered_distinct))
        sec_uri_of_turn = sec_ord[in_sec].map(sec_uris)
        k = int(in_sec.sum())
        subj.extend(turn_uris[in_sec]); pred.extend([P_IN_SECTION] * k)
        obj.extend(sec_uri_of_turn); lang.extend([""] * k); dt.extend([""] * k)

    # titles: first occurrence per (lang, dedup-key) in turn order
    seen: set[tuple[str, str]] = set()
    title_cols = zip(df["title_bcp"], df["title_label"], df["title_key"])
    for bcps, labels, keys in title_cols:
        if bcps is None or len(bcps) == 0:
            continue
        for bcp, label, key in zip(bcps, labels, keys):
            if bcp is None or label is None:
                continue
            dedup = (bcp, "") if one_title_per_lang else (bcp, key)
            if dedup in seen:
                continue
            seen.add(dedup)
            t_uri = mint_node("TT", conv, bcp + "|" + label)
            emit(conv_uri, P_HAS_TITLE, t_uri)
            emit(t_uri, P_LABEL, label, bcp)

    out = pd.DataFrame({
        "subj": subj, "pred": pred, "obj": obj,
        "obj_lang": lang, "obj_dt": dt, "graph": graph,
    })
    return out[TRIPLE_COLUMNS]
