"""Creator role/event emission — the tag_to_event_role table
(editionxmltottl.php:5-19) and its consumer loop (:118-142).

The consumer is COMMENTED OUT in the reference (dead code since the bdrc
migration), so these triples do NOT ride the headline kg_triples stream —
parity with the reference's emitted triple set would break. They are exposed
as their own query (kg_creator_events) for users who re-enable the event
emission, with the loop's semantics mirrored exactly:

- iteration is TAG-MAJOR (the outer foreach walks the TABLE, :119): all
  'author' creators come before all 'translator-pandita' creators regardless
  of document order — the event node for each event TYPE is minted by the
  FIRST creator in that order, and its bnode key uses that creator's
  normalized label (:126);
- each creator gets an AgentAsCreator node keyed (event, label) (:134):
  two same-named creators of one event collapse to one AIR node, and a name
  reached via two tags of the same event (translator + translator-pandita)
  collapses to one AIR node carrying BOTH role edges — RDF set semantics,
  reproduced here with an exact-duplicate drop per turn;
- names normalize as bo-x-ewts literals (normalize_lit :124 → shad rules).

Turn markers ``cr[<tag>]{<name>}`` stand in for the reference's per-item
child elements (``$item->$tag``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowutils import extract_all, from_pandas_clean
from ..functions.minting import sha256_hex_array
from ..functions.normalize import add_shad_array

# verbatim table (editionxmltottl.php:5-19) — the semantics being matched
TAG_TO_EVENT_ROLE: dict[str, tuple[str, str]] = {
    "author": ("bdr:R0ER0011", "bdo:AuthoredEvent"),
    "translator-pandita": ("bdr:R0ER0018", "bdo:TranslatedEvent"),
    "translator": ("bdr:R0ER0026", "bdo:TranslatedEvent"),
    "sponsor": ("bdr:R0ER0030", "bdo:TranslatedEvent"),
    "scribe": ("bdr:R0ER0024", "bdo:TranslatedEvent"),
    "translator2-pandita": ("bdr:R0ER0018", "bdo:SecondTranslatedEvent"),
    "translator2": ("bdr:R0ER0018", "bdo:SecondTranslatedEvent"),
    "revisor-pandita": ("bdr:R0ER0018", "bdo:RevisedEvent"),
    "revisor": ("bdr:R0ER0023", "bdo:RevisedEvent"),
    "revisor2-pandita": ("bdr:R0ER0018", "bdo:SecondRevisedEvent"),
    "revisor2": ("bdr:R0ER0023", "bdo:SecondRevisedEvent"),
    "revisor3-pandita": ("bdr:R0ER0018", "bdo:ThirdRevisedEvent"),
    "revisor3": ("bdr:R0ER0023", "bdo:ThirdRevisedEvent"),
}
TAG_ORDER = {t: i for i, t in enumerate(TAG_TO_EVENT_ROLE)}

CREATOR_TAIL = r"^(?P<tag>[\w-]+)\]\{(?P<name>[^}]*)\}"

TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ("obj_lang", pa.string()), ("obj_dt", pa.string()),
    ("graph", pa.string()),
])


def _facet(prefix: str, key: pa.Array, local: pa.Array) -> pa.Array:
    """bnode_url (utils.php:7-15) with the turn as the owning resource:
    '<prefix><HASH6(local+objectstr)>_<local>'."""
    h6 = pc.utf8_upper(sha256_hex_array(
        pc.binary_join_element_wise(local, key, ""), 6))
    return pc.binary_join_element_wise(
        pa.scalar("N:" + prefix), h6, "_", local, "")


def creator_event_triples(batch: pa.Table) -> pa.Table:
    """transcripts batch → event/AgentAsCreator triples (:118-142)."""
    batch = batch.combine_chunks()
    text = batch["text"].combine_chunks() if isinstance(
        batch["text"], pa.ChunkedArray) else batch["text"]
    rows, ext = extract_all(text, "cr[", CREATOR_TAIL)
    if len(rows) == 0:
        return TRIPLE_SCHEMA.empty_table()
    tag = pc.struct_field(ext, "tag").to_pylist()
    keep = np.array([t in TAG_ORDER for t in tag])
    if not keep.any():
        return TRIPLE_SCHEMA.empty_table()
    rows = rows[keep]
    keep_arr = pa.array(keep)
    name = pc.struct_field(ext, "name").filter(keep_arr)
    label = add_shad_array(name)  # normalize_lit as bo-x-ewts (:124)

    conv = batch["conv_id"].take(pa.array(rows, pa.int64()))
    tidx = batch["turn_idx"].take(pa.array(rows, pa.int64()))
    padded = pc.utf8_lpad(pc.cast(tidx, pa.string()), 5, "0")
    local = pc.binary_join_element_wise(conv, "/", padded, "")
    turn = pc.binary_join_element_wise(pa.scalar("U:"), local, "")
    graph = pc.binary_join_element_wise(pa.scalar("G:"), conv, "")

    kept_tags = [t for t, k in zip(tag, keep) if k]
    df = pd.DataFrame({
        "row": rows,
        "tag_ord": [TAG_ORDER[t] for t in kept_tags],
        "role": [TAG_TO_EVENT_ROLE[t][0] for t in kept_tags],
        "event": [TAG_TO_EVENT_ROLE[t][1] for t in kept_tags],
        "label": label.to_pylist(),
        "local": local.to_pylist(),
        "turn": turn.to_pylist(),
        "graph": graph.to_pylist(),
    })
    # tag-major order within each turn (outer foreach over the table, :119);
    # document order breaks ties — the stable sort preserves extract order
    df = df.sort_values(["row", "tag_ord"], kind="stable").reset_index(drop=True)
    # event node minted by the FIRST creator of each (turn, event) (:125-131)
    first = df.groupby(["row", "event"], sort=False).head(1).copy()

    def col(frame, name):
        return pa.array(frame[name].to_numpy(object), pa.string())

    ev_first = _facet("EV", pa.array(
        (first["event"] + first["label"]).to_numpy(object), pa.string()),
        col(first, "local"))
    first["ev"] = ev_first.to_pylist()
    df = df.merge(first[["row", "event", "ev"]], on=["row", "event"], how="left")
    air = _facet("AIR", pa.array(
        (df["event"] + df["label"]).to_numpy(object), pa.string()),
        col(df, "local"))
    df["air"] = air.to_pylist()

    # build triple frames in pandas (small: creators are sparse), then one
    # exact-duplicate drop per batch = RDF set semantics (EasyRdf graphs
    # collapse repeated identical triples at serialization)
    frames = [
        pd.DataFrame({"subj": first["ev"], "pred": "rdf:type",
                      "obj": first["event"], "obj_lang": "", "obj_dt": "",
                      "graph": first["graph"]}),
        pd.DataFrame({"subj": first["turn"], "pred": "tr:instanceEvent",
                      "obj": first["ev"], "obj_lang": "", "obj_dt": "",
                      "graph": first["graph"]}),
        pd.DataFrame({"subj": df["air"], "pred": "rdf:type",
                      "obj": "tr:AgentAsCreator", "obj_lang": "",
                      "obj_dt": "", "graph": df["graph"]}),
        pd.DataFrame({"subj": df["air"], "pred": "tr:role", "obj": df["role"],
                      "obj_lang": "", "obj_dt": "", "graph": df["graph"]}),
        pd.DataFrame({"subj": df["air"], "pred": "rdfs:label",
                      "obj": df["label"], "obj_lang": "bo-x-ewts",
                      "obj_dt": "", "graph": df["graph"]}),
        pd.DataFrame({"subj": df["ev"], "pred": "tr:eventWho",
                      "obj": df["air"], "obj_lang": "", "obj_dt": "",
                      "graph": df["graph"]}),
    ]
    out = pd.concat(frames, ignore_index=True).drop_duplicates()
    return from_pandas_clean(out, TRIPLE_SCHEMA)
