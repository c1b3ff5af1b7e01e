"""Creator role/event table semantics (tag_to_event_role,
editionxmltottl.php:5-19 + the commented consumer loop :118-142)."""

import pyarrow as pa

from rkts_migration_ray.stages import creators


def run(texts):
    batch = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
        "turn_idx": pa.array(list(range(len(texts))), pa.int32()),
        "text": pa.array(texts),
    })
    return creators.creator_event_triples(batch).to_pandas()


def test_table_matches_reference():
    import os
    import re

    path = "/root/reference/editionxmltottl.php"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference tree not available")
    with open(path) as f:
        php = f.read()
    m = re.search(r"\$tag_to_event_role = \[(.*?)\];", php, re.S)
    ref = re.findall(
        r"'([\w-]+)' => \['([\w:]+)', '([\w:]+)'\]", m.group(1))
    # same tags, same (role, event) pairs, same TABLE ORDER (the loop
    # iterates the table, so order is semantic)
    assert ref == [(t, r, ev)
                   for t, (r, ev) in creators.TAG_TO_EVENT_ROLE.items()]


def test_tag_major_order_mints_event():
    """The outer foreach walks the TABLE (:119): the author (table-first)
    mints the AuthoredEvent node even when it appears LAST in the text, and
    the event node's key uses the first-in-table-order creator's label."""
    a = run(["cr[translator]{nor bu} cr[translator-pandita]{rin chen}"])
    # translator-pandita precedes translator in the table → its label keys
    # the shared TranslatedEvent node
    ev_rows = a[(a["pred"] == "rdf:type") & (a["obj"] == "bdo:TranslatedEvent")]
    assert len(ev_rows) == 1
    import hashlib

    from rkts_migration_ray.functions.normalize import add_shad

    local = "c0/00000"
    key = local + "bdo:TranslatedEvent" + add_shad("rin chen")
    want = "N:EV" + hashlib.sha256(key.encode()).hexdigest()[:6].upper() + "_" + local
    assert ev_rows.iloc[0]["subj"] == want


def test_event_reuse_and_air_collapse():
    # two tags of the SAME event + same name → one AIR node, two role edges
    a = run(["cr[translator]{nor bu} cr[translator-pandita]{nor bu}"])
    airs = a[(a["pred"] == "rdf:type") & (a["obj"] == "tr:AgentAsCreator")]
    assert len(airs) == 1
    roles = sorted(a[a["pred"] == "tr:role"]["obj"])
    assert roles == ["bdr:R0ER0018", "bdr:R0ER0026"]
    # one event node, one instanceEvent edge, one eventWho edge (set semantics)
    assert (a["pred"] == "tr:instanceEvent").sum() == 1
    assert (a["pred"] == "tr:eventWho").sum() == 1


def test_distinct_events_and_labels():
    a = run(["cr[author]{mi la} cr[revisor]{ras pa}"])
    evs = sorted(a[(a["pred"] == "rdf:type")
                   & a["obj"].str.startswith("bdo:")]["obj"])
    assert evs == ["bdo:AuthoredEvent", "bdo:RevisedEvent"]
    labels = a[a["pred"] == "rdfs:label"]
    assert sorted(labels["obj"]) == ["mi la/", "ras pa/"]  # shad-normalized
    assert set(labels["obj_lang"]) == {"bo-x-ewts"}


def test_unknown_tags_and_empty():
    a = run(["cr[editor]{unknown tag} no markers here"])
    assert len(a) == 0
    assert list(a.columns) == ["subj", "pred", "obj", "obj_lang",
                               "obj_dt", "graph"]
