"""Unit tests for the extraction stage over a hand-built batch."""

import pyarrow as pa

from rkts_migration_ray.stages import extract


def make_batch(texts, convs=None, idxs=None):
    n = len(texts)
    return pa.table({
        "conv_id": pa.array(convs or [f"c{i}" for i in range(n)], pa.string()),
        "turn_idx": pa.array(idxs or list(range(n)), pa.int32()),
        "role": pa.array(["user"] * n, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array([""] * n, pa.string()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)], pa.timestamp("us")),
    })


def test_markers_extracted():
    b = make_batch([
        "sec{mdo sde} hello ttl[tib]{nga ro} loc{mdo sde, ka 1b1-2a3 (vol. 1)} @[e-1] @[e-2]",
        "plain text only",
        "",
        "ttl[sktuni]{dropped} ttl[xx]{unknown-kind} @[?] @[-] @[new]",
    ])
    f = extract.extract_features(b)
    assert f["sec"].to_pylist() == ["mdo sde", None, None, None]
    assert f["loc_kind"].to_pylist() == ["full", None, None, None]
    assert f["loc_valid"].to_pylist() == [True, False, False, False]
    assert f["title_label"].to_pylist()[0] == ["nga ro/"]      # shad applied
    assert f["title_label"].to_pylist()[3] == []               # policy + unknown kind
    assert f["mentions"].to_pylist() == [["e-1", "e-2"], [], [], []]  # placeholders dropped
    assert f["loc_bpagenum"].to_pylist() == [1, None, None, None]


def test_structural_triples_counts():
    b = make_batch(["a", "b"], convs=["c1", "c1"], idxs=[0, 1])
    t = extract.structural_triples(extract.extract_features(b))
    preds = t["pred"].to_pylist()
    # 6 unconditional predicates per turn, no tools, no quarantine
    assert len(t) == 12
    assert preds.count("rdf:type") == 2 and preds.count("tr:textDigest") == 2
    assert set(t["graph"].to_pylist()) == {"G:c1"}


def test_quarantine_rows():
    b = make_batch(["loc{%%bad%%}", "loc{mdo, qx 3a1 (vol. 1)}"])
    t = extract.structural_triples(extract.extract_features(b))
    q = t.filter(pa.compute.equal(t["graph"], "G:quarantine"))
    rules = sorted(q["pred"].to_pylist())
    assert rules == ["q:invalid_loc", "q:invalid_volname"]
    assert "%%bad%%" in q["obj"].to_pylist()


def test_explode_mentions_dedups_within_turn():
    b = make_batch(["@[x] @[x] @[y]"], convs=["c9"], idxs=[3])
    m = extract.explode_mentions(extract.extract_features(b))
    assert sorted(m["alias"].to_pylist()) == ["x", "y"]
    assert m["conv_id"].to_pylist() == ["c9", "c9"]


def test_chapter_labels_and_hierarchy():
    """Chapter extraction quirks (editionxmltottl.php:236-245) + the 3-level
    partTreeIndex SS.PPPP.CC emission (editionxmltottl.php:233-234)."""
    import pandas as pd

    from rkts_migration_ray.config import (
        P_HAS_PART,
        P_PART_INDEX,
        P_PART_OF,
        P_TREE_INDEX,
        P_TYPE,
        T_CHAPTER,
    )
    from rkts_migration_ray.stages.convgroup import (
        CONV_GROUP_COLUMNS,
        conv_group_triples,
    )

    b = make_batch([
        "sec{mdo sde} chap{1. nga ro} chap{chapter 2. sgrub thab} chap{rgyud pa}",
    ], convs=["c0"], idxs=[0])
    f = extract.extract_features(b)
    # '1. ' (dot<5) stripped; 'chapter 2. ' (dot>=5) kept whole; no '. ' at
    # all -> PHP strpos-false quirk chops 2 chars ('rgyud pa' -> 'yud pa')
    labels = f["chap_label"].to_pylist()[0]
    assert labels[0] == "nga ro/"
    assert labels[1].startswith("chapter 2. ")
    assert labels[2] == "yud pa/"  # shad appended after the chop
    df = f.select(CONV_GROUP_COLUMNS).to_pandas()
    trips = conv_group_triples(df)
    ch_types = trips[(trips["pred"] == P_TYPE) & (trips["obj"] == T_CHAPTER)]
    assert len(ch_types) == 3
    trees = trips[trips["pred"] == P_TREE_INDEX]
    ch_trees = sorted(t for t in trees["obj"] if t.count(".") == 2)
    assert ch_trees == ["01.0001.01", "01.0001.02", "01.0001.03"]
    curi = ch_types["subj"].iloc[0]
    assert trips[(trips["pred"] == P_PART_OF) & (trips["subj"] == curi)]["obj"].iloc[0] == "U:c0/00000"
    assert (trips[trips["pred"] == P_HAS_PART]["subj"] == "U:c0/00000").all()
    idxs = trips[(trips["pred"] == P_PART_INDEX) & (trips["subj"].str.startswith("N:CH"))]
    assert sorted(idxs["obj"]) == ["1", "2", "3"]


def test_extractor_registry_extension(sf_tag):
    """SURVEY §2.10 user-extension surface: a custom extractor registered by
    name runs fused with the built-ins and its triples appear in the output;
    deregistering restores the exact default emission."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rkts_migration_ray import fixtures
    from rkts_migration_ray.stages import extract

    import os
    fp = fixtures.transcripts_path(sf_tag)
    t = pq.read_table(os.path.join(fp, sorted(os.listdir(fp))[0])).slice(0, 200)
    feats = extract.extract_features(t)
    base = extract.structural_and_location_triples(feats)

    def turn_parity(f: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from rkts_migration_ray.functions.minting import turn_uri_array
        n = len(f)
        subj = turn_uri_array(f["conv_id"].combine_chunks(),
                              f["turn_idx"].combine_chunks())
        parity = pc.cast(pc.bit_wise_and(f["turn_idx"].combine_chunks(), 1),
                         pa.string())
        return pa.table({"subj": subj,
                         "pred": pa.array(["x:turnParity"] * n),
                         "obj": parity,
                         "obj_lang": pa.array([""] * n),
                         "obj_dt": pa.array(["xsd:integer"] * n),
                         "graph": pa.array(["G:ext"] * n)})

    extract.register_extractor("turn_parity", turn_parity)
    try:
        ext = extract.structural_and_location_triples(feats)
        assert ext.num_rows == base.num_rows + len(feats)
        assert ext.filter(
            __import__("pyarrow.compute", fromlist=["equal"]).equal(
                ext["pred"], "x:turnParity")).num_rows == len(feats)
    finally:
        del extract.EXTRACTORS["turn_parity"]
    again = extract.structural_and_location_triples(feats)
    assert again.num_rows == base.num_rows
