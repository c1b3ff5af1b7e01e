"""Behavior-flag goldens (PipelineConfig ≈ rkts.yaml:1,31-37).

One flag-flipped golden per remaining flag (round-2 verdict item 5):
- use_abstract   ≈ useAbstract (rkts.yaml:1, kernelxmltottl.php:114-144)
- use_skos_labels ≈ useSkosLabels (rkts.yaml:35; label family of
  kernelxmltottl.php:219-223)
- catalogue_numbering_scheme ≈ the scheme in 'bdr:RefrKTs'.$edition
  (rkts.yaml:36, kernelxmltottl.php:159)

The emitter is driven directly with an in-memory distinct-entity batch (the
post-canonicalization stream shape), so these run without a Ray session.
"""

import hashlib

import pyarrow as pa

from rkts_migration_ray.config import DEFAULT_CONFIG, PipelineConfig
from rkts_migration_ray.stages.linking import EntityEmitter

PROPS = {"E1": [("ab", "E9"), ("ge", "E1")]}  # one edge + one self-loop


def emit(cfg: PipelineConfig = DEFAULT_CONFIG):
    batch = pa.table({
        "entity_uri": ["ENT:E1", "N:ENABCDEF_foo"],
        "curated": [True, False],
        "final_id": ["E1", None],
        "alias": [None, "foo"],
    })
    return EntityEmitter(props=PROPS, cfg=cfg)(batch).to_pandas()


def test_use_abstract_default_emits_work_node():
    """Default (rkts.yaml:1 useAbstract: true): curated entity fans out the
    abstract tr:Work node with both parallels directions + LangInc + isRoot."""
    df = emit()
    ab = df[df["subj"] == "ABS:E1"]
    assert set(zip(ab["pred"], ab["obj"])) == {
        ("rdf:type", "tr:Work"),
        ("tr:language", "tr:LangInc"),
        ("tr:isRoot", "true"),
        ("tr:workHasParallelsIn", "ENT:E1"),
    }
    assert (ab.loc[ab["pred"] == "tr:isRoot", "obj_dt"] == "xsd:boolean").all()
    fwd = df[(df["subj"] == "ENT:E1") & (df["pred"] == "tr:workHasParallelsIn")]
    assert list(fwd["obj"]) == ["ABS:E1"]
    # minted entities never abstract (no catalogue id)
    assert not df["subj"].str.startswith("ABS:").sum() > 4


def test_use_abstract_off_drops_abstract_family():
    df = emit(PipelineConfig(use_abstract=False))
    assert not df["subj"].str.startswith("ABS:").any()
    assert not (df["obj"].str.startswith("ABS:")).any()


def test_use_abstract_is_bdrc_only():
    """kernelxmltottl.php:114 guards on $bdrc && useAbstract."""
    df = emit(PipelineConfig(target="rkts", use_abstract=True))
    assert not df["subj"].str.startswith("ABS:").any()


def test_identifier_node_golden_and_scheme():
    """Identifier family (kernelxmltottl.php:154-159): minted id node URI is
    the bnode_url-shaped content hash; rdf:type carries the scheme."""
    sha6 = hashlib.sha256(b"E1").hexdigest()[:6].upper()
    id_uri = f"N:ID{sha6}_E1"
    df = emit()
    idn = df[df["subj"] == id_uri]
    assert set(zip(idn["pred"], idn["obj"])) == {
        ("rdf:value", "E1"), ("rdf:type", "tr:RefrKTs")}
    link = df[(df["pred"] == "tr:identifiedBy")]
    assert list(zip(link["subj"], link["obj"])) == [("ENT:E1", id_uri)]
    # flag-flipped: a different catalogue numbering scheme renames the type
    df2 = emit(PipelineConfig(catalogue_numbering_scheme="Derge"))
    assert (df2.loc[df2["pred"] == "rdf:type", "obj"]
            .isin(["tr:Entity", "tr:Work", "tr:RefDerge"])).all()
    assert (df2["obj"] == "tr:RefDerge").any()


def test_use_skos_labels_switches_label_predicate():
    base = emit()
    assert (base.loc[base["subj"] == "N:ENABCDEF_foo", "pred"]
            .isin(["rdf:type", "rdfs:label"])).all()
    flipped = emit(PipelineConfig(use_skos_labels=True))
    lab = flipped[flipped["obj"] == "foo"]
    assert list(lab["pred"]) == ["skos:prefLabel"]
    assert not (flipped["pred"] == "rdfs:label").any()


def test_props_edges_unaffected_by_flags():
    """Enrichment + self-loop quarantine (kernelxmltottl.php:36-47) are
    orthogonal to the flag families."""
    for cfg in (DEFAULT_CONFIG, PipelineConfig(use_abstract=False,
                                               use_skos_labels=True)):
        df = emit(cfg)
        assert list(df.loc[df["pred"] == "tr:workIsAbout", "obj"]) == ["ENT:E9"]
        q = df[df["graph"] == "G:quarantine"]
        assert list(q["pred"]) == ["q:prop_self_loop"]


def test_migrate_chapters_off_drops_chapter_level():
    """≈ migrateChapters=false (rkts.yaml:34): editionxmltottl.php:220 breaks
    out of the chapter loop, so the whole chapter hierarchy level disappears
    while every other window triple is unchanged."""
    from rkts_migration_ray.config import T_CHAPTER
    from rkts_migration_ray.stages import extract
    from rkts_migration_ray.stages.convgroup import (
        CONV_GROUP_COLUMNS,
        conv_group_triples,
    )

    b = pa.table({
        "conv_id": pa.array(["c0"], pa.string()),
        "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array(["user"], pa.string()),
        "text": pa.array(["sec{mdo sde} chap{1. nga ro} chap{rgyud pa}"],
                         pa.string()),
        "tool": pa.array([""], pa.string()),
        "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
    })
    df = extract.extract_features(b).select(CONV_GROUP_COLUMNS).to_pandas()
    on = conv_group_triples(df)
    off = conv_group_triples(df, migrate_chapters=False)
    assert (on["obj"] == T_CHAPTER).sum() == 2
    assert not (off["obj"] == T_CHAPTER).any()
    assert not off["subj"].str.startswith("N:CH").any()
    keep = on[~(on["subj"].str.startswith("N:CH")
                | on["obj"].str.startswith("N:CH"))].reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(keep, off.reset_index(drop=True))
