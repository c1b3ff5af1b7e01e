"""Pipeline configuration: vocabulary, URI scheme, behavior flags.

Mirrors the reference's config surface (rkts.yaml:1-37 behavior flags, URL
templates rkts.yaml:2-30, namespace registration migrate.php:70-77) as a frozen
dataclass shipped to workers inside stage constructors — no process globals.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# Predicate vocabulary (compact CURIE strings; analog of bdo:/bdr:/bda:
# namespaces registered at migrate.php:70-77).
# ---------------------------------------------------------------------------
P_TYPE = "rdf:type"
P_LABEL = "rdfs:label"
P_PART_OF = "tr:partOf"              # ≈ bdo:partOf (editionxmltottl.php:171)
P_ROOT = "tr:inRootInstance"         # ≈ bdo:inRootInstance
P_ROLE = "tr:role"
P_AT_TIME = "tr:atTimeUs"            # epoch-microsecond literal, xsd:long
P_TEXT_DIGEST = "tr:textDigest"      # sha256(text)[:12] — content-bearing, compact
P_TOOL = "tr:invokedTool"
P_MENTIONS = "tr:mentions"
P_IN_SECTION = "tr:inSection"
P_PART_INDEX = "tr:partIndex"        # ≈ bdo:partIndex (editionxmltottl.php:192-195)
P_TREE_INDEX = "tr:partTreeIndex"    # ≈ bdo:partTreeIndex ("02.0007")
P_HAS_TITLE = "tr:hasTitle"
P_SECTION_NAME = "tr:sectionName"
P_BEGIN_LOC = "tr:sectionBeginLoc"   # ≈ section begin location (utils.php:447-466)
P_END_LOC = "tr:sectionEndLoc"       # ≈ end patched from last item (utils.php:472-487)
P_SECTION_VOLS = "tr:sectionVolumes" # ≈ volumeMap ordered-distinct (editionxmltottl.php:360-376)
P_TURN_COUNT = "tr:turnCount"
P_IS_ABOUT = "tr:workIsAbout"        # ≈ 'ab' rows of rkts-actors.csv (utils.php:852-870)
P_GENRE = "tr:workGenre"             # ≈ 'ge' rows

P_CONTENT_LOC = "tr:contentLocation"   # ≈ bdo:contentLocation (utils.php:412-526)
P_LOC_SECTION = "tr:locSection"
P_LOC_VOLNAME = "tr:locVolname"
P_LOC_END_VOLNAME = "tr:locEndVolname"
P_LOC_VOLNUM = "tr:locVolnum"
P_LOC_END_VOLNUM = "tr:locEndVolnum"
P_LOC_PAGENUM = "tr:locPagenum"
P_LOC_END_PAGENUM = "tr:locEndPagenum"
P_LOC_LINENUM = "tr:locLinenum"
P_LOC_END_LINENUM = "tr:locEndLinenum"
P_LOC_PAGESIDE = "tr:locPageside"
P_LOC_END_PAGESIDE = "tr:locEndPageside"

P_HAS_PART = "tr:hasPart"            # ≈ bdo:hasPart (editionxmltottl.php:235)
P_SEE_ALSO = "rdfs:seeAlso"          # ≈ rdfs:seeAlso (editionxmltottl.php:395-399)
P_SCRIPT = "tr:script"               # ≈ bdo:script (editionxmltottl.php:392)
P_PRINT_METHOD = "tr:printMethod"    # ≈ bdo:printMethod (editionxmltottl.php:393)
P_PARALLELS = "tr:workHasParallelsIn"  # ≈ bdo:workHasParallelsIn (kernelxmltottl.php:116,140)
P_LANGUAGE = "tr:language"           # ≈ bdo:language (kernelxmltottl.php:128)
P_IS_ROOT = "tr:isRoot"              # ≈ bdo:isRoot (kernelxmltottl.php:129)
P_PREF_LABEL = "skos:prefLabel"      # ≈ skos:prefLabel (kernelxmltottl.php:219)
P_ALT_LABEL = "skos:altLabel"        # ≈ skos:altLabel (kernelxmltottl.php:221-223)
P_IDENTIFIED_BY = "tr:identifiedBy"  # ≈ bf:identifiedBy (kernelxmltottl.php:157)
P_VALUE = "rdf:value"                # ≈ rdf:value (kernelxmltottl.php:158)
OBJ_LANG_INC = "tr:LangInc"          # ≈ bdr:LangInc (kernelxmltottl.php:128)

T_CONV = "tr:Conversation"
T_WORK = "tr:Work"                   # ≈ bdo:Work (kernelxmltottl.php:127 abstract node)
T_INSTANCE = "tr:Instance"           # ≈ bdo:Instance (editionxmltottl.php:388)
T_TURN = "tr:Turn"
T_SECTION = "tr:Section"
T_CHAPTER = "tr:Chapter"             # ≈ bdr:PartTypeChapter (editionxmltottl.php:230)
T_ENTITY = "tr:Entity"
T_CONTENT_LOCATION = "tr:ContentLocation"

DT_LONG = "xsd:long"
DT_INT = "xsd:integer"
DT_BOOL = "xsd:boolean"              # ≈ addLiteral('bdo:isRoot', true) (kernelxmltottl.php:129)

# marker-key → BCP-47 tag; analog of $name_to_bcp (utils.php:758-775)
NAME_TO_BCP: dict[str, str] = {
    "tib": "bo-x-ewts",
    "col": "bo-x-ewts",       # ≈ coltitle
    "skt": "sa-x-iast",
    "sktuni": "sa-Deva",
    "mng": "cmg-x-poppe",
    "mngs": "cmg-x-poppe-simpl",
    "zh": "zh-Hant",
    "en": "en",
}

# language tags dropped for the bdrc target (normalize_lit, utils.php:812-813)
DROPPED_LANGS_BDRC = frozenset({"cmg-x-poppe-simpl", "sa-Deva"})

# placeholder ids nulled out by the reference (editionxmltottl.php:33-34)
PLACEHOLDER_IDS = frozenset({"-", "?", "new", "new?"})

# quarantine rule names (error channel, report_error utils.php:558-560)
RULE_INVALID_LOC = "invalid_loc"
RULE_INVALID_VOLNAME = "invalid_volname"
RULE_SELF_LOOP = "prop_self_loop"
# get_chap_loc/get_bampo_loc no-match (utils.php:713-716 / 730-733; the two
# reference rules collapse to one here because chap and bampo markers share
# the grammar and the engine's marker IS the call site)
RULE_INVALID_CHAP_LOC = "invalid_chap_loc"

TRIPLE_COLUMNS = ["subj", "pred", "obj", "obj_lang", "obj_dt", "graph"]
QUARANTINE_COLUMNS = ["subj", "rule", "detail"]

GRAPH_ENTITIES = "G:entities"


@dataclass(frozen=True)
class PipelineConfig:
    """Behavior flags ≈ rkts.yaml:1,31-37 (useAbstract, oneTitleInExpression…)."""

    target: str = "bdrc"              # 'bdrc' applies lang policy + shad (utils.php:804-818)
    one_title_per_lang: bool = False  # ≈ oneTitleInExpression (kernelxmltottl.php:205)
    # ≈ migrateChapters (rkts.yaml:34; editionxmltottl.php:220 `break`s out of
    # the chapter loop): False suppresses the chapter hierarchy level (type /
    # partOf / partIndex / treeIndex / label / hasPart chapter triples) in the
    # conv windows. The chl{} chapter-location PARSE (kg_chap_locations) stays
    # available standalone — in the reference the parse helpers exist
    # independent of the flag too (utils.php:707-746).
    migrate_chapters: bool = True
    # ≈ useAbstract (rkts.yaml:1, consumed kernelxmltottl.php:114-144): for the
    # bdrc target every curated entity (the catalogue-expression analog) also
    # emits an abstract tr:Work node linked both ways via workHasParallelsIn,
    # typed LangInc and isRoot=true. Minted (gazetteer-miss) entities have no
    # catalogue id, hence no abstract — the analog of the reference only
    # abstracting catalogued kernel items.
    use_abstract: bool = True
    # ≈ useSkosLabels (rkts.yaml:35 — declared but UNREAD by any PHP consumer;
    # the engine gives it the natural semantics of the skos label family the
    # kernel pass uses at kernelxmltottl.php:219-223): when True, minted-entity
    # labels emit skos:prefLabel instead of rdfs:label.
    use_skos_labels: bool = False
    # ≈ catalogueNumberingScheme (rkts.yaml:36, "rKTs"; the hard-coded scheme
    # inside the identifier-node type 'bdr:RefrKTs'.$edition at
    # kernelxmltottl.php:159): names the rdf:type of each curated entity's
    # identifier node, tr:Ref<scheme>.
    catalogue_numbering_scheme: str = "rKTs"
    emit_text_digest: bool = True
    n_subj_buckets: int = 64          # output partitions (≈ md5-prefix sharding migrate-bvm.py:412-418)
    salt: int = 16                    # head-entity salting fanout for canonical merge
    # reproduction instances (editions_to_ttl, editionxmltottl.php:408-416):
    # for the bdrc target each root instance fans out one tr:Instance node per
    # reproduction id (≈ confinfo['RID']), carrying script/printMethod from
    # config (≈ confinfo['script']/['printType'], :392-393) and rdfs:seeAlso
    # back to the canonical (non-bdrc) resource (:395); the non-bdrc target
    # instead emits one rdfs:seeAlso per RID from the canonical resource
    # (:397-399)
    reproductions: tuple[str, ...] = ("W001", "W002")
    script: str = "ScriptLatn"        # ≈ confinfo['script']
    print_method: str = "PrintMethod_Modern"  # ≈ confinfo['printType']


DEFAULT_CONFIG = PipelineConfig()
