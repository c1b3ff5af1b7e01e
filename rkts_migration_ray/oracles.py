"""DuckDB oracle SQL — the ANSI-SQL twin of every KG pipeline.

Each engine query in __ray_entry__.queries() has a matching SQL string built
here; the driver runs both at sf=0.01 and compares row-count + schema +
order-insensitive value hash. Column names and value formats are kept
IDENTICAL to the Ray pipelines (zero-padding, sha256 minting, shad rules,
language policy), so the SQL doubles as an executable specification of the
reference semantics (SURVEY.md §5 oracle plan).

All queries share one WITH-block over the deterministic fixture parquet files
(fixtures.py); unused CTEs are pruned by DuckDB.
"""

from __future__ import annotations

from . import fixtures
from .stages.creators import TAG_TO_EVENT_ROLE
from .functions.locations import (
    ALLOWED_VOL_LETTERS,
    PATTERN_BAMPO_CHAP,
    PATTERN_CHAP_SIMPLE,
    PATTERN_LOC,
    PATTERN_LOC_SIMPLE,
    PATTERN_SMALL_LOC,
)

# RE2 patterns are shared verbatim with the engine; DuckDB standard strings
# don't process backslashes, so embedding them is safe (no single quotes used).
LP = PATTERN_LOC
SP = PATTERN_LOC_SIMPLE
PL = PATTERN_SMALL_LOC
BC = PATTERN_BAMPO_CHAP
CS = PATTERN_CHAP_SIMPLE

ALLOWED_SQL = "(" + ", ".join(
    "'" + v.replace("'", "''") + "'" for v in sorted(ALLOWED_VOL_LETTERS)) + ")"

# creator role/event CASEs generated from the shared table so the SQL can
# never drift from the engine (editionxmltottl.php:5-19)
CR_TAGS_SQL = "(" + ", ".join(f"'{t}'" for t in TAG_TO_EVENT_ROLE) + ")"
CR_ORD_SQL = ("CASE tag " + " ".join(
    f"WHEN '{t}' THEN {i}" for i, t in enumerate(TAG_TO_EVENT_ROLE)) + " END")
CR_ROLE_SQL = ("CASE tag " + " ".join(
    f"WHEN '{t}' THEN '{r}'" for t, (r, _) in TAG_TO_EVENT_ROLE.items()) + " END")
CR_EVENT_SQL = ("CASE tag " + " ".join(
    f"WHEN '{t}' THEN '{ev}'" for t, (_, ev) in TAG_TO_EVENT_ROLE.items()) + " END")

BCP_CASE = (
    "CASE k WHEN 'tib' THEN 'bo-x-ewts' WHEN 'col' THEN 'bo-x-ewts' "
    "WHEN 'skt' THEN 'sa-x-iast' WHEN 'sktuni' THEN 'sa-Deva' "
    "WHEN 'mng' THEN 'cmg-x-poppe' WHEN 'mngs' THEN 'cmg-x-poppe-simpl' "
    "WHEN 'zh' THEN 'zh-Hant' WHEN 'en' THEN 'en' END"
)


def shad_sql(t: str) -> str:
    """SQL CASE mirror of add_shad (utils.php:777-793 semantics)."""
    last = (f"CASE WHEN substr({t}, length({t}), 1) IN ('a','i','e','o') "
            f"THEN substr({t}, length({t})-1, 1) ELSE substr({t}, length({t}), 1) END")
    return f"""CASE WHEN length({t}) < 2 THEN {t}
 WHEN length({t}) > 2 AND {last} = 'g' AND substr({t}, length({t})-2, 1) = 'n' THEN {t} || ' /'
 WHEN {last} IN ('g','k')
      OR (length({t}) = 3 AND {last} = 'h' AND substr({t}, length({t})-2, 1) = 's')
      OR (length({t}) > 3 AND {last} = 'h' AND substr({t}, length({t})-2, 1) = 's'
          AND substr({t}, length({t})-3, 1) <> 't') THEN {t}
 WHEN {last} < 'A' OR {last} > 'z' OR ({last} > 'Z' AND {last} < 'a') THEN {t}
 ELSE {t} || '/' END"""


def with_block(sf_dir_or_tag: str) -> str:
    tr = fixtures.transcripts_glob(sf_dir_or_tag)
    gaz = fixtures.aux_path(sf_dir_or_tag, "gazetteer")
    am = fixtures.aux_path(sf_dir_or_tag, "alias_map")
    props = fixtures.aux_path(sf_dir_or_tag, "entity_props")
    label_expr = f"CASE WHEN bcp LIKE '%ewts' THEN {shad_sql('title')} ELSE title END"
    shad_stripped = shad_sql("stripped")
    shad_name = shad_sql("name")
    return f"""WITH RECURSIVE
t AS (SELECT conv_id, turn_idx, role, text, tool, ts FROM read_parquet('{tr}')),
u AS (SELECT 'U:'||conv_id||'/'||lpad(CAST(turn_idx AS VARCHAR),5,'0') AS turn,
             'C:'||conv_id AS conv, 'G:'||conv_id AS g, * FROM t),
w0 AS (SELECT conv_id, turn_idx, text,
        'U:'||conv_id||'/'||lpad(CAST(turn_idx AS VARCHAR),5,'0') AS turn,
        'G:'||conv_id AS g,
        NULLIF(regexp_extract(text,'sec\\{{([^}}]*)\\}}',1),'') AS secm,
        NULLIF(regexp_extract(text,'loc\\{{([^}}]*)\\}}',1),'') AS fb,
        NULLIF(regexp_extract(text,'locs\\{{([^}}]*)\\}}',1),'') AS sb
       FROM t),
w1 AS (SELECT *,
        count(secm) OVER win AS sec_ord,
        last_value(secm IGNORE NULLS) OVER win AS sec_name,
        CASE WHEN fb IS NOT NULL THEN 'full'
             WHEN sb IS NOT NULL THEN 'simple' END AS kind,
        COALESCE(fb, sb) AS loc_body,
        CASE WHEN fb IS NOT NULL THEN regexp_matches(fb, '{LP}')
             WHEN sb IS NOT NULL THEN regexp_matches(sb, '{SP}')
             ELSE FALSE END AS loc_valid,
        CASE WHEN fb IS NOT NULL AND regexp_matches(fb, '{LP}')
             THEN regexp_extract(fb, '{LP}',
                  ['section','bvolname','bpageline','evolname','epageline','bvolnum','evolnum'])
        END AS fs,
        CASE WHEN sb IS NOT NULL AND regexp_matches(sb, '{SP}')
             THEN regexp_extract(sb, '{SP}', ['bvolnum','bpagenum','evolnum','epagenum'])
        END AS ss
       FROM w0
       WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
w2 AS (SELECT *,
        row_number() OVER (PARTITION BY conv_id, sec_ord ORDER BY turn_idx) AS pos,
        NULLIF(fs['bvolname'],'') AS bvolname,
        NULLIF(fs['evolname'],'') AS evolname,
        CASE WHEN kind='full' THEN regexp_extract(COALESCE(fs['bpageline'],''), '{PL}',
             ['pagenum','side','linenum']) END AS bp,
        CASE WHEN kind='full' THEN regexp_extract(COALESCE(fs['epageline'],''), '{PL}',
             ['pagenum','side','linenum']) END AS ep
       FROM w1),
w3 AS (SELECT *,
        CASE WHEN loc_valid AND kind='full' THEN
          CASE WHEN bvolname IS NOT NULL AND bvolname NOT IN {ALLOWED_SQL} THEN bvolname
               WHEN evolname IS NOT NULL AND evolname NOT IN {ALLOWED_SQL} THEN evolname
          END END AS badvol
       FROM w2),
convs AS (SELECT conv_id, count(*) AS n FROM t GROUP BY conv_id),
secs AS (SELECT conv_id, sec_ord, min(sec_name) AS name,
          arg_min(loc_body, turn_idx) FILTER (WHERE loc_valid AND loc_body IS NOT NULL) AS begin_loc,
          arg_max(loc_body, turn_idx) FILTER (WHERE loc_valid AND loc_body IS NOT NULL) AS end_loc
         FROM w2 WHERE sec_ord > 0 GROUP BY conv_id, sec_ord),
svols0 AS (SELECT conv_id, sec_ord, bvolname, min(turn_idx) AS ft FROM w2
           WHERE sec_ord > 0 AND bvolname IS NOT NULL
           GROUP BY conv_id, sec_ord, bvolname),
svols AS (SELECT conv_id, sec_ord, string_agg(bvolname, ' ' ORDER BY ft) AS vols
          FROM svols0 GROUP BY conv_id, sec_ord),
secu AS (SELECT s.conv_id, s.sec_ord, s.name, s.begin_loc, s.end_loc, v.vols,
          'N:SE'||upper(substr(sha256(s.conv_id||s.name),1,6))||'_'||s.conv_id AS sec_uri
         FROM secs s LEFT JOIN svols v ON s.conv_id=v.conv_id AND s.sec_ord=v.sec_ord),
tt0 AS (SELECT conv_id, turn_idx, um.m AS m FROM w0,
        unnest(regexp_extract_all(text, 'ttl\\[\\w+\\]\\{{[^}}]*\\}}')) AS um(m)),
tt1 AS (SELECT conv_id, turn_idx,
         regexp_extract(m, 'ttl\\[(\\w+)\\]', 1) AS k,
         regexp_extract(m, '\\{{([^}}]*)\\}}', 1) AS title FROM tt0),
tt2 AS (SELECT conv_id, turn_idx, title, {BCP_CASE} AS bcp FROM tt1),
tt3 AS (SELECT conv_id, turn_idx, bcp, title,
         replace(replace(lower(title),'-',''),' ','') AS key FROM tt2
        WHERE bcp IS NOT NULL AND bcp NOT IN ('sa-Deva','cmg-x-poppe-simpl')),
tt4 AS (SELECT *, {label_expr} AS label FROM tt3),
tt5 AS (SELECT *, row_number() OVER (PARTITION BY conv_id, bcp, key ORDER BY turn_idx) AS rn
        FROM tt4),
ttf AS (SELECT conv_id, bcp, label,
         'N:TT'||upper(substr(sha256(conv_id||bcp||'|'||label),1,6))||'_'||conv_id AS t_uri
        FROM tt5 WHERE rn = 1),
ments AS (SELECT DISTINCT conv_id, turn_idx, ua.a AS alias FROM t,
          unnest(regexp_extract_all(text, '@\\[([^\\]]*)\\]', 1)) AS ua(a)
          WHERE ua.a NOT IN ('-','?','new','new?')),
gaz AS (SELECT alias, canonical_id FROM read_parquet('{gaz}')
        WHERE canonical_id NOT LIKE '%?%'),
am AS (SELECT from_id, to_id FROM read_parquet('{am}')),
closure AS (
  SELECT from_id, to_id FROM am
  UNION ALL SELECT c.from_id, a.to_id FROM closure c JOIN am a ON c.to_id = a.from_id),
closure_f AS (SELECT from_id, to_id FROM closure
              WHERE to_id NOT IN (SELECT from_id FROM am)),
linked AS (SELECT m.conv_id, m.turn_idx, m.alias,
            g.alias IS NOT NULL AS curated,
            CASE WHEN g.alias IS NOT NULL THEN COALESCE(c.to_id, g.canonical_id) END AS final_id,
            CASE WHEN g.alias IS NULL
                 THEN 'N:EN'||upper(substr(sha256(m.alias),1,6))||'_'||m.alias
                 ELSE 'ENT:'||COALESCE(c.to_id, g.canonical_id) END AS entity_uri
           FROM ments m
           LEFT JOIN gaz g ON m.alias = g.alias
           LEFT JOIN closure_f c ON g.canonical_id = c.from_id),
ents AS (SELECT DISTINCT entity_uri, curated, final_id,
          CASE WHEN NOT curated THEN alias END AS alias FROM linked),
props AS (SELECT entity_id, prop, object_id FROM read_parquet('{props}')),
chl AS (SELECT conv_id, turn_idx,
         regexp_extract_all(text, 'chap\\{{([^}}]*)\\}}', 1) AS l FROM t),
ch1 AS (SELECT conv_id, turn_idx,
         row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY i) AS cidx,
         raw
        FROM (SELECT conv_id, turn_idx, i, l[i] AS raw
              FROM (SELECT conv_id, turn_idx, l,
                     unnest(generate_series(1, len(l))) AS i
                    FROM chl WHERE len(l) > 0))
        WHERE raw <> ''),
ch2 AS (SELECT conv_id, turn_idx, cidx,
         CASE WHEN strpos(raw, '. ') = 0 THEN substr(raw, 3)
              WHEN strpos(raw, '. ') < 6 THEN substr(raw, strpos(raw, '. ') + 2)
              ELSE raw END AS stripped
        FROM ch1),
ch3 AS (SELECT conv_id, turn_idx, cidx, {shad_stripped} AS label FROM ch2),
chu AS (SELECT c.conv_id, c.cidx, c.label, w.turn, w.g,
         lpad(CAST(w.sec_ord AS VARCHAR),2,'0')||'.'
           ||lpad(CAST(w.pos AS VARCHAR),4,'0')||'.'
           ||lpad(CAST(c.cidx AS VARCHAR),2,'0') AS ctree
        FROM ch3 c JOIN w2 w
          ON w.conv_id = c.conv_id AND w.turn_idx = c.turn_idx),
chf AS (SELECT *, 'N:CH'||upper(substr(sha256(conv_id||ctree||'|'||label),1,6))
          ||'_'||conv_id AS curi FROM chu),
-- chapter-location markers (bampo/chap dialect utils.php:707-746; chl{{}} =
-- standard grammar, chls{{}} = chemdo simple dialect with whitelist skip)
cl0 AS (SELECT conv_id, turn_idx,
         'U:'||conv_id||'/'||lpad(CAST(turn_idx AS VARCHAR),5,'0') AS turn,
         regexp_extract_all(text, 'chl\\{{([^}}]*)\\}}', 1) AS bl,
         regexp_extract_all(text, 'chls\\{{([^}}]*)\\}}', 1) AS sl
        FROM t),
clb AS (SELECT conv_id, turn_idx, turn, i AS cidx, bl[i] AS body
        FROM (SELECT *, unnest(generate_series(1, len(bl))) AS i
              FROM cl0 WHERE len(bl) > 0)),
clsm AS (SELECT conv_id, turn_idx, turn, i AS cidx, sl[i] AS body
         FROM (SELECT *, unnest(generate_series(1, len(sl))) AS i
               FROM cl0 WHERE len(sl) > 0)),
clb1 AS (SELECT *, regexp_matches(body, '{BC}') AS valid,
          CASE WHEN regexp_matches(body, '{BC}')
               THEN regexp_extract(body, '{BC}',
                    ['bvolname','bpageline','evolname','epageline']) END AS cs
         FROM clb),
clb2 AS (SELECT *, NULLIF(cs['bvolname'],'') AS bvolname,
          NULLIF(cs['evolname'],'') AS evolname,
          regexp_extract(COALESCE(cs['bpageline'],''), '{PL}',
                         ['pagenum','side','linenum']) AS bp,
          regexp_extract(COALESCE(cs['epageline'],''), '{PL}',
                         ['pagenum','side','linenum']) AS ep
         FROM clb1),
cl3 AS (
  SELECT conv_id, turn_idx, turn, cidx, 'chap' AS kind, body, valid,
    CASE WHEN bvolname IS NOT NULL AND bvolname NOT IN {ALLOWED_SQL}
         THEN bvolname END AS badvol,
    bvolname, evolname,
    TRY_CAST(NULLIF(bp['pagenum'],'') AS BIGINT) AS bpagenum,
    NULLIF(bp['side'],'') AS bpageside,
    TRY_CAST(NULLIF(bp['linenum'],'') AS BIGINT) AS blinenum,
    TRY_CAST(NULLIF(ep['pagenum'],'') AS BIGINT) AS epagenum,
    NULLIF(ep['side'],'') AS epageside,
    TRY_CAST(NULLIF(ep['linenum'],'') AS BIGINT) AS elinenum
  FROM clb2
  UNION ALL
  SELECT conv_id, turn_idx, turn, cidx, 'chap_simple', body,
    regexp_matches(body, '{CS}') AS valid,
    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
    TRY_CAST(NULLIF(regexp_extract(body, '{CS}',
             ['bpagenum','epagenum'])['bpagenum'],'') AS BIGINT),
    CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
    TRY_CAST(NULLIF(regexp_extract(body, '{CS}',
             ['bpagenum','epagenum'])['epagenum'],'') AS BIGINT),
    CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
  FROM clsm),
-- creator markers (tag_to_event_role, editionxmltottl.php:5-19, :118-142)
cr0 AS (SELECT conv_id, turn_idx, 'G:'||conv_id AS graph,
         conv_id||'/'||lpad(CAST(turn_idx AS VARCHAR),5,'0') AS loc_local,
         'U:'||conv_id||'/'||lpad(CAST(turn_idx AS VARCHAR),5,'0') AS turn,
         regexp_extract_all(text, 'cr\\[[\\w-]+\\]\\{{[^}}]*\\}}') AS ml
        FROM t),
cr1 AS (SELECT conv_id, turn_idx, graph, loc_local, turn, i,
         regexp_extract(ml[i], 'cr\\[([\\w-]+)\\]', 1) AS tag,
         regexp_extract(ml[i], '\\{{([^}}]*)\\}}', 1) AS name
        FROM (SELECT *, unnest(generate_series(1, len(ml))) AS i
              FROM cr0 WHERE len(ml) > 0)),
cr2 AS (SELECT *, {CR_ORD_SQL} AS tag_ord, {CR_ROLE_SQL} AS role,
         {CR_EVENT_SQL} AS event, {shad_name} AS label
        FROM cr1 WHERE tag IN {CR_TAGS_SQL}),
cr3 AS (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx, event
          ORDER BY tag_ord, i) AS crn FROM cr2),
crf AS (SELECT *,
         'N:AIR'||upper(substr(sha256(loc_local||event||label),1,6))
           ||'_'||loc_local AS air
        FROM cr3),
crev AS (SELECT conv_id, turn_idx, event,
          'N:EV'||upper(substr(sha256(loc_local||event||label),1,6))
            ||'_'||loc_local AS ev
         FROM crf WHERE crn = 1),
crj AS (SELECT f.*, v.ev FROM crf f JOIN crev v
         ON v.conv_id = f.conv_id AND v.turn_idx = f.turn_idx
        AND v.event = f.event)
"""


# ---------------------------------------------------------------------------
# per-family SELECT bodies (composable; no leading WITH)
# ---------------------------------------------------------------------------

SEL_STRUCTURAL = """
SELECT turn AS subj, 'rdf:type' AS pred, 'tr:Turn' AS obj, '' AS obj_lang, '' AS obj_dt, g AS graph FROM u
UNION ALL SELECT turn, 'tr:partOf', conv, '', '', g FROM u
UNION ALL SELECT turn, 'tr:inRootInstance', conv, '', '', g FROM u
UNION ALL SELECT turn, 'tr:role', role, '', '', g FROM u
UNION ALL SELECT turn, 'tr:atTimeUs', CAST(epoch_us(ts) AS VARCHAR), '', 'xsd:long', g FROM u
UNION ALL SELECT turn, 'tr:textDigest', substr(sha256(coalesce(text,'')),1,12), '', '', g FROM u
UNION ALL SELECT turn, 'tr:invokedTool', 'TOOL:'||tool, '', '', g FROM u WHERE tool <> ''"""

SEL_CONV = """
SELECT turn AS subj, 'tr:partIndex' AS pred, CAST(pos AS VARCHAR) AS obj,
       '' AS obj_lang, 'xsd:integer' AS obj_dt, g AS graph FROM w2
UNION ALL SELECT turn, 'tr:partTreeIndex',
       lpad(CAST(sec_ord AS VARCHAR),2,'0')||'.'||lpad(CAST(pos AS VARCHAR),4,'0'),
       '', '', g FROM w2
UNION ALL SELECT 'C:'||conv_id, 'rdf:type', 'tr:Conversation', '', '', 'G:'||conv_id FROM convs
UNION ALL SELECT 'C:'||conv_id, 'tr:turnCount', CAST(n AS VARCHAR), '', 'xsd:integer', 'G:'||conv_id FROM convs
UNION ALL SELECT sec_uri, 'rdf:type', 'tr:Section', '', '', 'G:'||conv_id FROM secu
UNION ALL SELECT sec_uri, 'tr:sectionName', name, '', '', 'G:'||conv_id FROM secu
UNION ALL SELECT sec_uri, 'tr:sectionBeginLoc', begin_loc, '', '', 'G:'||conv_id FROM secu WHERE begin_loc IS NOT NULL
UNION ALL SELECT sec_uri, 'tr:sectionEndLoc', end_loc, '', '', 'G:'||conv_id FROM secu WHERE end_loc IS NOT NULL
UNION ALL SELECT sec_uri, 'tr:sectionVolumes', vols, '', '', 'G:'||conv_id FROM secu WHERE vols IS NOT NULL
UNION ALL SELECT w2.turn, 'tr:inSection', s.sec_uri, '', '', w2.g
          FROM w2 JOIN secu s ON w2.conv_id = s.conv_id AND w2.sec_ord = s.sec_ord
UNION ALL SELECT 'C:'||conv_id, 'tr:hasTitle', t_uri, '', '', 'G:'||conv_id FROM ttf
UNION ALL SELECT t_uri, 'rdfs:label', label, bcp, '', 'G:'||conv_id FROM ttf
UNION ALL SELECT curi, 'rdf:type', 'tr:Chapter', '', '', g FROM chf
UNION ALL SELECT curi, 'tr:partOf', turn, '', '', g FROM chf
UNION ALL SELECT curi, 'tr:partIndex', CAST(cidx AS VARCHAR), '', 'xsd:integer', g FROM chf
UNION ALL SELECT curi, 'tr:partTreeIndex', ctree, '', '', g FROM chf
UNION ALL SELECT curi, 'rdfs:label', label, 'bo-x-ewts', '', g FROM chf
UNION ALL SELECT turn, 'tr:hasPart', curi, '', '', g FROM chf"""

SEL_MENTIONS = """
SELECT DISTINCT 'U:'||conv_id||'/'||lpad(CAST(turn_idx AS VARCHAR),5,'0') AS subj,
       'tr:mentions' AS pred, entity_uri AS obj, '' AS obj_lang, '' AS obj_dt,
       'G:'||conv_id AS graph
FROM linked"""

SEL_ENTITIES = """
SELECT entity_uri AS subj, 'rdf:type' AS pred, 'tr:Entity' AS obj,
       '' AS obj_lang, '' AS obj_dt, 'G:entities' AS graph FROM ents
UNION ALL SELECT entity_uri, 'rdfs:label', alias, '', '', 'G:entities'
          FROM ents WHERE NOT curated
UNION ALL SELECT e.entity_uri,
       CASE p.prop WHEN 'ab' THEN 'tr:workIsAbout' ELSE 'tr:workGenre' END,
       'ENT:'||p.object_id, '', '', 'G:entities'
       FROM ents e JOIN props p ON e.final_id = p.entity_id
       WHERE e.curated AND p.object_id <> p.entity_id
UNION ALL SELECT entity_uri, 'tr:workHasParallelsIn', 'ABS:'||final_id,
       '', '', 'G:entities' FROM ents WHERE curated
UNION ALL SELECT 'ABS:'||final_id, 'rdf:type', 'tr:Work', '', '', 'G:entities'
          FROM ents WHERE curated
UNION ALL SELECT 'ABS:'||final_id, 'tr:language', 'tr:LangInc', '', '',
       'G:entities' FROM ents WHERE curated
UNION ALL SELECT 'ABS:'||final_id, 'tr:isRoot', 'true', '', 'xsd:boolean',
       'G:entities' FROM ents WHERE curated
UNION ALL SELECT 'ABS:'||final_id, 'tr:workHasParallelsIn', entity_uri,
       '', '', 'G:entities' FROM ents WHERE curated
UNION ALL SELECT entity_uri, 'tr:identifiedBy',
       'N:ID'||upper(substr(sha256(final_id),1,6))||'_'||final_id,
       '', '', 'G:entities' FROM ents WHERE curated
UNION ALL SELECT 'N:ID'||upper(substr(sha256(final_id),1,6))||'_'||final_id,
       'rdf:value', final_id, '', '', 'G:entities' FROM ents WHERE curated
UNION ALL SELECT 'N:ID'||upper(substr(sha256(final_id),1,6))||'_'||final_id,
       'rdf:type', 'tr:RefrKTs', '', '', 'G:entities' FROM ents WHERE curated"""

SEL_QUARANTINE = """
SELECT turn AS subj, 'q:invalid_loc' AS pred, COALESCE(loc_body,'') AS obj,
       '' AS obj_lang, '' AS obj_dt, 'G:quarantine' AS graph
FROM w3 WHERE kind IS NOT NULL AND NOT loc_valid
UNION ALL SELECT turn, 'q:invalid_volname', badvol, '', '', 'G:quarantine'
          FROM w3 WHERE badvol IS NOT NULL
UNION ALL SELECT e.entity_uri, 'q:prop_self_loop', p.object_id, '', '', 'G:quarantine'
          FROM ents e JOIN props p ON e.final_id = p.entity_id
          WHERE e.curated AND p.object_id = p.entity_id
UNION ALL SELECT turn, 'q:invalid_chap_loc', body, '', '', 'G:quarantine'
          FROM cl3 WHERE NOT valid
UNION ALL SELECT turn, 'q:invalid_volname', badvol, '', '', 'G:quarantine'
          FROM cl3 WHERE badvol IS NOT NULL"""

SEL_CREATOR_EVENTS = """
SELECT DISTINCT subj, pred, obj, obj_lang, obj_dt, graph FROM (
SELECT ev AS subj, 'rdf:type' AS pred, event AS obj,
       '' AS obj_lang, '' AS obj_dt, graph FROM crj WHERE crn = 1
UNION ALL SELECT turn, 'tr:instanceEvent', ev, '', '', graph FROM crj WHERE crn = 1
UNION ALL SELECT air, 'rdf:type', 'tr:AgentAsCreator', '', '', graph FROM crj
UNION ALL SELECT air, 'tr:role', role, '', '', graph FROM crj
UNION ALL SELECT air, 'rdfs:label', label, 'bo-x-ewts', '', graph FROM crj
UNION ALL SELECT ev, 'tr:eventWho', air, '', '', graph FROM crj)"""

SEL_CHAP_LOCATIONS = """
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, CAST(cidx AS BIGINT) AS cidx,
       kind, body, valid, badvol,
       CAST(NULL AS VARCHAR) AS section, bvolname, evolname,
       CAST(NULL AS BIGINT) AS bvolnum, CAST(NULL AS BIGINT) AS evolnum,
       bpagenum, bpageside, blinenum, epagenum, epageside, elinenum
FROM cl3"""

_LT = """
lt AS (SELECT turn, g, conv_id, loc_body,
   'N:CL'||upper(substr(sha256(conv_id||loc_body),1,6))||'_'||conv_id AS cl,
   NULLIF(fs['section'],'') AS l_section, bvolname AS l_bvolname,
   evolname AS l_evolname,
   NULLIF(bp['side'],'') AS l_bpageside, NULLIF(ep['side'],'') AS l_epageside,
   CASE WHEN kind='full' THEN TRY_CAST(NULLIF(fs['bvolnum'],'') AS BIGINT)
        ELSE TRY_CAST(NULLIF(ss['bvolnum'],'') AS BIGINT) END AS l_bvolnum,
   CASE WHEN kind='full' THEN TRY_CAST(NULLIF(fs['evolnum'],'') AS BIGINT)
        ELSE TRY_CAST(NULLIF(ss['evolnum'],'') AS BIGINT) END AS l_evolnum,
   CASE WHEN kind='full' THEN TRY_CAST(NULLIF(bp['pagenum'],'') AS BIGINT)
        ELSE TRY_CAST(NULLIF(ss['bpagenum'],'') AS BIGINT) END AS l_bpagenum,
   CASE WHEN kind='full' THEN TRY_CAST(NULLIF(ep['pagenum'],'') AS BIGINT)
        ELSE TRY_CAST(NULLIF(ss['epagenum'],'') AS BIGINT) END AS l_epagenum,
   TRY_CAST(NULLIF(bp['linenum'],'') AS BIGINT) AS l_blinenum,
   TRY_CAST(NULLIF(ep['linenum'],'') AS BIGINT) AS l_elinenum
 FROM w3 WHERE kind IS NOT NULL AND loc_valid)"""

SEL_LOCNODES = """
SELECT cl AS subj, 'rdf:type' AS pred, 'tr:ContentLocation' AS obj,
       '' AS obj_lang, '' AS obj_dt, g AS graph FROM lt
UNION ALL SELECT turn, 'tr:contentLocation', cl, '', '', g FROM lt
UNION ALL SELECT cl, 'tr:locSection', l_section, '', '', g FROM lt WHERE l_section IS NOT NULL
UNION ALL SELECT cl, 'tr:locVolname', l_bvolname, '', '', g FROM lt WHERE l_bvolname IS NOT NULL
UNION ALL SELECT cl, 'tr:locEndVolname', l_evolname, '', '', g FROM lt WHERE l_evolname IS NOT NULL
UNION ALL SELECT cl, 'tr:locPageside', l_bpageside, '', '', g FROM lt WHERE l_bpageside IS NOT NULL
UNION ALL SELECT cl, 'tr:locEndPageside', l_epageside, '', '', g FROM lt WHERE l_epageside IS NOT NULL
UNION ALL SELECT cl, 'tr:locVolnum', CAST(l_bvolnum AS VARCHAR), '', 'xsd:integer', g FROM lt WHERE l_bvolnum IS NOT NULL
UNION ALL SELECT cl, 'tr:locEndVolnum', CAST(l_evolnum AS VARCHAR), '', 'xsd:integer', g FROM lt WHERE l_evolnum IS NOT NULL
UNION ALL SELECT cl, 'tr:locPagenum', CAST(l_bpagenum AS VARCHAR), '', 'xsd:integer', g FROM lt WHERE l_bpagenum IS NOT NULL
UNION ALL SELECT cl, 'tr:locEndPagenum', CAST(l_epagenum AS VARCHAR), '', 'xsd:integer', g FROM lt WHERE l_epagenum IS NOT NULL
UNION ALL SELECT cl, 'tr:locLinenum', CAST(l_blinenum AS VARCHAR), '', 'xsd:integer', g FROM lt WHERE l_blinenum IS NOT NULL
UNION ALL SELECT cl, 'tr:locEndLinenum', CAST(l_elinenum AS VARCHAR), '', 'xsd:integer', g FROM lt WHERE l_elinenum IS NOT NULL"""

SEL_LOCATIONS = """
SELECT conv_id, turn_idx, kind, loc_valid AS valid,
  NULLIF(fs['section'],'') AS section, bvolname, evolname,
  CASE WHEN kind='full' THEN TRY_CAST(NULLIF(fs['bvolnum'],'') AS BIGINT)
       ELSE TRY_CAST(NULLIF(ss['bvolnum'],'') AS BIGINT) END AS bvolnum,
  CASE WHEN kind='full' THEN TRY_CAST(NULLIF(fs['evolnum'],'') AS BIGINT)
       ELSE TRY_CAST(NULLIF(ss['evolnum'],'') AS BIGINT) END AS evolnum,
  CASE WHEN kind='full' THEN TRY_CAST(NULLIF(bp['pagenum'],'') AS BIGINT)
       ELSE TRY_CAST(NULLIF(ss['bpagenum'],'') AS BIGINT) END AS bpagenum,
  NULLIF(bp['side'],'') AS bpageside,
  TRY_CAST(NULLIF(bp['linenum'],'') AS BIGINT) AS blinenum,
  CASE WHEN kind='full' THEN TRY_CAST(NULLIF(ep['pagenum'],'') AS BIGINT)
       ELSE TRY_CAST(NULLIF(ss['epagenum'],'') AS BIGINT) END AS epagenum,
  NULLIF(ep['side'],'') AS epageside,
  TRY_CAST(NULLIF(ep['linenum'],'') AS BIGINT) AS elinenum
FROM w2 WHERE kind IS NOT NULL"""

SEL_ROLE_PIVOT = """
SELECT conv_id,
 CAST(count(*) FILTER (WHERE role = 'user') AS BIGINT) AS n_user,
 CAST(count(*) FILTER (WHERE role = 'assistant') AS BIGINT) AS n_assistant,
 CAST(count(*) FILTER (WHERE role = 'tool') AS BIGINT) AS n_tool,
 CAST(count(*) FILTER (WHERE role = 'system') AS BIGINT) AS n_system,
 CAST(count(*) AS BIGINT) AS n_total
FROM t GROUP BY conv_id"""

SEL_VALIDATE = """
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(DISTINCT turn_idx) AS BIGINT) AS n_distinct,
       CAST(max(turn_idx) AS BIGINT) AS max_idx,
       (count(DISTINCT turn_idx) = count(*)
        AND max(turn_idx) = count(*) - 1 AND min(turn_idx) = 0) AS dense,
       bool_and(pts IS NULL OR ts > pts) AS ts_monotone
FROM (SELECT conv_id, turn_idx, ts,
             lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS pts FROM t)
GROUP BY conv_id"""


# ---------------------------------------------------------------------------
# documents / embeddings / relational oracles — these reference the driver's
# pre-registered views (documents, embeddings, lineitem, orders, customer,
# nation, events) by name, so they need no path interpolation.
# ---------------------------------------------------------------------------

_STOP_EN_SQL = "['the','a','of','and','to','in','is','on','for','with']"
_STOP_DE_SQL = "['der','die','das','und','ist','ein','nicht','mit']"
_STOP_FR_SQL = "['le','la','et','les','des','un','une','est']"


def _guess_lt_select() -> str:
    """SQL twin of functions/text.guess_lt (migrate-bvm.py:18-53), generated
    from the same NATIVERANGES constant so the two can never drift."""
    from .functions.text import IAST_DIACRITICS, NATIVERANGES

    arms = " ".join(f"WHEN u > {lo} AND u < {hi} THEN '{lt}'"
                    for (lo, hi), lt in NATIVERANGES)
    return f"""
SELECT doc_id, CASE
 WHEN text IS NULL OR text = '' THEN 'en'
 WHEN text LIKE '%/' THEN 'bo-x-ewts'
 WHEN regexp_matches(text, '[{IAST_DIACRITICS}]') THEN 'sa-x-iast'
 ELSE COALESCE(CASE {arms} END, 'en')
END AS lt_guess
FROM (SELECT doc_id, text, unicode(text) AS u FROM documents)"""


def mm_oracle_sql(media_path: str) -> dict[str, str]:
    """Byte-math oracles for the stubbed multimodal stages
    (stages/multimodal.py): the fixture header is MAGIC('GRFT') + u32 width +
    u32 height big-endian, so decode / grouped stats / resize are exactly
    SQL-checkable via hex-string arithmetic even with the codec stubbed;
    frame count/offsets derive from octet_length only."""
    decode_cte = f"""
h AS (SELECT media_id, kind, hex(payload) AS hx,
             CAST(octet_length(payload) AS BIGINT) AS n_bytes
      FROM read_parquet('{media_path}')),
d AS (SELECT media_id, kind, n_bytes,
 CASE WHEN n_bytes >= 12 AND substr(hx, 1, 8) = '47524654'
      THEN CAST(CAST(('0x' || substr(hx, 9, 8)) AS UBIGINT) AS BIGINT)
      ELSE -1 END AS width,
 CASE WHEN n_bytes >= 12 AND substr(hx, 1, 8) = '47524654'
      THEN CAST(CAST(('0x' || substr(hx, 17, 8)) AS UBIGINT) AS BIGINT)
      ELSE -1 END AS height
 FROM h)"""
    phash_cte = f"""
ph0 AS (SELECT media_id, kind, hex(payload) AS hx,
               CAST(octet_length(payload) AS BIGINT) AS n_bytes
        FROM read_parquet('{media_path}')),
ph1 AS (SELECT *, CASE WHEN n_bytes >= 12 AND substr(hx, 1, 8) = '47524654'
                       THEN 12 ELSE 0 END AS boff FROM ph0),
ph2 AS (SELECT *, n_bytes - boff AS blen FROM ph1),
phb AS (SELECT media_id, k,
   CASE WHEN blen <= 0 THEN 0
        WHEN CAST(('0x' || substr(hx,
               CAST(1 + 2 * (boff + ((k * 7) % blen)) AS BIGINT), 2))
             AS UBIGINT) >= 128 THEN 1 ELSE 0 END AS b
  FROM ph2, range(63) r(k)),
ph AS (SELECT media_id,
        CAST(SUM(b * (CAST(1 AS BIGINT) << CAST(k AS INT))) AS BIGINT)
          AS phash
       FROM phb GROUP BY 1)"""
    return {"mm_decode": f"""
WITH {decode_cte}
SELECT media_id, kind, width, height, n_bytes FROM d""",
            "mm_phash": f"""
WITH {phash_cte}
SELECT b.media_id, b.kind, ph.phash, printf('%016x', ph.phash) AS phash_hex
FROM ph2 b JOIN ph USING (media_id)""",
            "mm_phash_dups": f"""
WITH {phash_cte}
SELECT a.media_id AS media_a, b.media_id AS media_b,
 CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM ph a JOIN ph b ON a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3""",
            "mm_media_stats": f"""
WITH {decode_cte}
SELECT kind, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
 MIN(width) AS min_width, MAX(height) AS max_height,
 CAST(count(*) AS BIGINT) AS n_media
FROM d GROUP BY kind""",
            "mm_resize": f"""
WITH {decode_cte}
SELECT media_id, kind,
 CASE WHEN width <= 0 THEN CAST(-1 AS BIGINT)
      ELSE least(width, 128) END AS width,
 CASE WHEN width <= 0 THEN CAST(-1 AS BIGINT)
      ELSE greatest(1, CAST(floor(height * least(width, 128) / width + 0.5)
                            AS BIGINT)) END AS height
FROM d""",
            "mm_embed": f"""
WITH m AS (SELECT media_id, kind, md5(hex(payload)) AS dg
           FROM read_parquet('{media_path}')),
g AS (SELECT media_id, kind, dg, unnest(range(1, 9)) AS dim_idx FROM m)
SELECT media_id, kind, CAST(dim_idx AS BIGINT) AS dim_idx,
 CAST(('0x' || substr(dg, CAST(dim_idx*2 - 1 AS BIGINT), 2)) AS UBIGINT)
 / 256.0 AS value
FROM g""",
            "mm_frames": f"""
WITH m AS (SELECT media_id, octet_length(payload) AS len
           FROM read_parquet('{media_path}') WHERE kind = 'video'),
f AS (SELECT media_id, len,
       unnest(generate_series(0, greatest(len - 12, 0) // 256, 4)) AS fi
      FROM m)
SELECT media_id, CAST(fi AS BIGINT) AS frame_idx,
 CAST(12 + fi * 256 AS BIGINT) AS "offset",
 CAST(least(256, len - (12 + fi * 256)) AS BIGINT) AS n_bytes
FROM f""",
            # VAD stand-in: maximal runs of body bytes < 32, kept at ≥ 64
            # bytes — classic gaps-and-islands (pos − row_number() groups
            # consecutive silent positions); offsets are payload-absolute
            "mm_silence_segments": f"""
WITH am AS (SELECT media_id, hex(payload) AS hx,
                   CAST(octet_length(payload) AS BIGINT) AS len
            FROM read_parquet('{media_path}') WHERE kind = 'audio'),
ab AS (SELECT media_id, CAST(p AS BIGINT) AS pos,
        CASE WHEN CAST(('0x' || substr(hx, CAST(25 + 2 * p AS BIGINT), 2))
                  AS UBIGINT) < 32 THEN 1 ELSE 0 END AS sil
       FROM am, unnest(range(0, len - 12)) r(p)
       WHERE len > 12),
ai AS (SELECT media_id, pos,
        pos - row_number() OVER (PARTITION BY media_id ORDER BY pos) AS grp
       FROM ab WHERE sil = 1)
SELECT media_id, CAST(min(pos) + 12 AS BIGINT) AS start_off,
 CAST(max(pos) + 13 AS BIGINT) AS end_off,
 CAST(count(*) AS BIGINT) AS n_bytes
FROM ai GROUP BY media_id, grp HAVING count(*) >= 64""",
            # per-frame 63-bit hash (no MAGIC branch — frame slices carry no
            # header) → lag over frame_idx → hamming + cut flag at ≥ 16
            "mm_scene_cuts": f"""
WITH m AS (SELECT media_id, hex(payload) AS hx,
                  CAST(octet_length(payload) AS BIGINT) AS len
           FROM read_parquet('{media_path}') WHERE kind = 'video'),
f AS (SELECT media_id, hx, len,
       unnest(generate_series(0, greatest(len - 12, 0) // 256, 4)) AS fi
      FROM m),
g AS (SELECT media_id, hx, CAST(fi AS BIGINT) AS fi,
       CAST(12 + fi * 256 AS BIGINT) AS off,
       CAST(least(256, len - (12 + fi * 256)) AS BIGINT) AS blen
      FROM f),
pb AS (SELECT media_id, fi, k,
        CASE WHEN blen <= 0 THEN 0
             WHEN CAST(('0x' || substr(hx,
                    CAST(1 + 2 * (off + ((k * 7) % blen)) AS BIGINT), 2))
                  AS UBIGINT) >= 128 THEN 1 ELSE 0 END AS b
       FROM g, range(63) r(k)),
fp AS (SELECT media_id, fi,
        CAST(SUM(b * (CAST(1 AS BIGINT) << CAST(k AS INT))) AS BIGINT)
          AS ph
       FROM pb GROUP BY 1, 2),
pr AS (SELECT media_id, fi, ph,
        lag(fi) OVER (PARTITION BY media_id ORDER BY fi) AS pfi,
        lag(ph) OVER (PARTITION BY media_id ORDER BY fi) AS pph
       FROM fp)
SELECT media_id, pfi AS prev_frame_idx, fi AS frame_idx,
 CAST(bit_count(xor(ph, pph)) AS BIGINT) AS hamming,
 CAST(CASE WHEN bit_count(xor(ph, pph)) >= 16 THEN 1 ELSE 0 END AS BIGINT)
   AS is_cut
FROM pr WHERE pfi IS NOT NULL"""}


def _shingle_ctes() -> str:
    """CTEs replicating functions.text's shingle universe exactly: md5-based
    64-bit hashes (word_hash64 twin) of distinct 3-word shingles, ending in
    `shx(doc_id, hv)` — shared by the MinHash chain and the prefix-filter
    pairs oracle."""
    return """
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents),
shx AS (SELECT DISTINCT doc_id,
         ('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 16))::UBIGINT AS hv
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM tok WHERE len(t) >= 3))"""


def _minhash_ctes() -> str:
    """_shingle_ctes + the (a·x+b) mod 2³¹−1 MinHash signature CTEs, with
    the seeded permutation params inlined as literals."""
    from .functions.text import minhash_params

    a, b = minhash_params(64)
    prm = ",".join(f"({k},{int(a[k])},{int(b[k])})" for k in range(64))
    return _shingle_ctes() + f""",
prm(k, a, b) AS (VALUES {prm}),
sigl AS (SELECT s.doc_id, p.k,
          CAST(min((CAST(p.a AS UBIGINT) * (s.hv % 2147483647) + CAST(p.b AS UBIGINT))
                   % 2147483647) AS BIGINT) AS v
         FROM shx s CROSS JOIN prm p GROUP BY 1, 2)"""


def _minhash_pair_ctes() -> str:
    """_minhash_ctes + the banding/verify chain, ending in a CTE `p(doc_a,
    doc_b)` — the exact edge list of minhash_pairs_ds (threshold 0.2).
    Shared by the dedup_minhash_pairs oracle and the clusters/survivors
    recursive-CC oracles (which consume the MinHash pair stream, the
    production default since round 3)."""
    return _minhash_ctes() + """,
cand AS (SELECT DISTINCT doc_a, doc_b FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sigl a JOIN sigl b ON a.k = b.k AND a.v = b.v AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.k // 4
  HAVING count(*) = 4)),
nsh AS (SELECT doc_id, count(*) AS n FROM shx GROUP BY 1),
inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
          FROM cand c JOIN shx a ON a.doc_id = c.doc_a
                      JOIN shx b ON b.doc_id = c.doc_b AND b.hv = a.hv
          GROUP BY 1, 2),
p AS (SELECT i.doc_a, i.doc_b
      FROM inter i JOIN nsh na ON na.doc_id = i.doc_a
                   JOIN nsh nb ON nb.doc_id = i.doc_b
      WHERE round(CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i), 6) >= 0.2)"""


def _bpe_tokens_select() -> str:
    """text_bpe_tokens oracle: the BPE-ish pre-tokenizer grammar shared with
    pipelines.docs.BPE_SPLIT_RE (apostrophes doubled for the SQL literal);
    whitespace runs are the pieces matching ^\\s+$ exactly."""
    from .pipelines.docs import BPE_SPLIT_RE

    pat = BPE_SPLIT_RE.replace("'", "''").replace("\\", "\\\\")
    return f"""
WITH m AS (SELECT doc_id, regexp_extract_all(lower(text), '{pat}') AS pieces
           FROM documents)
SELECT doc_id,
 CAST(len(pieces) - len(list_filter(pieces, x -> regexp_matches(x, '^\\s+$')))
      AS BIGINT) AS n_bpe,
 CAST(len(list_filter(pieces, x -> regexp_matches(x, '^\\s+$'))) AS BIGINT) AS n_ws
FROM m"""


def doc_rel_oracle_sql() -> dict[str, str]:
    sqls = _doc_rel_oracle_sql_base()
    # the kept-corpus rewrite: the curated verdict SQL as a CTE, semi-joined
    # back to the full document rows (DuckDB allows a nested WITH RECURSIVE
    # inside a CTE body)
    sqls["docs_curated_corpus"] = ("WITH v AS (" + sqls["docs_curated"] + """)
SELECT d.doc_id, d.text, d.lang, d.source
FROM documents d JOIN v USING (doc_id) WHERE v.kept""")
    # cross-split leakage audit: the minhash near-dup pair list (nested WITH
    # inside a CTE body, same trick as docs_curated_corpus) tagged with the
    # deterministic split label of each side, kept where the labels differ
    sqls["split_leakage"] = ("WITH mh AS (" + sqls["dedup_minhash_pairs"] + """),
lab AS (SELECT doc_a, doc_b, jaccard,
 ('0x' || substr(md5(CAST(doc_a AS VARCHAR)), 1, 8))::UBIGINT % 100 AS ha,
 ('0x' || substr(md5(CAST(doc_b AS VARCHAR)), 1, 8))::UBIGINT % 100 AS hb
 FROM mh)
SELECT doc_a, doc_b,
 CASE WHEN ha < 80 THEN 'train' WHEN ha < 90 THEN 'val' ELSE 'test' END AS split_a,
 CASE WHEN hb < 80 THEN 'train' WHEN hb < 90 THEN 'val' ELSE 'test' END AS split_b,
 jaccard
FROM lab
WHERE (CASE WHEN ha < 80 THEN 'train' WHEN ha < 90 THEN 'val' ELSE 'test' END)
   <> (CASE WHEN hb < 80 THEN 'train' WHEN hb < 90 THEN 'val' ELSE 'test' END)""")
    # MinHash recall audit: the LSH pair list vs the EXACT all-qualifying
    # pair set at the same threshold (the prefix-filter select minus its
    # prefix optimization — SQL computes the exact intersection join
    # directly), summarized to one integer-ppm row
    truth_02 = _shingle_ctes() + """,
nsh AS (SELECT doc_id, count(*) AS n FROM shx GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM shx a JOIN shx b ON b.hv = a.hv AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b
FROM inter i JOIN nsh na ON na.doc_id = i.doc_a
             JOIN nsh nb ON nb.doc_id = i.doc_b
WHERE round(CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i), 6) >= 0.2"""
    # cluster-size histogram over the connected components (nested WITH
    # RECURSIVE inside a CTE body, the docs_curated_corpus trick)
    sqls["dedup_cluster_stats"] = ("WITH cl AS ("
                                   + sqls["dedup_clusters"] + """),
csz AS (SELECT component, CAST(count(*) AS BIGINT) AS size
        FROM cl GROUP BY 1)
SELECT size AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
 CAST(size * count(*) AS BIGINT) AS n_docs,
 CAST((size - 1) * count(*) AS BIGINT) AS n_droppable
FROM csz GROUP BY 1""")
    # corpus datasheet: one row composing the audit signals (nested-CTE
    # wrappers of the component oracles, so the datasheet can never drift
    # from the per-doc queries)
    sqls["docs_datasheet"] = (
        "WITH dst AS (" + sqls["text_stats"] + "),\n"
        "ddu AS (" + sqls["dedup_exact"] + "),\n"
        "dco AS (" + sqls["text_contamination"] + "),\n"
        "dre AS (" + sqls["text_repetition"] + """)
SELECT
 (SELECT CAST(count(*) AS BIGINT) FROM dst) AS n_docs,
 (SELECT CAST(sum(n_tokens) AS BIGINT) FROM dst) AS n_tokens,
 (SELECT CAST(sum(n_dups) - count(*) AS BIGINT) FROM ddu) AS n_dup_docs,
 (SELECT CAST(count(*) FILTER (contaminated) AS BIGINT) FROM dco)
   AS n_contaminated,
 (SELECT CAST(count(*) FILTER (keep) AS BIGINT) FROM dre)
   AS n_keep_repetition,
 (SELECT CAST(sum(CAST(round(quality * 1000000) AS BIGINT))
         // greatest(count(*), 1) AS BIGINT) FROM dst)
   AS mean_quality_ppm""")
    # cross-source near-dup matrix: the verified minhash pair list joined to
    # each endpoint's source, order-collapsed with least/greatest (binary
    # collation == the engine's python str compare on these ASCII labels)
    sqls["dedup_source_matrix"] = (
        "WITH mh AS (" + sqls["dedup_minhash_pairs"] + """)
SELECT least(da.source, db.source) AS source_a,
 greatest(da.source, db.source) AS source_b,
 CAST(count(*) AS BIGINT) AS n_pairs
FROM mh JOIN documents da ON mh.doc_a = da.doc_id
        JOIN documents db ON mh.doc_b = db.doc_id
GROUP BY 1, 2""")
    sqls["dedup_minhash_eval"] = (
        "WITH mhp AS (" + sqls["dedup_minhash_pairs"] + """),
tru AS (""" + truth_02 + """),
jj AS (SELECT COALESCE(p.doc_a, t.doc_a) AS doc_a,
              (p.doc_a IS NOT NULL) AS in_pred,
              (t.doc_a IS NOT NULL) AS in_true
       FROM mhp p FULL JOIN tru t
         ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b),
cnt AS (SELECT
  CAST(count(*) FILTER (in_pred AND in_true) AS BIGINT) AS tp,
  CAST(count(*) FILTER (in_pred AND NOT in_true) AS BIGINT) AS fp,
  CAST(count(*) FILTER (in_true AND NOT in_pred) AS BIGINT) AS fn
 FROM jj)
SELECT tp + fp AS n_pred, tp + fn AS n_true, tp, fp, fn,
 CAST(tp * 1000000 // greatest(tp + fp, 1) AS BIGINT) AS precision_ppm,
 CAST(tp * 1000000 // greatest(tp + fn, 1) AS BIGINT) AS recall_ppm
FROM cnt""")
    return sqls


def _simhash_fp_ctes() -> str:
    """SimHash fingerprint CTEs replicating functions.text.simhash64 exactly
    (md5 word hashes, count-weighted bit votes), ending in `shx(doc_id, v)`
    with v = the 64-bit fingerprint (0 for token-less docs). The ONE copy of
    the fingerprint SQL — dedup_simhash, the pairs oracle and the clusters
    oracle all derive from it."""
    return """
WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents),
wc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
       FROM (SELECT doc_id, unnest(t) AS w FROM tk) GROUP BY 1, 2),
wh AS (SELECT doc_id, c, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS hv FROM wc),
bits AS (SELECT doc_id, j,
          sum(CASE WHEN (hv >> j) & 1 = 1 THEN c ELSE -c END) AS acc
         FROM wh, (SELECT unnest(generate_series(0, 63)) AS j)
         GROUP BY 1, 2),
sh64 AS (SELECT doc_id,
          sum(CASE WHEN acc > 0 THEN (CAST(1 AS UBIGINT) << j) ELSE CAST(0 AS UBIGINT) END) AS v
         FROM bits GROUP BY 1),
shx AS (SELECT t.doc_id, CAST(coalesce(s.v, 0) AS UBIGINT) AS v
        FROM tk t LEFT JOIN sh64 s USING (doc_id))"""


def _edit_pair_ctes() -> str:
    """Shared CTEs for the token-edit-distance family: encode one [a-z]+
    token as ONE ASCII byte (this DuckDB's levenshtein is byte-level, so
    token codes must be single-byte; exact while the corpus vocabulary
    stays ≤ 94 types — the fixture's is 31 at every sf) and keep pairs at
    byte-levenshtein ≤ 4 over the encodings. The |Δlen| ≤ 4 join filter
    is implied by the distance bound (pure pruning, result-neutral)."""
    return """
WITH etk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t
             FROM documents),
evw AS (SELECT w, CAST(row_number() OVER (ORDER BY w) AS INT) AS r
        FROM (SELECT DISTINCT unnest(t) AS w FROM etk)),
efl AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i
        FROM etk),
een AS (SELECT f.doc_id, string_agg(chr(32 + v.r), '' ORDER BY f.i) AS e
        FROM efl f JOIN evw v USING (w) GROUP BY 1),
eal AS (SELECT d.doc_id, coalesce(e.e, '') AS e
        FROM etk d LEFT JOIN een e USING (doc_id)),
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.e, b.e) AS BIGINT) AS edit_dist
      FROM eal a JOIN eal b
        ON a.doc_id < b.doc_id AND abs(length(a.e) - length(b.e)) <= 4
      WHERE levenshtein(a.e, b.e) <= 4)"""


def _coreset_sql(k: int = 5) -> str:
    """Programmatically chained k-center greedy CTEs: c0 = min vec_id,
    c_i = argmax (min dist² to c_0..c_{i-1}), ties to the lower vec_id —
    squared distances as in-order list_sum (bit-identical to the engine's
    sequential-dimension accumulation), min-over-centers as LEAST (exact
    selection), so the whole greedy trajectory matches exactly."""
    def dist(c: str) -> str:
        return ("list_sum(list_transform(list_zip(e.emb, (SELECT emb FROM "
                f"{c})), p -> (p[1]-p[2])*(p[1]-p[2])))")

    parts = ["ce AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb "
             "FROM embeddings)",
             "c0 AS (SELECT vec_id, emb FROM ce "
             "WHERE vec_id = (SELECT min(vec_id) FROM ce))"]
    for i in range(1, k):
        dists = [dist(f"c{j}") for j in range(i)]
        md = dists[0] if i == 1 else "LEAST(" + ", ".join(dists) + ")"
        excl = " UNION ALL ".join(f"SELECT vec_id FROM c{j}"
                                  for j in range(i))
        parts.append(f"c{i} AS (SELECT e.vec_id, e.emb, {md} AS md "
                     f"FROM ce e WHERE e.vec_id NOT IN ({excl}) "
                     f"ORDER BY md DESC, e.vec_id LIMIT 1)")
    sels = ["SELECT CAST(0 AS BIGINT) AS sel_idx, vec_id, 0.0 AS dist_sq "
            "FROM c0"]
    sels += [f"SELECT CAST({i} AS BIGINT), vec_id, round(md, 6) FROM c{i}"
             for i in range(1, k)]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(sels)


def _simhash_pair_ctes() -> str:
    """_simhash_fp_ctes + the Hamming ≤ 3 pair edge list
    `p(doc_a, doc_b, hamming)` — the exact edge list of simhash_pairs_ds,
    shared by the pairs oracle and its clusters variant."""
    return _simhash_fp_ctes() + """,
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.v, b.v)) AS BIGINT) AS hamming
      FROM shx a JOIN shx b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.v, b.v)) <= 3)"""


def _knn_graph_ctes(k: int) -> str:
    """Mutual-kNN CTEs shared by the knn_graph and embed_label_prop twins:
    exact cosine top-k per vector, pair-merged with both ranks; `kgm` has
    c = 2 for mutual edges."""
    return f"""
WITH kgs AS (
 SELECT a.vec_id AS src, b.vec_id AS dst,
  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                         CAST(b.embedding AS DOUBLE[])) AS s
 FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),
kgr AS (SELECT src, dst, s,
       row_number() OVER (PARTITION BY src ORDER BY s DESC, dst) AS rank
      FROM kgs),
kgt AS (SELECT * FROM kgr WHERE rank <= {k}),
kgm AS (SELECT least(src, dst) AS doc_a, greatest(src, dst) AS doc_b,
       CAST(sum(CASE WHEN src < dst THEN rank ELSE 0 END) AS BIGINT) AS rank_ab,
       CAST(sum(CASE WHEN src > dst THEN rank ELSE 0 END) AS BIGINT) AS rank_ba,
       max(s) AS s, count(*) AS c
      FROM kgt GROUP BY 1, 2)"""


def _label_prop_sql(k: int, rounds: int = 2) -> str:
    """embed_label_prop oracle: majority-vote label propagation over the
    mutual-kNN graph, seeds = vec_id % 10 == 0, unrolled per round;
    majority ties break to the smaller label (row_number ORDER BY c DESC,
    lab) — the engine's exact rule."""
    s = _knn_graph_ctes(k) + """,
lsym AS MATERIALIZED (
  SELECT doc_a AS s, doc_b AS d FROM kgm WHERE c = 2
  UNION ALL SELECT doc_b, doc_a FROM kgm WHERE c = 2),
ll0 AS MATERIALIZED (SELECT vec_id,
        CASE WHEN vec_id % 10 = 0 THEN CAST(label AS BIGINT)
             ELSE -1 END AS lab,
        CASE WHEN vec_id % 10 = 0 THEN 0 ELSE -1 END AS rnd
       FROM embeddings)"""
    for r in range(1, rounds + 1):
        s += f""",
lcnt{r} AS MATERIALIZED (SELECT e.d AS node, l.lab,
        CAST(count(*) AS BIGINT) AS cn
       FROM lsym e JOIN ll{r - 1} l ON l.vec_id = e.s
       WHERE l.lab >= 0 GROUP BY 1, 2),
lcand{r} AS MATERIALIZED (SELECT node, lab FROM (
        SELECT node, lab,
               row_number() OVER (PARTITION BY node
                                  ORDER BY cn DESC, lab) AS rn
        FROM lcnt{r}) WHERE rn = 1),
ll{r} AS MATERIALIZED (SELECT l.vec_id,
        CASE WHEN l.lab >= 0 THEN l.lab ELSE COALESCE(c.lab, -1) END AS lab,
        CASE WHEN l.lab >= 0 THEN l.rnd
             WHEN c.lab IS NOT NULL THEN {r} ELSE -1 END AS rnd
       FROM ll{r - 1} l LEFT JOIN lcand{r} c ON c.node = l.vec_id)"""
    return s + f"""
SELECT vec_id, (vec_id % 10 = 0) AS is_seed,
       CAST(lab AS BIGINT) AS label_final,
       CAST(rnd AS BIGINT) AS round_assigned
FROM ll{rounds}"""


# exact-integer Lloyd k-means (k=8, 3 assignment passes) — shared by the
# embed_kmeans and embed_outliers twins; mirrors pipelines/docs.py
# embed_kmeans_ds micro-unit arithmetic step for step
_KMEANS_CTES = """
WITH e AS MATERIALIZED (
  SELECT vec_id, i - 1 AS dim,
    CAST(CASE WHEN v < 0 THEN -floor(-v * 1000000 + 0.5)
              ELSE floor(v * 1000000 + 0.5) END AS BIGINT) AS vm
  FROM (SELECT vec_id,
               unnest(CAST(embedding AS DOUBLE[])) AS v,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings)),
c0 AS MATERIALIZED (SELECT vec_id AS cluster, dim, vm AS cm
                    FROM e WHERE vec_id < 8),
d1 AS MATERIALIZED (
  SELECT e.vec_id, c.cluster, sum((e.vm - c.cm) * (e.vm - c.cm)) AS d2
  FROM e JOIN c0 c ON c.dim = e.dim GROUP BY 1, 2),
a1 AS (SELECT vec_id, cluster FROM (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
  FROM d1) WHERE rn = 1),
c1 AS MATERIALIZED (
  SELECT cluster, dim,
    CAST(CASE WHEN m < 0 THEN -floor(-m + 0.5)
              ELSE floor(m + 0.5) END AS BIGINT) AS cm
  FROM (SELECT a.cluster, e.dim, CAST(sum(e.vm) AS DOUBLE) / count(*) AS m
        FROM a1 a JOIN e USING (vec_id) GROUP BY 1, 2)),
d2t AS MATERIALIZED (
  SELECT e.vec_id, c.cluster, sum((e.vm - c.cm) * (e.vm - c.cm)) AS d2
  FROM e JOIN c1 c ON c.dim = e.dim GROUP BY 1, 2),
a2 AS (SELECT vec_id, cluster FROM (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
  FROM d2t) WHERE rn = 1),
c2 AS MATERIALIZED (
  SELECT cluster, dim,
    CAST(CASE WHEN m < 0 THEN -floor(-m + 0.5)
              ELSE floor(m + 0.5) END AS BIGINT) AS cm
  FROM (SELECT a.cluster, e.dim, CAST(sum(e.vm) AS DOUBLE) / count(*) AS m
        FROM a2 a JOIN e USING (vec_id) GROUP BY 1, 2)),
d3 AS MATERIALIZED (
  SELECT e.vec_id, c.cluster, sum((e.vm - c.cm) * (e.vm - c.cm)) AS d2
  FROM e JOIN c2 c ON c.dim = e.dim GROUP BY 1, 2)"""


_WINNOW_CTES = """
WITH wtk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
             FROM documents),
wgr AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
         CAST(('0x' || substr(md5(list_extract(toks, i) || ' ' ||
               list_extract(toks, i + 1) || ' ' ||
               list_extract(toks, i + 2)), 1, 15)) AS UBIGINT) AS h
        FROM wtk, unnest(range(1, CAST(len(toks) AS BIGINT) - 1)) r(i)
        WHERE len(toks) >= 3),
wwin AS (SELECT doc_id, pos AS j, min(h) OVER win AS m,
                count(*) OVER win AS c
         FROM wgr WINDOW win AS (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
wsel AS (SELECT g.doc_id, max(g.pos) AS pos, w.m AS fp
         FROM wwin w JOIN wgr g ON g.doc_id = w.doc_id
          AND g.pos BETWEEN w.j AND w.j + 3 AND g.h = w.m
         WHERE w.c = 4 GROUP BY g.doc_id, w.j, w.m)"""


def _doc_rel_oracle_sql_base() -> dict[str, str]:
    from .pipelines.docs import KNN_GRAPH_K as _KNN_GRAPH_K

    return {
        "dedup_simhash": _simhash_fp_ctes() + """
SELECT s.doc_id, lower(lpad(hex(s.v), 16, '0')) AS simhash,
 CAST(len(t.t) AS BIGINT) AS n_tokens
FROM shx s JOIN tk t USING (doc_id)""",
        "dedup_simhash_pairs": _simhash_pair_ctes() + """
SELECT doc_a, doc_b, hamming FROM p""",
        "minhash_signatures": _minhash_ctes() + """
SELECT t.doc_id, CAST(coalesce(n.n, 0) AS BIGINT) AS n_shingles,
 coalesce(s.sig_hex, repeat('7fffffff', 64)) AS sig_hex
FROM tok t
LEFT JOIN (SELECT doc_id, count(*) AS n FROM shx GROUP BY 1) n USING (doc_id)
LEFT JOIN (SELECT doc_id, string_agg(printf('%08x', v), '' ORDER BY k) AS sig_hex
           FROM sigl GROUP BY 1) s USING (doc_id)""",
        "dedup_minhash_pairs": _minhash_pair_ctes() + """
SELECT i.doc_a, i.doc_b,
 round(CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i), 6) AS jaccard
FROM inter i JOIN nsh na ON na.doc_id = i.doc_a
             JOIN nsh nb ON nb.doc_id = i.doc_b
WHERE round(CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i), 6) >= 0.2""",
        # incremental ingest dedup: the minhash pair stream RESTRICTED to
        # cross (base, delta) pairs — delta = doc_id % 10 == 0 — oriented
        # as (delta_id, base_id). Same banding + verify math; only the
        # candidate generation is incremental on the engine side.
        "dedup_incremental": _minhash_pair_ctes() + """
SELECT CASE WHEN i.doc_a % 10 = 0 THEN i.doc_a ELSE i.doc_b END AS delta_id,
 CASE WHEN i.doc_a % 10 = 0 THEN i.doc_b ELSE i.doc_a END AS base_id,
 round(CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i), 6) AS jaccard
FROM inter i JOIN nsh na ON na.doc_id = i.doc_a
             JOIN nsh nb ON nb.doc_id = i.doc_b
WHERE round(CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i), 6) >= 0.2
  AND ((i.doc_a % 10 = 0) != (i.doc_b % 10 = 0))""",
        # exact set-similarity self-join: ALL pairs with shingle Jaccard
        # ≥ 0.8, no candidate restriction — the token-join formulation is
        # itself the scalable SQL shape (prefix_pairs_ds's twin)
        "dedup_prefix_pairs": _shingle_ctes() + """,
nsh AS (SELECT doc_id, count(*) AS n FROM shx GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM shx a JOIN shx b ON b.hv = a.hv AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b,
 round(CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i), 6) AS jaccard
FROM inter i JOIN nsh na ON na.doc_id = i.doc_a
             JOIN nsh nb ON nb.doc_id = i.doc_b
WHERE round(CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i), 6) >= 0.8""",
        "dedup_exact": """
SELECT sha256(text) AS text_sha, min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY sha256(text)""",
        "dedup_ngram_pairs": """
WITH toks AS (SELECT doc_id, source,
       regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, source,
        t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       FROM (SELECT doc_id, source, t,
              unnest(generate_series(1, len(t) - 2)) AS i
             FROM toks WHERE len(t) >= 3)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
        count(*) AS i
       FROM sh a JOIN sh b ON a.source = b.source AND a.s = b.s
        AND a.doc_id < b.doc_id
       GROUP BY a.source, a.doc_id, b.doc_id)
SELECT i.source, i.doc_a, i.doc_b,
 round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 6) >= 0.2""",
        "dedup_embed_pairs": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings WHERE vec_id % 5 = 0)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
 round(list_cosine_similarity(a.emb, b.emb), 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= 0.3""",
        "dedup_charset_pairs": """
SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(jaccard(a.text, b.text), 6) AS jac
FROM documents a JOIN documents b
  ON a.source = b.source AND a.doc_id < b.doc_id
WHERE round(jaccard(a.text, b.text), 6) >= 0.9""",
        "text_stats": f"""
WITH s AS (SELECT doc_id, length(text) AS n_chars2,
                  regexp_extract_all(lower(text), '[a-z]+') AS toks
           FROM documents),
s2 AS (SELECT doc_id, n_chars2, CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks, x -> list_contains({_STOP_EN_SQL}, x))) AS BIGINT) AS n_stop
       FROM s)
SELECT doc_id, CAST(n_chars2 AS BIGINT) AS n_chars2, n_tokens, n_stop,
 round(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0 END, 6) AS stop_ratio,
 round((1.0 - CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0 END)
       * least(1.0, n_tokens / 200.0), 6) AS quality
FROM s2""",
        "text_winnowing": _WINNOW_CTES + """
SELECT DISTINCT doc_id, pos, CAST(fp AS BIGINT) AS fp FROM wsel""",
        "text_winnow_pairs": _WINNOW_CTES + """,
wfp AS (SELECT DISTINCT doc_id, CAST(fp AS BIGINT) AS fp FROM wsel),
wdf AS (SELECT fp, CAST(count(*) AS BIGINT) AS df FROM wfp GROUP BY 1),
wok AS (SELECT f.doc_id, f.fp FROM wfp f JOIN wdf USING (fp)
        WHERE df BETWEEN 2 AND 50)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
 CAST(count(*) AS BIGINT) AS n_shared
FROM wok a JOIN wok b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2""",
        "docs_dp_counts": """
WITH dpc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
             FROM documents GROUP BY 1),
dpu AS (SELECT *,
         (CAST(CAST(('0x' || substr(md5(lang), 1, 15)) AS UBIGINT)
               % 1000000 AS DOUBLE) + 0.5) / 1000000.0 AS u
        FROM dpc),
dpn AS (SELECT lang, n,
         CASE WHEN u > 0.5 THEN -ln(1 - 2 * (u - 0.5))
              WHEN u < 0.5 THEN ln(1 - 2 * (0.5 - u))
              ELSE 0 END AS x
        FROM dpu),
dpm AS (SELECT lang, n,
         CAST(CASE WHEN x < 0 THEN -floor(-x * 1000000 + 0.5)
              ELSE floor(x * 1000000 + 0.5) END AS BIGINT) AS noise_micro
        FROM dpn)
SELECT lang, n AS n_docs, noise_micro,
 CAST(n * 1000000 + noise_micro AS BIGINT) AS noisy_micro
FROM dpm""",
        "docs_k_anonymity": """
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
 (count(*) >= 10) AS k_anonymous
FROM documents GROUP BY 1, 2""",
        "docs_source_divergence": """
WITH jt AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+'))
            AS w FROM documents),
jc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
       FROM jt GROUP BY 1, 2),
jn AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM jc GROUP BY 1),
jp AS (SELECT a.source AS sa, b.source AS sb
       FROM jn a JOIN jn b ON a.source < b.source),
jw0 AS (SELECT p.sa, p.sb, c.w,
         CAST(sum(CASE WHEN c.source = p.sa THEN c.c ELSE 0 END) AS BIGINT)
           AS ca,
         CAST(sum(CASE WHEN c.source = p.sb THEN c.c ELSE 0 END) AS BIGINT)
           AS cb
        FROM jp p JOIN jc c ON c.source IN (p.sa, p.sb)
        GROUP BY 1, 2, 3),
jpq AS (SELECT w0.sa, w0.sb,
         CAST(w0.ca AS DOUBLE) / na.n AS p,
         CAST(w0.cb AS DOUBLE) / nb.n AS q,
         w0.ca AS ca, w0.cb AS cb
        FROM jw0 w0 JOIN jn na ON na.source = w0.sa
        JOIN jn nb ON nb.source = w0.sb),
jterm AS (SELECT sa, sb,
   (CASE WHEN ca > 0 THEN p * ln((2 * p) / (p + q)) ELSE 0 END
  + CASE WHEN cb > 0 THEN q * ln((2 * q) / (p + q)) ELSE 0 END) AS t
  FROM jpq),
jmic AS (SELECT sa, sb,
   CAST(CASE WHEN t < 0 THEN -floor(-t * 1000000 + 0.5)
        ELSE floor(t * 1000000 + 0.5) END AS BIGINT) AS micro
  FROM jterm)
SELECT sa AS source_a, sb AS source_b,
 CAST(sum(micro) AS BIGINT) AS js_micro,
 CAST(count(*) AS BIGINT) AS n_words
FROM jmic GROUP BY 1, 2""",
        "sample_bootstrap": """
WITH bs AS (SELECT doc_id, source,
        CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
          AS ntok
      FROM documents),
bx AS (SELECT bs.*, r,
        CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
             CAST(r AS VARCHAR)), 1, 15)) AS UBIGINT) % 1000000 AS BIGINT)
          AS u
       FROM bs, range(8) rr(r)),
bw AS (SELECT r, source, ntok,
        (CASE WHEN u >= 367879 THEN 1 ELSE 0 END
       + CASE WHEN u >= 735758 THEN 1 ELSE 0 END
       + CASE WHEN u >= 919698 THEN 1 ELSE 0 END
       + CASE WHEN u >= 981011 THEN 1 ELSE 0 END
       + CASE WHEN u >= 996340 THEN 1 ELSE 0 END
       + CASE WHEN u >= 999405 THEN 1 ELSE 0 END) AS w
       FROM bx)
SELECT CAST(r AS BIGINT) AS r, source,
 CAST(SUM(w) AS BIGINT) AS n_docs,
 CAST(SUM(w * ntok) AS BIGINT) AS n_tokens
FROM bw GROUP BY 1, 2""",
        "dedup_edit_pairs": _edit_pair_ctes() + """
SELECT doc_a, doc_b, edit_dist FROM p""",
        "dedup_edit_clusters": _edit_pair_ctes().replace(
            "\nWITH ", "\nWITH RECURSIVE ", 1) + """,
e AS (SELECT doc_a AS a, doc_b AS b FROM p
      UNION SELECT doc_b, doc_a FROM p),
n AS (SELECT DISTINCT a AS node FROM e),
reach(node, r) AS (
  SELECT node, node FROM n
  UNION
  SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.node)
SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS component
FROM reach GROUP BY node""",
        "dedup_containment_pairs": """
WITH ctk2 AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+')
              AS toks FROM documents),
csh AS (SELECT DISTINCT doc_id,
        CAST(('0x' || substr(md5(array_to_string(
          toks[CAST(i AS BIGINT):CAST(i + 2 AS BIGINT)], ' ')), 1, 15))
          AS UBIGINT) AS h
       FROM ctk2, unnest(range(1, CAST(len(toks) AS BIGINT) - 1)) r(i)
       WHERE len(toks) >= 3),
cdf AS (SELECT h, CAST(count(*) AS BIGINT) AS df FROM csh GROUP BY 1),
cok AS (SELECT s.doc_id, s.h FROM csh s JOIN cdf USING (h)
        WHERE df BETWEEN 2 AND 50),
ccn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_doc
        FROM csh GROUP BY 1),
cpr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_shared
        FROM cok a JOIN cok b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
SELECT p.doc_a, p.doc_b, p.n_shared, ca.n_doc AS n_a, cb.n_doc AS n_b,
 round(CAST(p.n_shared AS DOUBLE) / ca.n_doc, 6) AS contain_ab,
 round(CAST(p.n_shared AS DOUBLE) / cb.n_doc, 6) AS contain_ba
FROM cpr p JOIN ccn ca ON ca.doc_id = p.doc_a
JOIN ccn cb ON cb.doc_id = p.doc_b
WHERE 2 * p.n_shared >= least(ca.n_doc, cb.n_doc)""",
        "text_collocations": """
WITH ctk AS (SELECT regexp_extract_all(lower(text), '[a-z]+') AS toks
             FROM documents),
cgr AS (SELECT list_extract(toks, i) AS w1, list_extract(toks, i + 1) AS w2
        FROM ctk, unnest(range(1, CAST(len(toks) AS BIGINT))) r(i)
        WHERE len(toks) >= 2),
cbi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
        FROM cgr GROUP BY 1, 2),
cun AS (SELECT w, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(toks) AS w FROM ctk) GROUP BY 1),
ctot AS (SELECT CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) AS n_big,
                CAST(sum(len(toks)) AS BIGINT) AS n_tok FROM ctk)
SELECT b.w1, b.w2, b.n_pair, u1.n AS n_w1, u2.n AS n_w2,
 round(ln((CAST(b.n_pair AS DOUBLE) * CAST(t.n_tok AS DOUBLE)
           * CAST(t.n_tok AS DOUBLE))
          / CAST(t.n_big * u1.n * u2.n AS DOUBLE)), 6) AS pmi
FROM cbi b JOIN cun u1 ON u1.w = b.w1 JOIN cun u2 ON u2.w = b.w2
CROSS JOIN ctot t WHERE b.n_pair >= 5""",
        "docs_mixture_weights": """
WITH tok AS (SELECT source,
        CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n
      FROM documents),
s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n) AS BIGINT) AS n_tokens FROM tok GROUP BY source),
w AS (SELECT *, CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0)
                     AS BIGINT) AS sqrt_micro FROM s),
t AS (SELECT CAST(sum(sqrt_micro) AS BIGINT) AS tot_swt,
             CAST(sum(n_tokens) AS BIGINT) AS tot_tok FROM w)
SELECT source, n_docs, n_tokens, sqrt_micro,
 CAST(n_tokens * 1000000 // greatest(t.tot_tok, 1) AS BIGINT) AS share_ppm,
 CAST(sqrt_micro * 1000000 // greatest(t.tot_swt, 1) AS BIGINT) AS weight_ppm,
 CAST((sqrt_micro * 1000000 // greatest(t.tot_swt, 1))
      * (t.tot_tok // 1000000) AS BIGINT) AS expected_tokens
FROM w, t""",
        "sample_token_budget": """
WITH tok AS (SELECT doc_id, source,
        CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_tokens
      FROM documents),
st AS (SELECT source, sum(n_tokens) AS t_s,
              CASE source WHEN 'src0' THEN 4 WHEN 'src1' THEN 2 ELSE 1 END AS w
       FROM tok GROUP BY source),
g AS (SELECT sum(t_s) AS t_total, sum(w) AS w_total FROM st),
th AS (SELECT st.source,
         CASE WHEN st.t_s = 0 THEN CAST(1000000 AS HUGEINT)
              ELSE least(CAST(1000000 AS HUGEINT),
                         (CAST(g.t_total AS HUGEINT) * st.w * 1000000)
                         // (2 * CAST(g.w_total AS HUGEINT) * st.t_s))
         END AS thresh
       FROM st, g),
h AS (SELECT t.doc_id, t.source, t.n_tokens,
        CAST(CAST(('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
             % 1000000 AS BIGINT) AS bucket
      FROM tok t)
SELECT h.doc_id, h.source, h.n_tokens, h.bucket
FROM h JOIN th USING (source)
WHERE h.bucket < th.thresh""",
        "text_quality_bins": f"""
WITH s AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z]+') AS toks
           FROM documents),
s2 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks, x -> list_contains({_STOP_EN_SQL}, x))) AS BIGINT) AS n_stop
       FROM s),
q AS (SELECT doc_id,
       CAST(round(round((1.0 - CASE WHEN n_tokens > 0
                    THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0 END)
             * least(1.0, n_tokens / 200.0), 6) * 1000000) AS BIGINT) AS q_micro
      FROM s2),
r AS (SELECT q_micro, row_number() OVER (ORDER BY q_micro) AS rk,
             count(*) OVER () AS n FROM q),
th AS (SELECT g.k, min(r.q_micro) AS t
       FROM range(1, 10) AS g(k)
       JOIN r ON r.rk = CAST(ceil(g.k * r.n / 10.0) AS BIGINT)
       GROUP BY g.k)
SELECT q.doc_id, q.q_micro,
       CAST(COALESCE(sum(CASE WHEN q.q_micro > th.t THEN 1 ELSE 0 END), 0) AS BIGINT) AS decile
FROM q CROSS JOIN th GROUP BY q.doc_id, q.q_micro""",
        "docs_curriculum_order": f"""
WITH s AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z]+') AS toks
           FROM documents),
s2 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks, x -> list_contains({_STOP_EN_SQL}, x))) AS BIGINT) AS n_stop
       FROM s),
q AS (SELECT doc_id,
       CAST(round(round((1.0 - CASE WHEN n_tokens > 0
                    THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0 END)
             * least(1.0, n_tokens / 200.0), 6) * 1000000) AS BIGINT) AS q_micro
      FROM s2)
SELECT doc_id, q_micro,
 CAST(row_number() OVER (ORDER BY q_micro DESC, doc_id) AS BIGINT) AS rank
FROM q""",
        "text_gopher_quality": _gopher_select(),
        "text_repetition": """
WITH s AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
           FROM documents),
n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct FROM s),
g AS (SELECT doc_id,
        CASE WHEN len(toks) >= 2 THEN
          list_transform(range(1, CAST(len(toks) AS BIGINT)),
                         i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1))
        ELSE [] END AS grams
      FROM s),
w AS (SELECT doc_id, max(cnt) AS max_cnt FROM (
        SELECT doc_id, count(*) AS cnt
        FROM (SELECT doc_id, unnest(toks) AS tok FROM s) GROUP BY doc_id, tok)
      GROUP BY doc_id),
m AS (SELECT n.doc_id, n.n_tokens, n.n_distinct,
 round(CASE WHEN n_tokens > 0 THEN n_distinct / CAST(n_tokens AS DOUBLE)
            ELSE 0 END, 6) AS distinct_ratio,
 round(CASE WHEN n_tokens > 0 THEN COALESCE(w.max_cnt, 0) / CAST(n_tokens AS DOUBLE)
            ELSE 0 END, 6) AS top_word_frac,
 round(CASE WHEN len(grams) > 0
            THEN 1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE)
            ELSE 0 END, 6) AS dup_2gram_frac
 FROM n JOIN g USING (doc_id) LEFT JOIN w USING (doc_id))
SELECT *, (dup_2gram_frac <= 0.05 AND distinct_ratio >= 0.3) AS keep FROM m""",
        "pack_sequences": """
WITH tok AS (SELECT doc_id,
        CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_tokens
      FROM documents),
c AS (SELECT doc_id, n_tokens,
        CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS cum_before
      FROM tok)
SELECT doc_id, n_tokens, cum_before,
       CAST(cum_before // 2048 AS BIGINT) AS seq_id,
       CAST(cum_before % 2048 AS BIGINT) AS seq_offset
FROM c""",
        "text_contamination": """
WITH s AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
           FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, CAST(len(toks) AS BIGINT) - 6),
        i -> array_to_string(toks[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ')))) AS gram
      FROM s WHERE len(toks) >= 8),
ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY doc_id),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
hits AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         FROM g JOIN bench USING (gram) GROUP BY g.doc_id)
SELECT d.doc_id, COALESCE(ng.n_grams, 0) AS n_grams,
       COALESCE(hits.n_hits, 0) AS n_hits,
       (d.doc_id % 50 = 0) AS is_benchmark,
       (COALESCE(hits.n_hits, 0) > 0 AND d.doc_id % 50 != 0) AS contaminated
FROM documents d
LEFT JOIN ng ON d.doc_id = ng.doc_id
LEFT JOIN hits ON d.doc_id = hits.doc_id""",
        "text_bloom_contamination": """
WITH s AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
           FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, CAST(len(toks) AS BIGINT) - 6),
        i -> array_to_string(toks[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ')))) AS gram
      FROM s WHERE len(toks) >= 8),
ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY doc_id),
bbits AS (SELECT DISTINCT
    CAST(CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || gram), 1, 15))
         AS UBIGINT) % 65536 AS BIGINT) AS bit
  FROM (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0), range(3) r(j)),
probe AS (SELECT doc_id, gram,
    CAST(CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || gram), 1, 15))
         AS UBIGINT) % 65536 AS BIGINT) AS bit
  FROM g, range(3) r(j)),
hitg AS (SELECT doc_id, gram FROM probe JOIN bbits USING (bit)
         GROUP BY doc_id, gram HAVING count(*) = 3),
hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM hitg
         GROUP BY doc_id)
SELECT d.doc_id, COALESCE(ng.n_grams, 0) AS n_grams,
       COALESCE(hits.n, 0) AS n_bloom_hits,
       (d.doc_id % 50 = 0) AS is_benchmark,
       (COALESCE(hits.n, 0) > 0 AND d.doc_id % 50 != 0) AS flagged
FROM documents d
LEFT JOIN ng ON d.doc_id = ng.doc_id
LEFT JOIN hits ON d.doc_id = hits.doc_id""",
        "text_unigram_logprob": """
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
             FROM documents),
cnt AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY word),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM tok),
sc AS (SELECT t.doc_id, ln(CAST(c.n AS DOUBLE) / tot.total) AS lp
       FROM tok t JOIN cnt c USING (word) CROSS JOIN tot),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, avg(lp) AS alp
        FROM sc GROUP BY doc_id)
SELECT d.doc_id, COALESCE(agg.n_tokens, 0) AS n_tokens,
       round(COALESCE(agg.alp, 0), 6) AS avg_logprob
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""",
        "text_guess_lt": _guess_lt_select(),
        "text_langid": f"""
WITH s AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks FROM documents),
h AS (SELECT doc_id,
  CAST(len(list_filter(toks, x -> list_contains({_STOP_EN_SQL}, x))) AS BIGINT) AS en_hits,
  CAST(len(list_filter(toks, x -> list_contains({_STOP_DE_SQL}, x))) AS BIGINT) AS de_hits,
  CAST(len(list_filter(toks, x -> list_contains({_STOP_FR_SQL}, x))) AS BIGINT) AS fr_hits
 FROM s)
SELECT doc_id, en_hits, de_hits, fr_hits,
 CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
      WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
      WHEN fr_hits > 0 THEN 'fr' ELSE 'unknown' END AS lang_guess
FROM h""",
        "text_langid_eval": f"""
WITH lex AS (SELECT lang,
  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
       WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
       WHEN fr_hits > 0 THEN 'fr' ELSE 'unknown' END AS lang_guess
 FROM (SELECT lang,
    CAST(len(list_filter(toks, x -> list_contains({_STOP_EN_SQL}, x))) AS BIGINT) AS en_hits,
    CAST(len(list_filter(toks, x -> list_contains({_STOP_DE_SQL}, x))) AS BIGINT) AS de_hits,
    CAST(len(list_filter(toks, x -> list_contains({_STOP_FR_SQL}, x))) AS BIGINT) AS fr_hits
   FROM (SELECT lang, regexp_extract_all(lower(text), '[a-z]+') AS toks
         FROM documents))),
lcm AS (SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n
        FROM lex GROUP BY 1, 2),
ltt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tot FROM lcm GROUP BY 1)
SELECT c.lang, c.lang_guess, c.n,
 CAST(c.n * 1000000 // greatest(t.tot, 1) AS BIGINT) AS row_share_ppm
FROM lcm c JOIN ltt t USING (lang)""",
        "text_gram_novelty": """
WITH gtk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+')
             AS toks FROM documents),
gsh AS (SELECT DISTINCT doc_id,
        CAST(('0x' || substr(md5(array_to_string(
          toks[CAST(i AS BIGINT):CAST(i + 2 AS BIGINT)], ' ')), 1, 15))
          AS UBIGINT) AS h
       FROM gtk, unnest(range(1, CAST(len(toks) AS BIGINT) - 1)) r(i)
       WHERE len(toks) >= 3),
gwin AS (SELECT h, CAST(min(doc_id) AS BIGINT) AS winner
         FROM gsh GROUP BY 1),
gnov AS (SELECT winner AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
         FROM gwin GROUP BY 1),
gtot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
         FROM gsh GROUP BY 1)
SELECT t.doc_id, t.n_grams, COALESCE(v.n_novel, 0) AS n_novel,
 CAST(COALESCE(v.n_novel, 0) * 1000000 // greatest(t.n_grams, 1)
      AS BIGINT) AS novelty_ppm
FROM gtot t LEFT JOIN gnov v USING (doc_id)""",
        "doc_fingerprint": r"""
SELECT doc_id, substr(sha256(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16) AS fp
FROM documents""",
        "knn_graph": _knn_graph_ctes(_KNN_GRAPH_K) + """
SELECT doc_a, doc_b, rank_ab, rank_ba, round(s, 6) AS cos_sim
FROM kgm WHERE c = 2""",
        "embed_label_prop": _label_prop_sql(_KNN_GRAPH_K),
        "knn_filtered": """
WITH fs AS (
 SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                         CAST(e.embedding AS DOUBLE[])) AS s
 FROM embeddings q, embeddings e
 WHERE q.vec_id < 4 AND e.vec_id <> q.vec_id AND e.label = q.label),
fr AS (SELECT query_id, neighbor_id, s,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY s DESC, neighbor_id) AS rank
       FROM fs)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
 round(s, 6) AS cos_sim
FROM fr WHERE rank <= 10""",
        "knn_brute": """
WITH sims AS (
 SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS s
 FROM embeddings q, embeddings e
 WHERE q.vec_id < 4 AND e.vec_id <> q.vec_id),
r AS (SELECT query_id, neighbor_id, s,
       row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank
      FROM sims)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(s, 6) AS cos_sim
FROM r WHERE rank <= 10""",
        # incremental vector-index ingest: the arriving batch's (vec_id %
        # 10 = 0) exact top-k among the indexed base — the engine's
        # full-probe generational IVF equals brute force over the base set
        "embed_ingest": """
WITH sims AS (
 SELECT q.vec_id AS delta_id, e.vec_id AS base_id,
  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS s
 FROM embeddings q, embeddings e
 WHERE q.vec_id % 10 = 0 AND e.vec_id % 10 <> 0),
r AS (SELECT delta_id, base_id, s,
       row_number() OVER (PARTITION BY delta_id ORDER BY s DESC, base_id) AS rank
      FROM sims)
SELECT delta_id, base_id, CAST(rank AS BIGINT) AS rank, round(s, 6) AS cos_sim
FROM r WHERE rank <= 10""",
        "rel_pricing_summary": """
SELECT l_returnflag, l_linestatus,
 CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
 CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
 CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_c,
 CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus""",
        "rel_top_customers": """
SELECT o.o_custkey AS o_custkey, c.c_name AS c_name,
 CAST(SUM(CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c,
 CAST(count(*) AS BIGINT) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_custkey, c.c_name
ORDER BY revenue_c DESC, o_custkey LIMIT 10""",
        "rel_events_window": """
SELECT event_type,
 CAST(FLOOR(CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0) AS BIGINT) AS window,
 CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c,
 CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1, 2""",
        # watermark lateness: arrival = event_id + md5 % 16 (deterministic
        # bounded ingest displacement — the fixture's events are ts-sorted,
        # so unjittered lateness would be identically zero); watermark =
        # running max(ts) over arrival order − 10 min; an event is late when
        # its 1-hour window closed before it arrived
        "rel_events_late": """
WITH leh AS (SELECT *,
        CAST(((CAST(event_id % 4294967296 AS HUGEINT) * 2654435761)
              % 4294967296) AS BIGINT) AS hv
       FROM events),
le0 AS (SELECT event_id, epoch_us(ts) AS us,
        CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS val_c,
        CAST(FLOOR(CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0) AS BIGINT)
          AS wdw,
        event_id + (xor(hv, hv >> 16) % 16) AS arr
       FROM leh),
le1 AS (SELECT *, max(us) OVER (ORDER BY arr, event_id) AS wm_us FROM le0),
le2 AS (SELECT *, CASE WHEN (wdw + 1) * 3600000000 <= wm_us - 600000000
                       THEN 1 ELSE 0 END AS late FROM le1)
SELECT wdw AS "window", CAST(count(*) AS BIGINT) AS n_events,
 CAST(sum(late) AS BIGINT) AS n_late,
 CAST(sum(CASE WHEN late = 0 THEN val_c ELSE 0 END) AS BIGINT)
   AS sum_on_time_c
FROM le2 GROUP BY 1""",
        "rel_events_window_users": """
SELECT CAST(FLOOR(CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0) AS BIGINT) AS window,
 CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1""",
        "rel_bloom_semi_join": """
SELECT l.l_partkey AS p_partkey,
 CAST(count(*) AS BIGINT) AS n_items,
 CAST(SUM(CAST(FLOOR(l.l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
   AS sum_qty_c
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size < 10 GROUP BY 1""",
        "rel_events_intervals": """
SELECT event_id, user_id, event_type,
 CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_c,
 CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
 CAST(COALESCE(lead(epoch_us(ts)) OVER
        (PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id),
      253402300800000000) AS BIGINT) AS valid_to_us,
 (lead(epoch_us(ts)) OVER
        (PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id)
   IS NULL) AS is_current
FROM events""",
        "rel_events_rolling": """
SELECT event_id, user_id,
 CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_sum_c,
 CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_frame
FROM events""",
        "rel_revenue_rollup": """
SELECT r.r_name AS region, n.n_name AS nation,
 CAST(SUM(CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c,
 CAST(count(*) AS BIGINT) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)""",
        "rel_revenue_cube": """
SELECT r.r_name AS region, o.o_orderpriority AS priority,
 CAST(SUM(CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c,
 CAST(count(*) AS BIGINT) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY CUBE(r.r_name, o.o_orderpriority)""",
        "rel_orders_above_avg": """
WITH oc AS (SELECT o_custkey,
             CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_c
            FROM orders),
ca AS (SELECT o_custkey, SUM(price_c) AS sum_c, count(*) AS n
       FROM oc GROUP BY 1)
SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_above,
 CAST(sum(oc.price_c) AS BIGINT) AS rev_above_c
FROM oc JOIN ca USING (o_custkey)
JOIN customer c ON oc.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE oc.price_c * ca.n > ca.sum_c
GROUP BY 1""",
        # window family LAG/LEAD/NTILE over each user's event timeline;
        # date_diff returns BIGINT microseconds, NULL at partition edges —
        # the engine twin is events_lead_lag_ds (hash-bucketed windows)
        "rel_events_lead_lag": """
SELECT event_id, user_id,
 CAST(coalesce(date_diff('microsecond', lag(ts) OVER w, ts), -1) AS BIGINT)
   AS prev_gap_us,
 CAST(coalesce(date_diff('microsecond', ts, lead(ts) OVER w), -1) AS BIGINT)
   AS next_gap_us,
 CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        # exact global gap quantiles; rank k = ceil(q*n) pinned in INTEGER
        # math on both sides — the engine twin is events_gap_quantiles_ds
        # (two-phase coarse-histogram refine, no global sort)
        "rel_events_gap_quantiles": """
WITH g AS (SELECT date_diff('microsecond',
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
           AS gap_us FROM events),
gg AS (SELECT gap_us FROM g WHERE gap_us IS NOT NULL),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM gg),
r AS (SELECT gap_us, row_number() OVER (ORDER BY gap_us) AS rn FROM gg),
qs AS (SELECT CAST(v.q_ppm AS BIGINT) AS q_ppm
       FROM (VALUES (500000), (900000), (990000)) v(q_ppm))
SELECT q.q_ppm, nn.n AS n_gaps,
 (SELECT r.gap_us FROM r
  WHERE r.rn = (q.q_ppm * nn.n + 999999) // 1000000) AS gap_us
FROM qs q, nn""",
        # exact top-20 tokens + corpus share; the engine reaches the same
        # answer via Misra-Gries candidates + exact recount
        # (pipelines/docs.py heavy_hitters_ds) — this is the spec
        "text_heavy_hitters": """
WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
              AS word FROM documents),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM tok),
c AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1)
SELECT word, n, round(CAST(n AS DOUBLE) / (SELECT t FROM tot), 6) AS share
FROM c ORDER BY n DESC, word LIMIT 20""",
        # per-column profile; distinct-on-md5 for text mirrors the engine's
        # hashed shuffle payload (exact modulo md5 collision, both sides)
        "docs_profile": """
SELECT 'doc_id' AS col, CAST(count(*) AS BIGINT) AS n_rows,
 CAST(count(*) - count(doc_id) AS BIGINT) AS n_null,
 CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct FROM documents
UNION ALL
SELECT 'lang', count(*), count(*) - count(lang),
 count(DISTINCT lang) FROM documents
UNION ALL
SELECT 'source', count(*), count(*) - count(source),
 count(DISTINCT source) FROM documents
UNION ALL
SELECT 'n_chars', count(*), count(*) - count(n_chars),
 count(DISTINCT n_chars) FROM documents
UNION ALL
SELECT 'text', count(*), count(*) - count(text),
 count(DISTINCT md5(text)) FROM documents""",
        # same 50-word non-overlapping chunking + keep-first window as the
        # engine (pipelines/docs.py para_dedup_ds); docs with zero words
        # still appear with n_chunks = 0 and empty text
        "text_para_dedup": """
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
           FROM documents),
ci AS (SELECT doc_id, ws,
        unnest(range(0, CAST(ceil(len(ws)/50.0) AS BIGINT))) AS chunk_idx
       FROM w),
ch AS (SELECT doc_id, chunk_idx,
        array_to_string(list_slice(ws, CAST(chunk_idx*50+1 AS BIGINT),
                                   CAST(chunk_idx*50+50 AS BIGINT)),
                        ' ') AS chunk_text
       FROM ci),
k AS (SELECT *, row_number() OVER (PARTITION BY chunk_text
                                   ORDER BY doc_id, chunk_idx) AS rn
      FROM ch),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS text_kept
        FROM k WHERE rn = 1 GROUP BY doc_id),
nc AS (SELECT doc_id, CAST(ceil(len(ws)/50.0) AS BIGINT) AS n_chunks FROM w)
SELECT nc.doc_id, nc.n_chunks, COALESCE(agg.n_kept, 0) AS n_kept,
       COALESCE(agg.text_kept, '') AS text_kept
FROM nc LEFT JOIN agg USING (doc_id)""",
        # fixed-point (floor(v*1e6+0.5)) second moments; embeddings are
        # 64-dim in every fixture tier (fixtures generator), 1-based dims
        # to match DuckDB list indexing
        "embed_pca_scatter": """
WITH e AS (SELECT vec_id, CAST(i.range AS BIGINT) AS d,
            CAST(FLOOR(CAST(embedding[CAST(i.range AS INT)] AS DOUBLE)
                       * 1000000 + 0.5) AS BIGINT) AS v
           FROM embeddings, range(1, 65) i)
SELECT a.d AS dim_i, b.d AS dim_j,
 CAST(sum(a.v*b.v) AS BIGINT) AS sum_xy,
 CAST(sum(a.v) AS BIGINT) AS sum_x,
 CAST(sum(b.v) AS BIGINT) AS sum_y,
 CAST(count(*) AS BIGINT) AS n_rows
FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.d <= b.d
GROUP BY 1, 2""",
        # label-centroid cosine matrix: cosine is scale-invariant, so the
        # fixed-point per-label SUM vectors stand in for the means; HUGEINT
        # sums are exact, one float expression at the end (engine twin
        # embed_centroid_sim_ds reduces the same sums in Python ints)
        "embed_centroid_sim": """
WITH e AS (SELECT vec_id, label, CAST(i.range AS BIGINT) AS d,
            CAST(FLOOR(CAST(embedding[CAST(i.range AS INT)] AS DOUBLE)
                       * 1000000 + 0.5) AS BIGINT) AS v
           FROM embeddings, range(1, 65) i),
s AS (SELECT label, d, SUM(v) AS sv FROM e GROUP BY 1, 2),
cn AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY 1),
dt AS (SELECT a.label AS la, b.label AS lb, SUM(a.sv * b.sv) AS dp
       FROM s a JOIN s b ON a.d = b.d AND a.label < b.label GROUP BY 1, 2),
nr AS (SELECT label, SUM(sv * sv) AS s2 FROM s GROUP BY 1)
SELECT CAST(d.la AS BIGINT) AS label_a, CAST(d.lb AS BIGINT) AS label_b,
 na.n AS n_a, nb.n AS n_b,
 CAST(FLOOR(CAST(d.dp AS DOUBLE)
      / (sqrt(CAST(x.s2 AS DOUBLE)) * sqrt(CAST(y.s2 AS DOUBLE)))
      * 1000000 + 0.5) AS BIGINT) AS cos_ppm
FROM dt d JOIN nr x ON x.label = d.la JOIN nr y ON y.label = d.lb
JOIN cn na ON na.label = d.la JOIN cn nb ON nb.label = d.lb""",
        "sample_group_topk": """
WITH r AS (SELECT lang, doc_id,
  row_number() OVER (PARTITION BY lang
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
 FROM documents)
SELECT lang, doc_id, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 20""",
        "text_vocab": """
WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
             FROM documents),
c AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1)
SELECT word, n FROM c ORDER BY n DESC, word LIMIT 100""",
        "split_assign": """
SELECT doc_id,
 CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100 < 80
      THEN 'train'
      WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100 < 90
      THEN 'val' ELSE 'test' END AS split
FROM documents""",
        "rel_events_funnel": """
WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN s1 ON s1.user_id = e.user_id
       WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN s2 ON s2.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1)
SELECT * FROM (
 SELECT CAST(1 AS BIGINT) AS step, CAST(count(*) AS BIGINT) AS n_users FROM s1
 UNION ALL
 SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT) FROM s2
 UNION ALL
 SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT) FROM s3)
ORDER BY step""",
        "docs_jsonl_roundtrip": """
SELECT doc_id, lang, source, n_chars FROM documents""",
        "rel_events_wau": """
WITH du AS (SELECT DISTINCT
             CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day, user_id
            FROM events),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY 1 ORDER BY 1""",
        # the unpruned 3-way self-join spec of the A-Priori second round —
        # downward-closure pruning in the engine provably changes nothing
        "rel_basket_triples": """
WITH bk AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, c.l_partkey AS part_c,
 CAST(count(*) AS BIGINT) AS n_orders
FROM bk a
JOIN bk b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
JOIN bk c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
GROUP BY 1, 2, 3 HAVING count(*) >= 2""",
        "rel_basket_pairs": """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sup AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS n_orders
        FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
f AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
t AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS nt FROM lineitem)
SELECT s.part_a, s.part_b, s.n_orders,
 round((CAST(s.n_orders AS DOUBLE) * t.nt)
       / (CAST(fa.n AS DOUBLE) * CAST(fb.n AS DOUBLE)), 6) AS lift
FROM sup s
JOIN f fa ON fa.l_partkey = s.part_a
JOIN f fb ON fb.l_partkey = s.part_b
CROSS JOIN t
ORDER BY s.part_a, s.part_b""",
        "rel_events_zscore": """
WITH v AS (SELECT event_id, user_id,
            CAST(floor(value * 100 + 0.5) AS BIGINT) AS val_c FROM events),
m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(val_c) AS BIGINT) AS s,
       CAST(sum(val_c * val_c) AS BIGINT) AS q
      FROM v GROUP BY 1)
SELECT v.event_id, v.user_id, v.val_c,
 round((CAST(v.val_c AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n)
       / sqrt((CAST(m.q AS DOUBLE) - CAST(m.s AS DOUBLE) * m.s / m.n) / m.n),
       6) AS z
FROM v JOIN m USING (user_id)
WHERE m.n >= 2 AND (m.q * m.n - m.s * m.s) > 0
 AND abs((CAST(v.val_c AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n)
     / sqrt((CAST(m.q AS DOUBLE) - CAST(m.s AS DOUBLE) * m.s / m.n) / m.n))
     > 2.5""",
        "rel_events_retention": """
WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
a AS (SELECT DISTINCT e.user_id,
       date_trunc('week', f.first_ts) AS cohort_week,
       CAST(floor(epoch(e.ts - f.first_ts) / 604800.0) AS BIGINT) AS week_offset
      FROM events e JOIN f USING (user_id))
SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_offset,
 CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY 1, 2 ORDER BY 1, 2""",
        "sample_weighted": """
WITH p AS (SELECT doc_id, n_chars,
  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
       AS DOUBLE) / n_chars AS priority
 FROM documents WHERE n_chars > 0)
SELECT doc_id, n_chars, priority,
 CAST(row_number() OVER (ORDER BY priority, doc_id) AS BIGINT) AS rnk
FROM p ORDER BY priority, doc_id LIMIT 50""",
        "text_bigram_lm": """
WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t
            FROM documents),
bg AS (SELECT t[i] AS w1, t[i+1] AS w2
       FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
             FROM tk WHERE len(t) >= 2)),
c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2),
cx AS (SELECT w1, CAST(sum(n) AS BIGINT) AS ctx FROM c GROUP BY 1)
SELECT c.w1, c.w2, c.n, round(CAST(c.n AS DOUBLE) / cx.ctx, 6) AS cond_p
FROM c JOIN cx USING (w1)
ORDER BY c.n DESC, c.w1, c.w2 LIMIT 200""",
        "embed_kmeans": _KMEANS_CTES + """
SELECT vec_id, cluster, CAST(d2 AS BIGINT) AS dist2 FROM (
  SELECT vec_id, cluster, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
  FROM d3) WHERE rn = 1""",
        "embed_outliers": _KMEANS_CTES + """,
easg AS (SELECT vec_id, cluster, CAST(d2 AS BIGINT) AS dist2 FROM (
  SELECT vec_id, cluster, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
  FROM d3) WHERE rn = 1),
ecs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(dist2) AS BIGINT) AS s
        FROM easg GROUP BY 1)
SELECT a.vec_id, a.cluster, a.dist2,
       (a.dist2 * c.n > 4 * c.s) AS is_outlier
FROM easg a JOIN ecs c USING (cluster)""",
        "text_hash_features": """
WITH tk AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+'))
            AS w FROM documents)
SELECT doc_id,
  CAST(CAST(('0x' || substr(md5(w), 1, 15)) AS UBIGINT) % 64 AS BIGINT)
    AS dim_idx,
  CAST(sum(CASE WHEN CAST(('0x' || substr(md5(w), 16, 1)) AS UBIGINT) < 8
                THEN 1 ELSE -1 END) AS BIGINT) AS val
FROM tk GROUP BY 1, 2""",
        "text_bm25": """
WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t
            FROM documents),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
              CAST(sum(len(t)) AS DOUBLE) AS total FROM tk),
qd AS (SELECT DISTINCT doc_id AS query_id, term
       FROM (SELECT doc_id, unnest(t[1:8]) AS term FROM tk
             WHERE doc_id % 50 = 0)),
dtf AS (SELECT doc_id, w AS term, count(*) AS tf
        FROM (SELECT doc_id, unnest(t) AS w FROM tk)
        WHERE w IN (SELECT DISTINCT term FROM qd) GROUP BY 1, 2),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM dtf GROUP BY 1),
dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM tk),
contrib AS (
  SELECT qd.query_id, dtf.doc_id,
    CAST(floor(
      ln(1.0 + ((SELECT n_docs FROM st) - dfq.df + 0.5) / (dfq.df + 0.5))
      * (dtf.tf * (1.2 + 1.0))
      / (dtf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl
                         / ((SELECT total FROM st) / (SELECT n_docs FROM st))))
      * 1000000 + 0.5) AS BIGINT) AS cm
  FROM qd JOIN dtf USING (term)
  JOIN dfq ON dfq.term = dtf.term
  JOIN dl ON dl.doc_id = dtf.doc_id),
sc AS (SELECT query_id, doc_id, CAST(sum(cm) AS BIGINT) AS score_micro
       FROM contrib GROUP BY 1, 2 HAVING sum(cm) > 0)
SELECT query_id, doc_id,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank,
       score_micro
FROM sc QUALIFY rank <= 10""",
        "text_bigram_score": """
WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t
            FROM documents),
bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
       FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
             FROM tk WHERE len(t) >= 2)),
c AS (SELECT w1, w2, count(*) AS n FROM bg GROUP BY 1, 2),
cx AS (SELECT w1, sum(n) AS ctx FROM c GROUP BY 1),
lp AS (SELECT w1, w2,
        -CAST(floor(-ln(CAST(n AS DOUBLE) / ctx) * 1000000 + 0.5) AS BIGINT)
          AS lpm
       FROM c JOIN cx USING (w1)),
db AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS nd
       FROM bg GROUP BY 1, 2, 3),
sc AS (SELECT doc_id, sum(nd) AS nb, sum(nd * lpm) AS s
       FROM db JOIN lp USING (w1, w2) GROUP BY 1)
SELECT d.doc_id, CAST(coalesce(sc.nb, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(sc.s, 0) AS BIGINT) AS score_micro
FROM documents d LEFT JOIN sc USING (doc_id)""",
        "text_entropy": """
WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t
            FROM documents),
nt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM tk),
wc AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS c
       FROM (SELECT doc_id, unnest(t) AS w FROM tk) GROUP BY 1, 2),
e AS (SELECT wc.doc_id, CAST(count(*) AS BIGINT) AS n_types,
       -sum((c / nt.n_tokens) * log2(c / nt.n_tokens)) AS h
      FROM wc JOIN nt ON nt.doc_id = wc.doc_id GROUP BY 1)
SELECT nt.doc_id, nt.n_tokens,
 CAST(coalesce(e.n_types, 0) AS BIGINT) AS n_types,
 round(coalesce(e.h, 0), 6) AS entropy,
 round(CASE WHEN nt.n_tokens > 0
       THEN CAST(coalesce(e.n_types, 0) AS DOUBLE) / nt.n_tokens
       ELSE 0 END, 6) AS ttr
FROM nt LEFT JOIN e ON e.doc_id = nt.doc_id""",
        "rel_customers_no_orders": """
SELECT c_custkey, c_name,
 CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS acctbal_c
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')""",
        "rel_order_ranks": """
WITH r AS (SELECT o_custkey, o_orderkey,
            CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_c
           FROM orders),
w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY price_c DESC, o_orderkey) AS rnk
      FROM r)
SELECT o_custkey, o_orderkey, price_c, CAST(rnk AS BIGINT) AS rnk
FROM w WHERE rnk <= 3""",
        # the ranked-window quartet; default RANGE frame of the running
        # count(*) is peers-inclusive = cnt(price <= mine); ppm ratios in
        # integer floor division exactly as the engine computes them
        "rel_order_percentiles": """
WITH r AS (SELECT o_custkey, o_orderkey,
            CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_c
           FROM orders),
w AS (SELECT *,
       CAST(rank() OVER (PARTITION BY o_custkey
                         ORDER BY price_c) AS BIGINT) AS rnk,
       CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n,
       CAST(count(*) OVER (PARTITION BY o_custkey
                           ORDER BY price_c) AS BIGINT) AS cle,
       CAST(ntile(4) OVER (PARTITION BY o_custkey
                           ORDER BY price_c, o_orderkey) AS BIGINT) AS q4
      FROM r)
SELECT o_custkey, o_orderkey, price_c, rnk, q4,
 CASE WHEN n = 1 THEN 0
      ELSE ((rnk - 1) * 1000000) // (n - 1) END AS pct_rank_ppm,
 (cle * 1000000) // n AS cume_ppm
FROM w""",
        "rel_quantity_median": """
SELECT l_returnflag,
 median(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS median_qty_c,
 CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY 1""",
        "rel_quantity_mode": """
WITH qh AS (SELECT l_returnflag,
             CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) AS qty_c,
             CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1, 2),
r AS (SELECT *,
       row_number() OVER (PARTITION BY l_returnflag
                          ORDER BY n DESC, qty_c) AS rn,
       sum(n) OVER (PARTITION BY l_returnflag) AS tot
      FROM qh)
SELECT l_returnflag, qty_c AS mode_qty_c, n AS n_mode,
 CAST(tot AS BIGINT) AS n_rows
FROM r WHERE rn = 1""",
        "rel_quantity_quartiles": """
WITH qh AS (SELECT l_returnflag,
             CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) AS qty_c,
             count(*) AS n
            FROM lineitem GROUP BY 1, 2),
qc AS (SELECT *,
        sum(n) OVER (PARTITION BY l_returnflag ORDER BY qty_c) AS cum,
        sum(n) OVER (PARTITION BY l_returnflag) AS tot
       FROM qh)
SELECT l_returnflag,
 CAST(min(CASE WHEN cum >= ceil(tot * 0.25) THEN qty_c END) AS BIGINT) AS p25_qty_c,
 CAST(min(CASE WHEN cum >= ceil(tot * 0.5) THEN qty_c END) AS BIGINT) AS p50_qty_c,
 CAST(min(CASE WHEN cum >= ceil(tot * 0.75) THEN qty_c END) AS BIGINT) AS p75_qty_c,
 CAST(min(tot) AS BIGINT) AS n_rows
FROM qc GROUP BY 1""",
        "rel_events_sessions": """
WITH m AS (SELECT user_id, event_id, ts,
            CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS val_c,
            CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS snum FROM m)
SELECT user_id, CAST(snum - 1 AS BIGINT) AS session_idx,
 min(ts) AS start_ts, max(ts) AS end_ts,
 CAST(count(*) AS BIGINT) AS n_events, CAST(sum(val_c) AS BIGINT) AS sum_value_c
FROM s GROUP BY user_id, snum""",
        "rel_events_asof": """
WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
           FROM orders GROUP BY o_custkey, o_orderdate)
SELECT e.event_id, e.user_id, e.ts,
       CAST(o.o_orderkey AS DOUBLE) AS o_orderkey, o.o_orderdate
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""",
        "rel_events_range": """
SELECT a.event_id, a.user_id,
       CAST(count(b.event_id) AS BIGINT) AS n_follow
FROM events a LEFT JOIN events b
  ON b.user_id = a.user_id AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 6 HOUR
GROUP BY 1, 2""",
        "rel_lineitem_supplier": """
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
 CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT))
      AS BIGINT) AS revenue_c,
 CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_suppkey, s.s_name""",
        "rel_orders_by_nation": """
SELECT n.n_name AS n_name, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name""",
        "text_bpe_merges": """
WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
             FROM documents),
ch AS (SELECT w, regexp_extract_all(w, '.') AS cs FROM tok),
pr AS (SELECT unnest(list_transform(range(1, CAST(len(cs) AS BIGINT)),
        i -> list_extract(cs, i) || list_extract(cs, i + 1))) AS pair
       FROM ch WHERE len(cs) >= 2)
SELECT pair, CAST(count(*) AS BIGINT) AS n
FROM pr GROUP BY 1 ORDER BY n DESC, pair LIMIT 50""",
        "text_dup_spans": """
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
           FROM documents),
n AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS nw FROM w),
g0 AS (SELECT doc_id,
        array_to_string(ws[CAST(i AS BIGINT):CAST(i + 4 AS BIGINT)], ' ') AS gram
       FROM (SELECT doc_id, ws, unnest(range(1, nw - 3)) AS i FROM n)),
g AS (SELECT DISTINCT doc_id, gram FROM g0),
dfq AS (SELECT gram, count(*) AS df FROM g GROUP BY 1),
per_doc AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN dfq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_grams
            FROM g JOIN dfq USING (gram) GROUP BY 1)
SELECT d.doc_id, COALESCE(p.n_grams, 0) AS n_grams,
 COALESCE(p.n_dup_grams, 0) AS n_dup_grams,
 round(CASE WHEN COALESCE(p.n_grams, 0) > 0
            THEN CAST(p.n_dup_grams AS DOUBLE) / p.n_grams ELSE 0.0 END, 6)
   AS dup_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)""",
        "text_clean": f"""
WITH s AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
           FROM documents),
f AS (SELECT doc_id, toks,
       list_filter(toks, x -> NOT list_contains({_STOP_EN_SQL}, x)) AS kept
      FROM s)
SELECT doc_id, array_to_string(kept, ' ') AS clean_text,
 CAST(len(toks) - len(kept) AS BIGINT) AS n_removed
FROM f""",
        "doc_chunks": """
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
           FROM documents),
n AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS nw FROM w),
g AS (SELECT doc_id, ws, nw, unnest(range(0, nw, 24)) AS start FROM n)
SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_idx,
 CAST(least(start + 32, nw) - start AS BIGINT) AS n_words,
 array_to_string(ws[CAST(start + 1 AS BIGINT):CAST(least(start + 32, nw) AS BIGINT)],
                 ' ') AS chunk_text
FROM g""",
        "sample_stratified": """
WITH h AS (SELECT doc_id, lang,
  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
       % 1000 AS BIGINT) AS bucket
 FROM documents)
SELECT doc_id, lang, bucket FROM h
WHERE bucket < CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250
                         WHEN 'es' THEN 250 WHEN 'fr' THEN 100
                         WHEN 'zh' THEN 100 ELSE 50 END""",
        "embed_quantize": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
m AS (SELECT vec_id, emb,
        sqrt(list_sum(list_transform(emb, x -> x * x))) AS norm,
        CASE WHEN list_max(list_transform(emb, x -> abs(x))) = 0 THEN 0.0
             ELSE 127.0 / list_max(list_transform(emb, x -> abs(x))) END AS scale
      FROM e)
SELECT vec_id, round(norm, 6) AS norm, round(scale, 6) AS scale,
 array_to_string(list_transform(emb, x -> CAST(round(x * scale) AS BIGINT)), ',')
   AS q_csv
FROM m""",
        # quantization recall audit: exact float top-k vs int8-quantized
        # top-k; quantized dots/norms are exact integers so the float ranks
        # match the engine bit-for-bit (see embed_quantize_eval_ds)
        "sample_coreset": _coreset_sql(),
        "embed_quantize_eval": """
WITH qe AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings),
qm AS (SELECT vec_id, emb,
        CASE WHEN list_max(list_transform(emb, x -> abs(x))) = 0 THEN 0.0
             ELSE 127.0 / list_max(list_transform(emb, x -> abs(x))) END
          AS scale
       FROM qe),
qq AS (SELECT vec_id,
        list_transform(emb, x -> CAST(round(x * scale) AS DOUBLE)) AS q
       FROM qm),
qn AS (SELECT vec_id, q,
        sqrt(list_sum(list_transform(q, x -> x * x))) AS nrm FROM qq),
xs AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                               CAST(e.embedding AS DOUBLE[])) AS s
       FROM embeddings q, embeddings e
       WHERE q.vec_id < 4 AND e.vec_id <> q.vec_id),
xr AS (SELECT query_id, neighbor_id,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY s DESC, neighbor_id) AS rk FROM xs),
xt AS (SELECT query_id, neighbor_id FROM xr WHERE rk <= 10),
qs AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0.0
             ELSE list_inner_product(a.q, b.q) / (b.nrm * a.nrm) END AS s
       FROM qn a, qn b WHERE a.vec_id < 4 AND b.vec_id <> a.vec_id),
qr AS (SELECT query_id, neighbor_id,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY s DESC, neighbor_id) AS rk FROM qs),
qt AS (SELECT query_id, neighbor_id FROM qr WHERE rk <= 10)
SELECT x.query_id, CAST(10 AS BIGINT) AS k,
 CAST(count(q.neighbor_id) AS BIGINT) AS n_overlap,
 CAST(FLOOR(count(q.neighbor_id) * 1000000.0 / 10 + 0.5) AS BIGINT)
   AS recall_ppm
FROM xt x LEFT JOIN qt q USING (query_id, neighbor_id)
GROUP BY x.query_id""",
        "dedup_embed_clusters": """
WITH RECURSIVE e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                      FROM embeddings WHERE vec_id % 5 = 0),
p AS (SELECT a.vec_id AS va, b.vec_id AS vb FROM e0 a JOIN e0 b
      ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.emb, b.emb) >= 0.3),
e AS (SELECT va AS a, vb AS b FROM p UNION SELECT vb, va FROM p),
n AS (SELECT DISTINCT a AS node FROM e),
reach(node, r) AS (
  SELECT node, node FROM n
  UNION
  SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.node)
SELECT node AS vec_id, CAST(min(r) AS BIGINT) AS component
FROM reach GROUP BY node""",
        "dedup_simhash_clusters": _simhash_pair_ctes().replace(
            "\nWITH ", "\nWITH RECURSIVE ", 1) + """,
e AS (SELECT doc_a AS a, doc_b AS b FROM p
      UNION SELECT doc_b, doc_a FROM p),
n AS (SELECT DISTINCT a AS node FROM e),
reach(node, r) AS (
  SELECT node, node FROM n
  UNION
  SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.node)
SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS component
FROM reach GROUP BY node""",
        "dedup_clusters": _minhash_pair_ctes().replace(
            "\nWITH ", "\nWITH RECURSIVE ", 1) + """,
e AS (SELECT doc_a AS a, doc_b AS b FROM p
      UNION SELECT doc_b, doc_a FROM p),
n AS (SELECT DISTINCT a AS node FROM e),
reach(node, r) AS (
  SELECT node, node FROM n
  UNION
  SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.node)
SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS component
FROM reach GROUP BY node""",
        "text_tfidf": """
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
             FROM documents),
tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.word,
       CAST(tf.tf AS DOUBLE) * ln(n / CAST(df AS DOUBLE)) AS score
      FROM tf JOIN dfreq USING (word) CROSS JOIN nd),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, word) AS rk FROM s)
SELECT doc_id, word AS top_term, round(score, 6) AS tfidf FROM r WHERE rk = 1""",
        "text_postings": """
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
             FROM documents),
tf AS (SELECT word, doc_id, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY word
                                   ORDER BY tf DESC, doc_id) AS rnk FROM tf),
d AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)
SELECT d.word AS word, d.df AS df,
 string_agg(r.doc_id || ':' || r.tf, ',' ORDER BY r.tf DESC, r.doc_id) AS postings
FROM d JOIN r ON r.word = d.word AND r.rnk <= 50
GROUP BY 1, 2""",
        "text_bpe_tokens": _bpe_tokens_select(),
        "rel_events_sliding": """
WITH b AS (SELECT event_type,
            CAST(FLOOR(CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0) AS BIGINT) AS hb,
            CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS val_c
           FROM events),
e AS (SELECT event_type, unnest([hb - 1, hb]) AS window_start, val_c FROM b)
SELECT event_type, window_start,
 CAST(SUM(val_c) AS BIGINT) AS sum_value_c,
 CAST(count(*) AS BIGINT) AS n_events
FROM e GROUP BY 1, 2""",
        "text_distinct_sketch": """
WITH w AS (SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
           FROM documents),
h AS (SELECT CAST(CAST(('0x' || substr(md5(word), 1, 15)) AS UBIGINT) AS BIGINT) AS h
      FROM w),
k AS (SELECT h FROM h ORDER BY h LIMIT 64)
SELECT CAST(count(*) AS BIGINT) AS n_k,
 CAST(max(h) AS BIGINT) AS kth_hash,
 round(CASE WHEN count(*) = 64
            THEN (count(*) - 1) * 1152921504606846976.0 / max(h)
            ELSE CAST(count(*) AS DOUBLE) END, 3) AS est_distinct
FROM k""",
        "rel_region_part_revenue": """
SELECT r.r_name AS r_name, p.p_brand AS p_brand,
 CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT))
      AS BIGINT) AS revenue_c,
 CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, p.p_brand""",
        "docs_curated": _minhash_pair_ctes().replace(
            "\nWITH ", "\nWITH RECURSIVE ", 1) + """,
e AS (SELECT doc_a AS a, doc_b AS b FROM p
      UNION SELECT doc_b, doc_a FROM p),
nn AS (SELECT DISTINCT a AS node FROM e),
reach(node, r) AS (
  SELECT node, node FROM nn
  UNION
  SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.node),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
rt AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
       FROM documents),
rn AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
              CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct FROM rt),
rg AS (SELECT doc_id,
        CASE WHEN len(toks) >= 2 THEN
          list_transform(range(1, CAST(len(toks) AS BIGINT)),
                         i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1))
        ELSE [] END AS grams
       FROM rt),
rkeep AS (SELECT rn.doc_id,
   (round(CASE WHEN len(grams) > 0
          THEN 1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE)
          ELSE 0 END, 6) <= 0.05
    AND round(CASE WHEN n_tokens > 0
          THEN n_distinct / CAST(n_tokens AS DOUBLE) ELSE 0 END, 6) >= 0.3)
   AS rep_keep
  FROM rn JOIN rg USING (doc_id)),
cg AS (SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, CAST(len(toks) AS BIGINT) - 6),
        i -> array_to_string(toks[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ')))) AS gram
       FROM rt WHERE len(toks) >= 8),
cbench AS (SELECT DISTINCT gram FROM cg WHERE doc_id % 50 = 0),
chits AS (SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_hits
          FROM cg JOIN cbench USING (gram) GROUP BY cg.doc_id)
SELECT d.doc_id, rkeep.rep_keep,
  (COALESCE(chits.n_hits, 0) > 0 AND d.doc_id % 50 != 0) AS contaminated,
  (d.doc_id % 50 = 0) AS is_benchmark,
  (d.doc_id IN (SELECT node FROM comp WHERE node <> component)) AS dedup_drop,
  (rkeep.rep_keep
   AND NOT (COALESCE(chits.n_hits, 0) > 0 AND d.doc_id % 50 != 0)
   AND d.doc_id % 50 != 0
   AND d.doc_id NOT IN (SELECT node FROM comp WHERE node <> component)) AS kept
FROM documents d
JOIN rkeep ON d.doc_id = rkeep.doc_id
LEFT JOIN chits ON d.doc_id = chits.doc_id""",
        # token-weighted dedup impact per source (the survivors drop rule
        # rolled up in tokens, exact integer ppm)
        "docs_dedup_gain": _minhash_pair_ctes().replace(
            "\nWITH ", "\nWITH RECURSIVE ", 1) + """,
e AS (SELECT doc_a AS a, doc_b AS b FROM p
      UNION SELECT doc_b, doc_a FROM p),
n AS (SELECT DISTINCT a AS node FROM e),
reach(node, r) AS (
  SELECT node, node FROM n
  UNION
  SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.node),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
drp AS (SELECT node FROM comp WHERE node <> component),
dtk AS (SELECT doc_id, source,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
           AS ntok
        FROM documents),
dj AS (SELECT t.source, t.ntok,
        CASE WHEN d2.node IS NULL THEN 0 ELSE 1 END AS dr
       FROM dtk t LEFT JOIN drp d2 ON t.doc_id = d2.node)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
 CAST(sum(dr) AS BIGINT) AS n_dropped,
 CAST(sum(ntok) AS BIGINT) AS n_tokens,
 CAST(sum(dr * ntok) AS BIGINT) AS n_tokens_dropped,
 CASE WHEN sum(ntok) > 0
      THEN CAST(FLOOR(sum(dr * ntok) * 1000000.0 / sum(ntok) + 0.5)
                AS BIGINT)
      ELSE CAST(0 AS BIGINT) END AS tokens_dropped_ppm
FROM dj GROUP BY 1""",
        "dedup_survivors": _minhash_pair_ctes().replace(
            "\nWITH ", "\nWITH RECURSIVE ", 1) + """,
e AS (SELECT doc_a AS a, doc_b AS b FROM p
      UNION SELECT doc_b, doc_a FROM p),
n AS (SELECT DISTINCT a AS node FROM e),
reach(node, r) AS (
  SELECT node, node FROM n
  UNION
  SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.node),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM comp WHERE node <> component)""",
    }


# verbatim PG_RE grammar (migrate-bvm.py:14) as a DuckDB regex; the
# apostrophe duplicate-mark must be doubled inside a SQL string literal
PGRE_SQL = (r"^(?P<folionum>x|\d+)(?P<duplind>'*)(?P<side>[ab])"
            r"(?P<certaintyind>\??)(?P<detailind>\(d\d*\))?").replace("'", "''")


def bvm_oracle_sql(sf_dir_or_tag: str) -> dict[str, str]:
    """SQL twins of the BVM reconciliation (stages/bvm.py ↔
    migrate-bvm.py:189-356). The finalimages corner (:308-311) requires
    duplicate filenames inside one image list — never present in the
    fixtures (unit-tested in Python instead), so the SQL omits that branch.
    """
    pag = fixtures.aux_path(sf_dir_or_tag, "pagination")
    il = fixtures.aux_path(sf_dir_or_tag, "image_list")
    base = f"""WITH pag AS (SELECT vol_id, idx, pagination, psection, file
  FROM read_parquet('{pag}')),
il AS (SELECT vol_id, pos, filename FROM read_parquet('{il}')),
p1 AS (SELECT *,
  starts_with(vol_id, 'IGS') AS simple,
  (file IS NOT NULL AND NOT contains(file,'missing')
   AND strpos(file,'::')=0) AS badref,
  -- '::'-less refs keep the reference's dblcolidx=-1 slices
  -- (fname=file[1:], igname=file[4:-1]; migrate-bvm.py:267-271)
  CASE WHEN file IS NULL OR contains(file,'missing') THEN NULL
       WHEN strpos(file,'::')=0 THEN substr(file, 2)
       ELSE substr(file, strpos(file,'::')+2) END AS fname,
  CASE WHEN file IS NULL OR contains(file,'missing') THEN NULL
       WHEN strpos(file,'::')=0 THEN substr(file, 5, length(file)-5)
       ELSE substr(file, 5, strpos(file,'::')-5) END AS igname
  FROM pag),
vols AS (SELECT vol_id, count(DISTINCT psection) > 1 AS multi
  FROM pag GROUP BY vol_id),
valid_use AS (SELECT p.vol_id, p.idx, p.fname FROM p1 p
  JOIN il i ON i.vol_id = p.vol_id AND i.filename = p.fname
  WHERE p.igname = p.vol_id),
seen AS (SELECT DISTINCT vol_id, fname FROM valid_use),
il2 AS (SELECT i.*, (s.fname IS NOT NULL) AS is_seen FROM il i
  LEFT JOIN seen s ON s.vol_id = i.vol_id AND s.fname = i.filename),
il3 AS (SELECT *, last_value(CASE WHEN is_seen THEN filename END IGNORE NULLS)
  OVER (PARTITION BY vol_id ORDER BY pos
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lastseen
  FROM il2)"""
    manifests = base + """,
pagemit AS (SELECT p1.*, v.multi,
  row_number() OVER (PARTITION BY p1.vol_id ORDER BY idx) AS rn
  FROM p1 JOIN vols v USING (vol_id)),
lead_rows AS (SELECT vol_id, filename, pos,
  (pos < 3) AS hidden, CASE WHEN pos < 3 THEN 'T0005' ELSE '' END AS tags
  FROM il3 WHERE NOT is_seen AND lastseen IS NULL),
inserts AS (SELECT vol_id, pos, filename, lastseen AS anchor
  FROM il3 WHERE NOT is_seen AND lastseen IS NOT NULL),
emitted AS (
  SELECT vol_id, filename, CAST(NULL AS VARCHAR) AS pagination,
   CAST(NULL AS VARCHAR) AS psection, CAST(NULL AS VARCHAR) AS imggroup,
   hidden, tags, 0 AS phase, 0 AS rn, 0 AS sub, pos AS subpos
  FROM lead_rows
  UNION ALL
  -- bad (''::''-less) refs emit a pagination-only row: the reference's
  -- third pass sets filename/imggroup only when dblcolidx > -1 (:337-345)
  SELECT vol_id, CASE WHEN badref THEN NULL ELSE fname END AS filename,
   pagination,
   CASE WHEN multi AND psection <> '' THEN psection END AS psection,
   CASE WHEN NOT badref AND fname IS NOT NULL AND igname <> vol_id
        THEN igname END AS imggroup,
   FALSE AS hidden,
   concat_ws(',',
     CASE WHEN contains(pagination, 'd') THEN 'T0016' END,
     CASE WHEN file IS NOT NULL AND contains(file, 'missing') THEN 'T0020' END
   ) AS tags,
   1 AS phase, rn, 0 AS sub, 0 AS subpos
  FROM pagemit
  UNION ALL
  SELECT e.vol_id, i.filename, NULL, NULL, NULL, TRUE AS hidden, '' AS tags,
   1 AS phase, e.rn, 1 AS sub, i.pos AS subpos
  FROM pagemit e JOIN inserts i
    ON i.vol_id = e.vol_id AND i.anchor = e.fname AND NOT e.badref)
SELECT vol_id,
 CAST(row_number() OVER (PARTITION BY vol_id
      ORDER BY phase, rn, sub, subpos) - 1 AS BIGINT) AS seq,
 filename, pagination, psection, imggroup, hidden, tags
FROM emitted"""
    quarantine = base + f""",
q1 AS (SELECT p1.*,
  lag(pagination) OVER (PARTITION BY vol_id ORDER BY idx) AS lastpg,
  CASE WHEN simple THEN regexp_matches(pagination, '^\\d+$')
       ELSE regexp_matches(pagination, '{PGRE_SQL}') END AS ok,
  regexp_extract(pagination, '{PGRE_SQL}',
    ['folionum','duplind','side','certaintyind','detailind']) AS cur,
  count(*) OVER (PARTITION BY vol_id, psection, pagination ORDER BY idx
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_same
  FROM p1),
q2 AS (SELECT q1.*,
  lag(ok) OVER (PARTITION BY vol_id ORDER BY idx) AS last_ok,
  lag(cur) OVER (PARTITION BY vol_id ORDER BY idx) AS lst
  FROM q1),
q3 AS (SELECT *,
  -- comparepg(lastpg, pagination) < 0, i.e. strictly increasing
  (NOT simple AND ok AND last_ok
   AND lst['folionum'] <> 'x' AND cur['folionum'] <> 'x'
   AND (TRY_CAST(lst['folionum'] AS BIGINT) < TRY_CAST(cur['folionum'] AS BIGINT)
        OR (TRY_CAST(lst['folionum'] AS BIGINT) = TRY_CAST(cur['folionum'] AS BIGINT)
            AND (lst['duplind'] < cur['duplind']
                 OR (lst['duplind'] = cur['duplind']
                     AND lst['side'] < cur['side']))))) AS strictly_less
  FROM q2),
in_list AS (SELECT p.vol_id, p.idx, p.fname, p.file, p.igname,
  (i.filename IS NOT NULL) AS listed,
  CASE WHEN i.filename IS NOT NULL AND p.igname = p.vol_id THEN
    row_number() OVER (PARTITION BY p.vol_id,
      CASE WHEN i.filename IS NOT NULL AND p.igname = p.vol_id
           THEN p.fname END ORDER BY p.idx) END AS use_rank
  FROM p1 p LEFT JOIN il i ON i.vol_id = p.vol_id AND i.filename = p.fname
  WHERE p.fname IS NOT NULL)
SELECT vol_id, CAST(idx AS BIGINT) AS idx, 'invalid_pg' AS rule,
       pagination AS detail
FROM q3 WHERE NOT ok
UNION ALL
SELECT vol_id, CAST(idx AS BIGINT), 'pg_order',
       pagination || ' before ' || lastpg
FROM q3 WHERE NOT simple AND ok AND lastpg IS NOT NULL AND NOT strictly_less
UNION ALL
SELECT vol_id, CAST(idx AS BIGINT), 'pg_duplicate', pagination
FROM q3 WHERE prior_same >= 1
UNION ALL
SELECT vol_id, CAST(idx AS BIGINT), 'bad_file_ref', file
FROM p1 WHERE badref
UNION ALL
SELECT vol_id, CAST(idx AS BIGINT), 'wrong_imggroup', file
FROM in_list WHERE igname <> vol_id
UNION ALL
SELECT vol_id, CAST(idx AS BIGINT), 'file_not_in_list', fname
FROM in_list WHERE igname = vol_id AND NOT listed
UNION ALL
SELECT vol_id, CAST(idx AS BIGINT), 'file_used_twice', fname
FROM in_list WHERE use_rank > 1"""
    return {"bvm_manifests": manifests, "bvm_quarantine": quarantine}


def _nt_esc(col: str) -> str:
    """N-Triples escape chain (Nquads.php:52-124) for the characters that can
    occur in engine data: backslash FIRST, then quote, tab, LF, CR. (The
    \\uXXXX branch for other control chars is covered by the Python golden
    tests; fixture data never contains them, so the SQL twin stays exact.)"""
    e = f"replace({col}, chr(92), chr(92)||chr(92))"
    e = f"replace({e}, chr(34), chr(92)||chr(34))"
    e = f"replace({e}, chr(9), chr(92)||'t')"
    e = f"replace({e}, chr(10), chr(92)||'n')"
    e = f"replace({e}, chr(13), chr(92)||'r')"
    return e


def _ntriples_select(full_union: str, with_graph: bool = False) -> str:
    """Assemble the same N-Triples (or, with the graph term, N-Quads) lines
    as functions/ntriples.lines_table: object is a resource <uri> for the
    OBJ_URI_PREDS predicates, else a literal with @lang / ^^<dt> suffix."""
    from .functions.ntriples import OBJ_URI_PREDS

    preds = ", ".join("'" + p + "'" for p in sorted(OBJ_URI_PREDS))
    tail = (f"' <'||{_nt_esc('graph')}||'> .'" if with_graph else "' .'")
    return f"""SELECT '<'||{_nt_esc('subj')}||'> <'||{_nt_esc('pred')}||'> '||
 CASE WHEN pred IN ({preds}) THEN '<'||{_nt_esc('obj')}||'>'
      ELSE '"'||{_nt_esc('obj')}||'"'||
        CASE WHEN obj_lang <> '' THEN '@'||{_nt_esc('obj_lang')}
             WHEN obj_dt <> '' THEN '^^<'||{_nt_esc('obj_dt')}||'>'
             ELSE '' END
 END||{tail} AS line
FROM (
{full_union}
) nt_all"""


def _adjacency_select(full_union: str) -> str:
    """kg_adjacency oracle: per-subject edge count + md5 of the sorted
    edge list (fields joined by US=chr(31), edges by RS=chr(30)) — the same
    digest pipelines/kg.kg_adjacency_ds computes. Byte order of UTF-8
    preserves code-point order, so DuckDB's binary ORDER BY matches
    Python's sorted()."""
    edge = ("coalesce(pred,'')||chr(31)||coalesce(obj,'')||chr(31)||"
            "coalesce(obj_lang,'')||chr(31)||coalesce(obj_dt,'')||chr(31)||"
            "coalesce(graph,'')")
    return f"""SELECT subj, CAST(count(*) AS BIGINT) AS n_edges,
 md5(string_agg({edge}, chr(30) ORDER BY {edge})) AS edges_md5
FROM (
{full_union}
) adj_all GROUP BY subj"""


def _degrees_select(full_union: str) -> str:
    """kg_degrees oracle: out-degree by subject, in-degree by resource
    object (OBJ_URI_PREDS only), full-outer merged per node."""
    from .functions.ntriples import OBJ_URI_PREDS

    preds = ", ".join("'" + p + "'" for p in sorted(OBJ_URI_PREDS))
    return f"""SELECT coalesce(o.node, i.node) AS node,
 CAST(coalesce(o.out_deg, 0) AS BIGINT) AS out_deg,
 CAST(coalesce(i.in_deg, 0) AS BIGINT) AS in_deg
FROM (SELECT subj AS node, count(*) AS out_deg FROM (
{full_union}
) a GROUP BY subj) o
FULL OUTER JOIN (SELECT obj AS node, count(*) AS in_deg FROM (
{full_union}
) b WHERE pred IN ({preds}) GROUP BY obj) i
ON o.node = i.node"""


def _dialog_acts_select() -> str:
    """conv_dialog_acts oracle: per-turn act classification (trailing '?'
    or interrogative first word → question; imperative first word →
    command; else statement) rolled up per conversation. Lexicons inlined
    from functions.text so both sides share one source of truth."""
    from .functions.text import DIALOG_C_WORDS, DIALOG_Q_WORDS

    qw = ", ".join(f"'{x}'" for x in sorted(DIALOG_Q_WORDS))
    cw = ", ".join(f"'{x}'" for x in sorted(DIALOG_C_WORDS))
    return f"""
, da AS (SELECT conv_id,
  CASE WHEN regexp_matches(COALESCE(text, ''), '\\?[ \\t\\r\\n]*$')
         OR lower(COALESCE(regexp_extract(COALESCE(text, ''),
                                          '[A-Za-z]+'), ''))
            IN ({qw}) THEN 'question'
       WHEN lower(COALESCE(regexp_extract(COALESCE(text, ''),
                                          '[A-Za-z]+'), ''))
            IN ({cw}) THEN 'command'
       ELSE 'statement' END AS act
  FROM t)
SELECT conv_id,
 CAST(sum(CASE WHEN act = 'question' THEN 1 ELSE 0 END) AS BIGINT)
   AS n_question,
 CAST(sum(CASE WHEN act = 'command' THEN 1 ELSE 0 END) AS BIGINT)
   AS n_command,
 CAST(sum(CASE WHEN act = 'statement' THEN 1 ELSE 0 END) AS BIGINT)
   AS n_statement,
 CAST(count(*) AS BIGINT) AS n_turns
FROM da GROUP BY 1"""


def _kcore_select(full_union: str, k: int = 4, rounds: int = 24) -> str:
    """kg_kcore oracle: k-core decomposition by unrolled peel rounds (same
    unrolling rationale as _pagerank_select — peel-until-fixpoint is not a
    single-self-reference recursive CTE). Round r recomputes every node's
    degree restricted to round r-1's survivors and keeps deg >= k; the
    engine RAISES if it needs more than ``rounds`` iterations, so a
    converged engine result always equals kd<rounds> here (fixture peel
    depth is 7; 24 is margin)."""
    from .functions.ntriples import OBJ_URI_PREDS

    preds = ", ".join("'" + p + "'" for p in sorted(OBJ_URI_PREDS))
    sql = f""", tr AS MATERIALIZED (
{full_union}
),
kce0 AS MATERIALIZED (SELECT DISTINCT subj AS a, obj AS b FROM tr
  WHERE pred IN ({preds}) AND subj <> obj),
kce AS MATERIALIZED (SELECT DISTINCT a, b FROM
  (SELECT a, b FROM kce0 UNION ALL SELECT b, a FROM kce0)),
kc0 AS (SELECT DISTINCT a AS node FROM kce)"""
    prev = "kc0"
    # every round CTE is MATERIALIZED: kd{r} references kc{r-1} twice, so
    # inlining would re-evaluate the whole chain per reference (2^rounds)
    for r in range(1, rounds + 1):
        sql += f""",
kd{r} AS MATERIALIZED (SELECT e.a AS node, CAST(count(*) AS BIGINT) AS d
  FROM kce e JOIN {prev} x ON x.node = e.a JOIN {prev} y ON y.node = e.b
  GROUP BY 1),
kc{r} AS MATERIALIZED (SELECT node FROM kd{r} WHERE d >= {k})"""
        prev = f"kc{r}"
    return sql + f"""
SELECT node, d AS deg_in_core FROM kd{rounds} WHERE d >= {k}"""


def _pagerank_select(full_union: str, iters: int = 5) -> str:
    """kg_pagerank oracle: fixed-iteration PageRank in integer micro-units
    (×10^12) — r0 = SCALE // N, contribution (r*85) // (100*outdeg), next
    rank = (15*SCALE) // (100*N) + Σ contributions. All-integer arithmetic
    is associative, so this matches the distributed engine bit-for-bit.
    Unrolled CTEs (DuckDB's recursive CTE allows only one self-reference,
    which can't express join-with-ranks + keep-all-nodes in one term). Every
    CTE is AS MATERIALIZED: each pr{{i}} references pre/prn/pro and
    pr{{i-1}}, so default inlining re-expands the full triple union once per
    reference — exponential plan growth that OOMs DuckDB at sf0.001."""
    from .functions.ntriples import OBJ_URI_PREDS

    preds = ", ".join("'" + p + "'" for p in sorted(OBJ_URI_PREDS))
    s = f""",
pre AS MATERIALIZED (SELECT subj AS src, obj AS dst FROM (
{full_union}
) WHERE pred IN ({preds})),
prn AS MATERIALIZED (SELECT DISTINCT node FROM
        (SELECT src AS node FROM pre UNION ALL SELECT dst FROM pre)),
prc AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM prn),
pro AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
        FROM pre GROUP BY 1),
pr0 AS MATERIALIZED (SELECT node,
        CAST(1000000000000 // prc.n AS BIGINT) AS r
        FROM prn CROSS JOIN prc)"""
    for i in range(1, iters + 1):
        s += f""",
pr{i} AS MATERIALIZED (
 SELECT nd.node,
  CAST((15 * 1000000000000) // (100 * prc.n) AS BIGINT)
   + COALESCE(c.contrib, 0) AS r
 FROM prn nd CROSS JOIN prc
 LEFT JOIN (SELECT pre.dst,
             CAST(SUM((p.r * 85) // (100 * pro.outdeg)) AS BIGINT) AS contrib
            FROM pre JOIN pr{i - 1} p ON pre.src = p.node
            JOIN pro ON pro.src = pre.src
            GROUP BY pre.dst) c ON c.dst = nd.node)"""
    return s + f"\nSELECT node, r AS pagerank FROM pr{iters}"


def _hits_select(full_union: str, iters: int = 3) -> str:
    """kg_hits oracle: fixed-iteration HITS in int64 — raw score = exact
    integer sum over neighbors, renormalized by integer division with
    g = max(max_raw // SCALE, 1). Unrolled MATERIALIZED CTEs for the same
    plan-explosion reason as _pagerank_select; h0 = SCALE for every node."""
    from .functions.ntriples import OBJ_URI_PREDS
    from .pipelines.kg import HITS_SCALE

    preds = ", ".join("'" + p + "'" for p in sorted(OBJ_URI_PREDS))
    s = f""",
he AS MATERIALIZED (SELECT subj AS src, obj AS dst FROM (
{full_union}
) WHERE pred IN ({preds})),
hnn AS MATERIALIZED (SELECT DISTINCT node FROM
        (SELECT src AS node FROM he UNION ALL SELECT dst FROM he)),
hh0 AS MATERIALIZED (SELECT node, CAST({HITS_SCALE} AS BIGINT) AS r FROM hnn)"""
    for i in range(1, iters + 1):
        s += f""",
har{i} AS MATERIALIZED (SELECT he.dst AS node, CAST(SUM(p.r) AS BIGINT) AS r
        FROM he JOIN hh{i - 1} p ON he.src = p.node GROUP BY 1),
hag{i} AS MATERIALIZED (SELECT greatest(COALESCE(max(r), 0) // {HITS_SCALE}, 1)
        AS g FROM har{i}),
haa{i} AS MATERIALIZED (SELECT node, CAST(r // hag{i}.g AS BIGINT) AS r
        FROM har{i} CROSS JOIN hag{i}),
hhr{i} AS MATERIALIZED (SELECT he.src AS node, CAST(SUM(p.r) AS BIGINT) AS r
        FROM he JOIN haa{i} p ON he.dst = p.node GROUP BY 1),
hhg{i} AS MATERIALIZED (SELECT greatest(COALESCE(max(r), 0) // {HITS_SCALE}, 1)
        AS g FROM hhr{i}),
hh{i} AS MATERIALIZED (SELECT node, CAST(r // hhg{i}.g AS BIGINT) AS r
        FROM hhr{i} CROSS JOIN hhg{i})"""
    return s + f"""
SELECT n.node, CAST(COALESCE(h.r, 0) AS BIGINT) AS hub,
       CAST(COALESCE(a.r, 0) AS BIGINT) AS authority
FROM hnn n LEFT JOIN hh{iters} h USING (node)
LEFT JOIN haa{iters} a USING (node)"""


def _pred_paths_select(full_union: str) -> str:
    """kg_pred_paths oracle: Σ_m n1(m,p1)·n2(m,p2) — the count-then-join
    formulation, never materializing paths (the engine's exact shape)."""
    from .functions.ntriples import OBJ_URI_PREDS

    preds = ", ".join("'" + p + "'" for p in sorted(OBJ_URI_PREDS))
    return f""",
ppt AS MATERIALIZED (SELECT subj, pred, obj FROM (
{full_union}
)),
ppc1 AS (SELECT obj AS m, pred AS p1, CAST(count(*) AS BIGINT) AS n1
         FROM ppt WHERE pred IN ({preds}) GROUP BY 1, 2),
ppc2 AS (SELECT subj AS m, pred AS p2, CAST(count(*) AS BIGINT) AS n2
         FROM ppt GROUP BY 1, 2)
SELECT p1, p2, CAST(SUM(n1 * n2) AS BIGINT) AS n_paths
FROM ppc1 JOIN ppc2 USING (m) GROUP BY 1, 2"""


def _neighbor_sample_select(full_union: str) -> str:
    """kg_neighbor_sample oracle: ranked symmetric-distinct adjacency via
    row_number() ordered by (md5(src|dst), dst) — the engine's exact
    content-addressed sampling — then fanout-truncated hop-1 (seeds =
    'C:' roots) and hop-2 joins."""
    from .functions.ntriples import OBJ_URI_PREDS
    from .pipelines.kg import NS_FANOUT_1, NS_FANOUT_2, NS_SEED_PREFIX

    preds = ", ".join("'" + p + "'" for p in sorted(OBJ_URI_PREDS))
    return f""",
nse0 AS MATERIALIZED (SELECT subj AS s, obj AS d FROM (
{full_union}
) WHERE pred IN ({preds})),
nsym AS MATERIALIZED (SELECT DISTINCT src, dst FROM
        (SELECT s AS src, d AS dst FROM nse0
         UNION ALL SELECT d, s FROM nse0)),
nra AS MATERIALIZED (SELECT src, dst,
        CAST(row_number() OVER (PARTITION BY src
             ORDER BY md5(src || '|' || dst), dst) AS BIGINT) AS rank
       FROM nsym),
nh1 AS MATERIALIZED (SELECT src AS seed, CAST(1 AS BIGINT) AS hop,
        src, dst, rank
       FROM nra WHERE rank <= {NS_FANOUT_1}
        AND src LIKE '{NS_SEED_PREFIX}%')
SELECT seed, hop, src, dst, rank FROM nh1
UNION ALL
SELECT nh1.seed, CAST(2 AS BIGINT) AS hop, r.src, r.dst, r.rank
FROM nh1 JOIN nra r ON r.src = nh1.dst WHERE r.rank <= {NS_FANOUT_2}"""


def _khop_select(full_union: str, k: int = 4) -> str:
    """kg_khop oracle: depth-limited BFS from the C:* conversation roots
    over the symmetric resource graph — recursive CTE with UNION (dedup)
    and a dist < k guard, min(dist) per node. MATERIALIZED pre-CTEs for
    the same inlining-explosion reason as _pagerank_select."""
    from .functions.ntriples import OBJ_URI_PREDS

    preds = ", ".join("'" + p + "'" for p in sorted(OBJ_URI_PREDS))
    return f""",
ke0 AS MATERIALIZED (SELECT subj AS s, obj AS d FROM (
{full_union}
) WHERE pred IN ({preds})),
ke AS MATERIALIZED (SELECT s, d FROM ke0 UNION ALL SELECT d, s FROM ke0),
kseed AS MATERIALIZED (SELECT DISTINCT s AS node FROM ke WHERE s LIKE 'C:%'),
kbfs AS (SELECT node, 0 AS dist FROM kseed
 UNION
 SELECT ke.d, kbfs.dist + 1 FROM kbfs JOIN ke ON ke.s = kbfs.node
 WHERE kbfs.dist < {k})
SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM kbfs GROUP BY 1"""


def _walks_select(k: int = 4) -> str:
    """kg_walks oracle: replay the deterministic md5-addressed walks hop
    by hop — neighbor lists ordered with row_number(), the hop index
    picked by the same md5("walk|step|cur") % deg address the engine
    computes, one unrolled CTE per step (k is a small constant)."""
    parts = [""",
wdce AS MATERIALIZED (SELECT DISTINCT conv_id, entity_uri FROM linked),
wed AS MATERIALIZED (
  SELECT a.entity_uri AS e1, b.entity_uri AS e2
  FROM wdce a JOIN wdce b
    ON a.conv_id = b.conv_id AND a.entity_uri < b.entity_uri
  GROUP BY 1, 2),
wadj AS MATERIALIZED (
  SELECT e1 AS a, e2 AS b FROM wed UNION ALL SELECT e2, e1 FROM wed),
wr AS MATERIALIZED (
  SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY b) AS rn,
         count(*) OVER (PARTITION BY a) AS deg FROM wadj),
ws0 AS (SELECT DISTINCT a AS walk_id, a AS cur FROM wadj)"""]
    for i in range(k):
        parts.append(f""",
ws{i + 1} AS (SELECT s.walk_id, r.b AS cur FROM ws{i} s
  JOIN wr r ON r.a = s.cur AND r.rn = 1 + CAST(
    CAST(('0x' || substr(md5(s.walk_id || '|{i}|' || s.cur), 1, 15))
         AS UBIGINT) % CAST(r.deg AS UBIGINT) AS BIGINT))""")
    sel = "\nUNION ALL ".join(
        f"SELECT walk_id, CAST({i} AS BIGINT) AS step, cur AS node FROM ws{i}"
        for i in range(k + 1))
    return "".join(parts) + "\n" + sel


def _walk_pairs_select(k: int = 4, window: int = 2) -> str:
    """kg_walk_pairs oracle: skip-gram self-join over the replayed walks —
    (center, context) within +-window steps of the same walk, counted."""
    body = _walks_select(k)
    i = body.index("\nSELECT walk_id, CAST(0 AS BIGINT)")
    ctes, sel = body[:i], body[i + 1:]
    return f"""{ctes},
wall AS ({sel})
SELECT a.node AS center, b.node AS context,
       CAST(count(*) AS BIGINT) AS n
FROM wall a JOIN wall b ON a.walk_id = b.walk_id
 AND abs(a.step - b.step) BETWEEN 1 AND {window}
GROUP BY 1, 2"""


def _turtle_select(full_union: str) -> str:
    """kg_turtle oracle: the same canonical predicate-grouped subject blocks
    as pipelines/kg.turtle_lines_ds — nested ORDER BY string_agg (objects
    within predicate, predicates within subject; binary UTF-8 order matches
    Python sorted(), the adjacency-digest precedent)."""
    from .functions.ntriples import OBJ_URI_PREDS

    preds = ", ".join("'" + p + "'" for p in sorted(OBJ_URI_PREDS))
    return f""",
ttt AS (SELECT '<'||{_nt_esc('subj')}||'>' AS subj_t,
               '<'||{_nt_esc('pred')}||'>' AS pred_t,
 CASE WHEN pred IN ({preds}) THEN '<'||{_nt_esc('obj')}||'>'
      ELSE '"'||{_nt_esc('obj')}||'"'||
        CASE WHEN obj_lang <> '' THEN '@'||{_nt_esc('obj_lang')}
             WHEN obj_dt <> '' THEN '^^<'||{_nt_esc('obj_dt')}||'>'
             ELSE '' END
 END AS obj_t
 FROM (
{full_union}
) tt_all),
ttp AS (SELECT subj_t, pred_t,
               string_agg(obj_t, ' , ' ORDER BY obj_t) AS objs
        FROM ttt GROUP BY 1, 2)
SELECT subj_t AS subj,
       subj_t||' '||string_agg(pred_t||' '||objs, ' ; ' ORDER BY pred_t)
             ||' .' AS line
FROM ttp GROUP BY subj_t"""


def _ancestors_select(full_union: str) -> str:
    """kg_ancestors oracle: transitive closure of tr:partOf — recursive
    CTE extending each path one parent per step (depth-exact because the
    hierarchy is single-parent; the engine side doubles instead, same set)."""
    return f""",
ape AS MATERIALIZED (SELECT subj AS node, obj AS par FROM (
{full_union}
) WHERE pred = 'tr:partOf'),
panc AS (SELECT node, par AS anc, 1 AS depth FROM ape
 UNION ALL
 SELECT p.node, ape.par, p.depth + 1
 FROM panc p JOIN ape ON ape.node = p.anc)
SELECT node, anc, CAST(depth AS BIGINT) AS depth FROM panc"""


def _negative_samples_select(full_union: str) -> str:
    """kg_negative_samples oracle: the same two-level md5 (bucket, rank)
    replacement address as pipelines/kg.kg_negative_samples_ds — pool =
    DISTINCT edge endpoints bucketed by md5(node) % 64 with row_number
    ranks; each triple joins on (bucket, ih % bucket_size)."""
    from .functions.ntriples import OBJ_URI_PREDS

    preds = ", ".join("'" + p + "'" for p in sorted(OBJ_URI_PREDS))
    return f""",
nse AS MATERIALIZED (SELECT subj, pred, obj FROM (
{full_union}
) WHERE pred IN ({preds})),
nsn AS (SELECT node,
 CAST(CAST(('0x'||substr(md5(node),1,15)) AS UBIGINT) % 64 AS BIGINT) AS nb
 FROM (SELECT subj AS node FROM nse UNION SELECT obj FROM nse)),
nsr AS (SELECT node, nb,
 CAST(row_number() OVER (PARTITION BY nb ORDER BY node) - 1 AS BIGINT)
   AS rank,
 CAST(count(*) OVER (PARTITION BY nb) AS BIGINT) AS n_b FROM nsn),
nst AS (SELECT subj, pred, obj,
 CAST(CAST(('0x'||substr(md5(subj||chr(31)||pred||chr(31)||obj),1,15))
      AS UBIGINT) % 64 AS BIGINT) AS nb,
 CAST(CAST(('0x'||substr(md5(subj||chr(31)||pred||chr(31)||obj),17,15))
      AS UBIGINT) AS BIGINT) AS ih
 FROM nse)
SELECT t.subj, t.pred, t.obj, r.node AS neg_obj,
       CAST(CASE WHEN r.node = t.obj THEN 1 ELSE 0 END AS BIGINT) AS is_self
FROM nst t JOIN nsr r ON r.nb = t.nb AND r.rank = t.ih % r.n_b"""


def _dangling_select(full_union: str) -> str:
    """kg_dangling_refs oracle: objects of resource-valued predicates with
    no subject row, plus their reference counts (anti-join over the union,
    materialized once)."""
    from .functions.ntriples import OBJ_URI_PREDS

    preds = ", ".join("'" + p + "'" for p in sorted(OBJ_URI_PREDS))
    return f""",
dall AS MATERIALIZED (
{full_union}
),
drefs AS (SELECT obj AS node, CAST(count(*) AS BIGINT) AS n_refs
          FROM dall WHERE pred IN ({preds}) GROUP BY 1)
SELECT d.node, d.n_refs
FROM drefs d
LEFT JOIN (SELECT DISTINCT subj FROM dall) s ON s.subj = d.node
WHERE s.subj IS NULL"""


def _clean_text_select() -> str:
    """conv_clean_text oracle: per-family marker counts on the raw text
    (families never overlap there), then sequential regexp_replace — both
    sides run RE2 (Arrow kernels ↔ DuckDB), so match semantics agree."""
    from .pipelines.kg import MARKER_PATTERNS

    cleaned = "COALESCE(text, '')"
    counts = []
    for p in MARKER_PATTERNS:
        lit = p.replace("'", "''")
        counts.append(
            f"len(regexp_extract_all(COALESCE(text, ''), '{lit}'))")
        cleaned = f"regexp_replace({cleaned}, '{lit}', '', 'g')"
    total = " + ".join(counts)
    return f"""
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
 trim(regexp_replace({cleaned}, '\\s+', ' ', 'g')) AS clean_text,
 CAST({total} AS BIGINT) AS n_markers
FROM t"""


def _gopher_select() -> str:
    """text_gopher_quality oracle: the same RE2 counts the engine's Arrow
    kernels take (verified kernel-by-kernel incl. (?m) anchors), the same
    integer cross-multiplied keep rule, round-6 ratio reporting."""
    from .pipelines.docs import (GOPHER_MAX_WORDS, GOPHER_MIN_WORDS,
                                 GOPHER_STOPS)

    hits = " + ".join(
        f"CASE WHEN regexp_matches(lower(text), '\\b{w}\\b') THEN 1 ELSE 0 END"
        for w in GOPHER_STOPS)
    return rf"""
WITH m AS (SELECT doc_id,
  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
  CAST(length(text) - len(regexp_extract_all(text, '\s')) AS BIGINT) AS n_wchars,
  CAST(len(regexp_extract_all(text, '\n')) + 1 AS BIGINT) AS n_lines,
  CAST(len(regexp_extract_all(text, '#'))
     + len(regexp_extract_all(text, '\.\.\.'))
     + len(regexp_extract_all(text, '…')) AS BIGINT) AS n_sym,
  CAST(len(regexp_extract_all(text, '(?m)^[ \t]*[-*•]')) AS BIGINT) AS n_bullet,
  CAST(len(regexp_extract_all(text, '(?m)(\.\.\.|…)[ \t]*$')) AS BIGINT) AS n_ell,
  CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS BIGINT) AS n_alpha,
  CAST({hits} AS BIGINT) AS stop_hits
 FROM documents)
SELECT doc_id, n_words, n_lines,
 round(CASE WHEN n_words > 0 THEN CAST(n_wchars AS DOUBLE) / n_words ELSE 0 END, 6) AS mean_word_len,
 round(CASE WHEN n_words > 0 THEN CAST(n_sym AS DOUBLE) / n_words ELSE 0 END, 6) AS symbol_ratio,
 round(CAST(n_bullet AS DOUBLE) / n_lines, 6) AS bullet_frac,
 round(CAST(n_ell AS DOUBLE) / n_lines, 6) AS ellipsis_frac,
 round(CASE WHEN n_words > 0 THEN CAST(n_alpha AS DOUBLE) / n_words ELSE 0 END, 6) AS alpha_frac,
 stop_hits,
 (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
  AND 3 * n_words <= n_wchars AND n_wchars <= 10 * n_words
  AND 10 * n_sym < n_words
  AND 10 * n_bullet < 9 * n_lines
  AND 10 * n_ell < 3 * n_lines
  AND 5 * n_alpha >= 4 * n_words
  AND stop_hits >= 2) AS keep
FROM m"""


def _context_budget_select() -> str:
    """conv_context_budget oracle: per-conv token totals, fit flag, excess
    and ceil-division window count — all integer."""
    from .pipelines.kg import CONTEXT_BUDGET_TOKENS as B

    return f""",
ccb AS (SELECT conv_id,
         CAST(sum(len(regexp_extract_all(lower(COALESCE(text, '')),
                                         '[a-z]+'))) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_turns
        FROM t GROUP BY 1)
SELECT conv_id, n_turns, n_tokens,
 (n_tokens <= {B}) AS fits,
 CAST(greatest(n_tokens - {B}, 0) AS BIGINT) AS excess_tokens,
 CAST((n_tokens + {B} - 1) // {B} AS BIGINT) AS n_windows
FROM ccb"""


def _dpo_pairs_select() -> str:
    """sft_dpo_pairs oracle: lag() pairs each assistant turn with its
    directly-preceding user turn; the rejected partner is lead(chosen)
    wrapping to first_value within the fixed md5 rotation bucket — the
    engine's np.roll(-1), exactly."""
    from .pipelines.kg import DPO_BUCKETS

    return f""",
dp0 AS (SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role,
               COALESCE(text, '') AS text FROM t),
dp1 AS (SELECT *,
         lag(text) OVER cw AS prev_text, lag(role) OVER cw AS prev_role,
         lag(turn_idx) OVER cw AS prev_idx
        FROM dp0 WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx)),
dp2 AS (SELECT conv_id, turn_idx, prev_text AS prompt, text AS chosen,
               md5(conv_id || '|' || CAST(turn_idx AS VARCHAR)) AS mdk
        FROM dp1 WHERE role = 'assistant' AND prev_role = 'user'
         AND prev_idx = turn_idx - 1),
dp3 AS (SELECT *, CAST(CAST(('0x' || substr(mdk, 1, 15)) AS UBIGINT)
                       % {DPO_BUCKETS} AS BIGINT) AS bucket FROM dp2)
SELECT conv_id, turn_idx, prompt, chosen,
       COALESCE(lead(chosen) OVER bw, first_value(chosen) OVER bw)
         AS rejected
FROM dp3 WINDOW bw AS (PARTITION BY bucket ORDER BY mdk, conv_id, turn_idx)"""


def _pii_spans_select() -> str:
    """conv_pii_spans oracle: per-family regexp_extract_all zipped with
    generate_subscripts (DuckDB runs same-length unnests in lockstep) —
    one UNION ALL arm per family, each extracting from the ORIGINAL text,
    exactly the engine's independent per-family streams."""
    from .pipelines.kg import PII_PATTERNS

    parts = []
    for fam, pat in PII_PATTERNS:
        lit = pat.replace("'", "''")
        parts.append(f"""
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, '{fam}' AS family,
 CAST(generate_subscripts(regexp_extract_all(COALESCE(text, ''), '{lit}'), 1)
      - 1 AS BIGINT) AS match_idx,
 unnest(regexp_extract_all(COALESCE(text, ''), '{lit}')) AS span
FROM t""")
    return "\nUNION ALL ".join(parts)


def _pii_redact_select() -> str:
    """conv_pii_redact oracle: per-family counts on the raw text, then
    sequential regexp_replace with typed <FAMILY> placeholders — the same
    RE2 semantics as the engine's Arrow kernels."""
    from .pipelines.kg import PII_PATTERNS

    red = "COALESCE(text, '')"
    counts = []
    for fam, pat in PII_PATTERNS:
        lit = pat.replace("'", "''")
        counts.append(
            f"len(regexp_extract_all(COALESCE(text, ''), '{lit}'))")
        red = f"regexp_replace({red}, '{lit}', '<{fam.upper()}>', 'g')"
    total = " + ".join(counts)
    return f"""
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
 {red} AS redacted_text,
 CAST({total} AS BIGINT) AS n_redacted
FROM t"""


def _img_numbers_select(sf_dir_or_tag: str) -> str:
    """SQL twin of kg.image_numbers_ds (stages/imgnum.py ↔
    utils.php:280-404): volume index reconstruction (missing→next,
    trailing→last, last-wins per pg) + the psection/1a→1b/last-image
    fallback chain + the arithmetic path with mod-13 first-folio overrides."""
    pag = fixtures.aux_path(sf_dir_or_tag, "pagination")
    il = fixtures.aux_path(sf_dir_or_tag, "image_list")
    return f""",
pagx AS (SELECT vol_id, idx, pagination, psection,
  COALESCE(file = 'missing', FALSE) AS is_missing,
  CASE WHEN file IS NULL OR file = 'missing' OR strpos(file,'::')=0 THEN NULL
       ELSE substr(file, strpos(file,'::')+2) END AS fname
  FROM read_parquet('{pag}')),
ilx AS (SELECT vol_id, pos + 1 AS imgnum, filename FROM read_parquet('{il}')),
pn AS (SELECT p.*, i.imgnum AS inum FROM pagx p
  LEFT JOIN ilx i ON i.vol_id = p.vol_id AND i.filename = p.fname),
pn2 AS (SELECT *,
  CASE WHEN is_missing THEN
    COALESCE(
      min(CASE WHEN NOT is_missing THEN idx END) OVER
        (PARTITION BY vol_id ORDER BY idx
         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
      max(CASE WHEN NOT is_missing THEN idx END) OVER (PARTITION BY vol_id))
  ELSE idx END AS target_idx
  FROM pn),
entries AS (SELECT a.vol_id, a.idx, a.psection AS ps, a.pagination AS pg,
  b.inum AS inum_eff
  FROM pn2 a LEFT JOIN pn b ON b.vol_id = a.vol_id AND b.idx = a.target_idx),
pm AS (SELECT * FROM (SELECT *, row_number() OVER
  (PARTITION BY vol_id, ps, pg ORDER BY idx DESC) AS rrn FROM entries)
  WHERE rrn = 1),
volset AS (SELECT DISTINCT vol_id FROM pagx),
firstps AS (SELECT vol_id, arg_min(psection, idx) AS first_ps
  FROM pagx WHERE NOT is_missing GROUP BY vol_id),
zz AS (SELECT vol_id, count(*) AS zzlast FROM ilx GROUP BY vol_id),
lr AS (SELECT conv_id, turn_idx,
  CASE WHEN kind='full' THEN TRY_CAST(NULLIF(fs['bvolnum'],'') AS BIGINT)
       ELSE TRY_CAST(NULLIF(ss['bvolnum'],'') AS BIGINT) END AS bvolnum,
  CASE WHEN kind='full' THEN TRY_CAST(NULLIF(bp['pagenum'],'') AS BIGINT)
       ELSE TRY_CAST(NULLIF(ss['bpagenum'],'') AS BIGINT) END AS folio,
  CASE WHEN kind='full' THEN NULLIF(bp['side'],'') END AS side
  FROM w2 WHERE kind IS NOT NULL AND loc_valid),
lr2 AS (SELECT * FROM lr WHERE folio IS NOT NULL AND bvolnum IS NOT NULL),
lr3 AS (SELECT l.*, 'IG' || lpad(CAST(l.bvolnum AS VARCHAR), 5, '0') AS vkey
  FROM lr2 l)
SELECT l.conv_id, l.turn_idx, l.bvolnum, l.folio, l.side,
 CAST(CASE
  WHEN l.side IS NULL THEN l.folio
  WHEN vs.vol_id IS NOT NULL THEN
    CASE WHEN m1.rrn IS NOT NULL THEN m1.inum_eff
         WHEN CAST(l.folio AS VARCHAR) || l.side = '1a' AND m2.rrn IS NOT NULL
           THEN m2.inum_eff
         ELSE z.zzlast END
  ELSE 2 * (l.folio - 1)
       + CASE WHEN l.bvolnum % 13 = 0 THEN 3 ELSE 1 END
       + CASE WHEN l.side = 'b' THEN 1 ELSE 0 END
 END AS BIGINT) AS image_number
FROM lr3 l
LEFT JOIN volset vs ON vs.vol_id = l.vkey
LEFT JOIN firstps f ON f.vol_id = l.vkey
LEFT JOIN zz z ON z.vol_id = l.vkey
LEFT JOIN pm m1 ON m1.vol_id = l.vkey AND m1.ps = f.first_ps
  AND m1.pg = CAST(l.folio AS VARCHAR) || l.side
LEFT JOIN pm m2 ON m2.vol_id = l.vkey AND m2.ps = f.first_ps AND m2.pg = '1b'
  AND CAST(l.folio AS VARCHAR) || l.side = '1a'"""


def _repro_select() -> str:
    """kg_reproductions twin (editions_to_ttl loop, editionxmltottl.php:408-416)
    built from the same DEFAULT_CONFIG the Ray side reads."""
    from .config import DEFAULT_CONFIG as C

    rids = ",".join(f"('{r}')" for r in C.reproductions)
    head = f""",
dconv AS (SELECT DISTINCT conv_id FROM t),
rr AS (SELECT * FROM (VALUES {rids}) v(rid)),
ri AS (SELECT 'I:'||conv_id||'.'||rid AS inst, 'C:'||conv_id AS canon,
        'G:'||conv_id AS g FROM dconv CROSS JOIN rr)"""
    if C.target == "bdrc":
        return head + f"""
SELECT inst AS subj, 'rdf:type' AS pred, 'tr:Instance' AS obj,
       '' AS obj_lang, '' AS obj_dt, g AS graph FROM ri
UNION ALL SELECT inst, 'tr:script', '{C.script}', '', '', g FROM ri
UNION ALL SELECT inst, 'tr:printMethod', '{C.print_method}', '', '', g FROM ri
UNION ALL SELECT inst, 'rdfs:seeAlso', canon, '', '', g FROM ri"""
    return head + """
SELECT canon AS subj, 'rdfs:seeAlso' AS pred, inst AS obj,
       '' AS obj_lang, '' AS obj_dt, g AS graph FROM ri"""


def kg_oracle_sql(sf_dir_or_tag: str) -> dict[str, str]:
    w = with_block(sf_dir_or_tag) + "," + _LT
    full_union = "\nUNION ALL ".join(
        [SEL_STRUCTURAL, SEL_CONV, SEL_MENTIONS, SEL_ENTITIES, SEL_QUARANTINE,
         SEL_LOCNODES])
    sqls = {
        "kg_ntriples": w + _ntriples_select(full_union),
        "kg_nquads": w + _ntriples_select(full_union, with_graph=True),
        "kg_turtle": w + _turtle_select(full_union),
        "kg_adjacency": w + _adjacency_select(full_union),
        "kg_degrees": w + _degrees_select(full_union),
        "kg_degree_histogram": w + ", dg AS ("
                               + _degrees_select(full_union) + """)
SELECT out_deg + in_deg AS degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM dg GROUP BY 1""",
        "kg_kcore": w + _kcore_select(full_union),
        "kg_pagerank": w + _pagerank_select(full_union),
        "kg_hits": w + _hits_select(full_union),
        "kg_neighbor_sample": w + _neighbor_sample_select(full_union),
        "kg_pred_paths": w + _pred_paths_select(full_union),
        "kg_khop": w + _khop_select(full_union),
        "kg_walks": w + _walks_select(),
        "kg_walk_pairs": w + _walk_pairs_select(),
        "kg_alias_pairs": w + """
, apal AS (SELECT DISTINCT alias FROM linked)
SELECT a1, a2, CAST(levenshtein(a1, a2) AS BIGINT) AS dist FROM (
  SELECT a.alias AS a1, b.alias AS a2
  FROM apal a JOIN apal b ON a.alias < b.alias)
WHERE levenshtein(a1, a2) <= 2""",
        "kg_alias_clusters": w + """
, apal AS MATERIALIZED (SELECT DISTINCT alias FROM linked),
ape AS MATERIALIZED (
  SELECT a.alias AS a, b.alias AS b FROM apal a JOIN apal b
  ON a.alias < b.alias WHERE levenshtein(a.alias, b.alias) <= 2),
apes AS (SELECT a, b FROM ape UNION ALL SELECT b, a FROM ape
         UNION ALL SELECT alias, alias FROM apal),
apreach AS (
  SELECT a AS node, a AS member FROM apes
  UNION
  SELECT r.node, e.b FROM apreach r JOIN apes e ON e.a = r.member)
SELECT node AS alias,
  min(CAST(CAST(('0x' || substr(md5(member), 1, 15)) AS UBIGINT) AS BIGINT))
    AS component,
  min(member) AS rep_alias
FROM apreach GROUP BY 1""",
        "kg_ancestors": w + _ancestors_select(full_union),
        "kg_negative_samples": w + _negative_samples_select(full_union),
        "kg_dangling_refs": w + _dangling_select(full_union),
        "kg_neighbors_topk": w + """
, nco AS MATERIALIZED (
  SELECT a.entity_uri AS e1, b.entity_uri AS e2,
         CAST(count(*) AS BIGINT) AS n_convs
  FROM (SELECT DISTINCT conv_id, entity_uri FROM linked) a
  JOIN (SELECT DISTINCT conv_id, entity_uri FROM linked) b
    ON a.conv_id = b.conv_id AND a.entity_uri < b.entity_uri
  GROUP BY 1, 2),
nsym AS (SELECT e1 AS entity_uri, e2 AS neighbor_uri, n_convs FROM nco
         UNION ALL SELECT e2, e1, n_convs FROM nco)
SELECT entity_uri, neighbor_uri, n_convs, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY entity_uri
            ORDER BY n_convs DESC, neighbor_uri) AS BIGINT) AS rank
  FROM nsym) WHERE rank <= 5""",
        "conv_summary": w + """
, smt AS (SELECT conv_id, turn_idx,
          CAST(count(DISTINCT entity_uri) AS BIGINT) AS n_entities
          FROM linked GROUP BY 1, 2)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, n_entities FROM (
  SELECT *, row_number() OVER (PARTITION BY conv_id
            ORDER BY n_entities DESC, turn_idx) AS rn FROM smt)
WHERE rn = 1""",
        "conv_role_transitions": w + """
, o AS (SELECT conv_id, COALESCE(role, '') AS role,
         lag(COALESCE(role, '')) OVER (PARTITION BY conv_id
                                       ORDER BY turn_idx) AS prev
        FROM t)
SELECT prev AS role_from, role AS role_to,
 CAST(count(*) AS BIGINT) AS n_transitions,
 CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM o WHERE prev IS NOT NULL GROUP BY 1, 2""",
        "conv_tool_latency": w + """
, lt0 AS (SELECT conv_id, turn_idx, tool, epoch_us(ts) AS us FROM t),
lt1 AS (SELECT conv_id, tool, us,
         lead(us) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nus
        FROM lt0),
lt2 AS (SELECT tool, CASE WHEN nus IS NULL THEN 0 ELSE nus - us END AS gap,
         nus IS NOT NULL AS has_next
        FROM lt1 WHERE tool IS NOT NULL AND tool <> '')
SELECT tool, CAST(count(*) AS BIGINT) AS n_calls,
 CAST(count(*) FILTER (WHERE NOT has_next) AS BIGINT) AS n_tail,
 CAST(sum(gap) AS BIGINT) AS sum_gap_us,
 CAST(coalesce(min(gap) FILTER (WHERE has_next), -1) AS BIGINT)
   AS min_gap_us,
 CAST(coalesce(max(gap) FILTER (WHERE has_next), -1) AS BIGINT)
   AS max_gap_us,
 CAST(count(*) FILTER (WHERE has_next) AS BIGINT) AS n_timed
FROM lt2 GROUP BY 1""",
        "conv_tool_chains": w + """
, tt AS (SELECT conv_id, turn_idx, tool FROM t
         WHERE tool IS NOT NULL AND tool <> ''),
tb AS (SELECT conv_id, tool AS t1,
        lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS t2
       FROM tt)
SELECT t1, t2, CAST(count(*) AS BIGINT) AS n_pairs,
 CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM tb WHERE t2 IS NOT NULL GROUP BY 1, 2""",
        "conv_turn_gaps": w + """
, o AS (SELECT conv_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY conv_id
                                 ORDER BY turn_idx) AS prev
        FROM t),
gp AS (SELECT conv_id, ts_us - prev AS gap FROM o WHERE prev IS NOT NULL),
r AS (SELECT conv_id, gap,
       row_number() OVER (PARTITION BY conv_id ORDER BY gap) AS rn,
       count(*) OVER (PARTITION BY conv_id) AS n
      FROM gp),
s AS (SELECT conv_id, CAST(count(*) + 1 AS BIGINT) AS n_turns,
       CAST(max(gap) AS BIGINT) AS max_gap_us FROM gp GROUP BY 1),
d AS (SELECT conv_id,
       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us
      FROM o GROUP BY 1),
m AS (SELECT conv_id, CAST(gap AS BIGINT) AS median_gap_us
      FROM r WHERE rn = (n + 1) // 2)
SELECT s.conv_id, s.n_turns, d.duration_us, s.max_gap_us, m.median_gap_us
FROM s JOIN d USING (conv_id) JOIN m USING (conv_id)""",
        "conv_tool_stats": w + """
SELECT tool,
       CAST(count(*) AS BIGINT) AS n_convs,
       CAST(sum(n) AS BIGINT) AS n_calls,
       min(f) AS first_ts_us, max(l) AS last_ts_us
FROM (SELECT tool, conv_id, count(*) AS n,
             min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
      FROM t WHERE tool IS NOT NULL AND tool <> '' GROUP BY 1, 2)
GROUP BY 1""",
        # gaps-and-islands twin: the two-row_number difference is constant
        # exactly within a maximal same-tool run of the filtered call
        # sequence (non-tool turns between calls do NOT break a run)
        "conv_tool_retries": w + """
, ctr AS (SELECT conv_id, turn_idx, tool,
           row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
           - row_number() OVER (PARTITION BY conv_id, tool
                                ORDER BY turn_idx) AS isl
          FROM t WHERE tool IS NOT NULL AND tool <> '')
SELECT conv_id, tool, CAST(min(turn_idx) AS BIGINT) AS start_turn,
 CAST(max(turn_idx) AS BIGINT) AS end_turn,
 CAST(count(*) AS BIGINT) AS n_calls
FROM ctr GROUP BY conv_id, tool, isl HAVING count(*) >= 2""",
        # marker densities by substring arithmetic — literals are mutually
        # non-overlapping so replace() counting matches pc.count_substring
        "conv_marker_profile": w + """
, mk AS (SELECT conv_id, COALESCE(text, '') AS x FROM t)
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
 CAST(SUM((length(x) - length(replace(x, 'sec{', ''))) // 4) AS BIGINT) AS n_sec,
 CAST(SUM((length(x) - length(replace(x, 'ttl[', ''))) // 4) AS BIGINT) AS n_ttl,
 CAST(SUM((length(x) - length(replace(x, 'loc{', ''))) // 4) AS BIGINT) AS n_loc,
 CAST(SUM((length(x) - length(replace(x, 'locs{', ''))) // 5) AS BIGINT) AS n_locs,
 CAST(SUM((length(x) - length(replace(x, 'chap{', ''))) // 5) AS BIGINT) AS n_chap,
 CAST(SUM((length(x) - length(replace(x, 'chl{', ''))) // 4) AS BIGINT) AS n_chl,
 CAST(SUM((length(x) - length(replace(x, 'chls{', ''))) // 5) AS BIGINT) AS n_chls,
 CAST(SUM((length(x) - length(replace(x, 'cr[', ''))) // 3) AS BIGINT) AS n_cr,
 CAST(SUM((length(x) - length(replace(x, '@[', ''))) // 2) AS BIGINT) AS n_mention
FROM mk GROUP BY conv_id""",
        "kg_pair_formation": w + """
, pfm AS MATERIALIZED (
  SELECT d.entity_uri, d.conv_id, min(epoch_us(t.ts)) AS f
  FROM (SELECT DISTINCT conv_id, turn_idx, entity_uri FROM linked) d
  JOIN t ON t.conv_id = d.conv_id AND t.turn_idx = d.turn_idx
  GROUP BY 1, 2)
SELECT a.entity_uri AS e1, b.entity_uri AS e2,
       min(greatest(a.f, b.f)) AS formed_ts_us,
       CAST(count(*) AS BIGINT) AS n_convs
FROM pfm a JOIN pfm b
  ON a.conv_id = b.conv_id AND a.entity_uri < b.entity_uri
GROUP BY 1, 2""",
        "kg_pmi": w + """
, dce AS MATERIALIZED (SELECT DISTINCT conv_id, entity_uri FROM linked),
pecnt AS MATERIALIZED (SELECT entity_uri, CAST(count(*) AS BIGINT) AS n
                       FROM dce GROUP BY 1),
pnv AS MATERIALIZED (SELECT CAST(count(DISTINCT conv_id) AS DOUBLE) AS nn
                     FROM t),
pco AS MATERIALIZED (
  SELECT a.entity_uri AS e1, b.entity_uri AS e2,
         CAST(count(*) AS BIGINT) AS n_convs
  FROM dce a JOIN dce b
    ON a.conv_id = b.conv_id AND a.entity_uri < b.entity_uri
  GROUP BY 1, 2)
SELECT c.e1, c.e2, c.n_convs,
       round(ln((CAST(c.n_convs AS DOUBLE) * (SELECT nn FROM pnv)) /
                CAST(na.n * nb.n AS DOUBLE)), 6) AS pmi
FROM pco c JOIN pecnt na ON na.entity_uri = c.e1
           JOIN pecnt nb ON nb.entity_uri = c.e2""",
        "kg_components": w + """
, ce0 AS MATERIALIZED (
  SELECT a.entity_uri AS a, b.entity_uri AS b
  FROM (SELECT DISTINCT conv_id, entity_uri FROM linked) a
  JOIN (SELECT DISTINCT conv_id, entity_uri FROM linked) b
    ON a.conv_id = b.conv_id AND a.entity_uri < b.entity_uri
  GROUP BY 1, 2),
ce AS MATERIALIZED (SELECT a, b FROM ce0 UNION ALL SELECT b, a FROM ce0),
creach AS (
  SELECT a AS node, a AS member FROM ce
  UNION
  SELECT c.node, ce.b FROM creach c JOIN ce ON ce.a = c.member)
SELECT node AS entity_uri,
       min(CAST(CAST(('0x' || substr(md5(member), 1, 15)) AS UBIGINT)
                AS BIGINT)) AS component
FROM creach GROUP BY 1""",
        "kg_entity_lifespan": w + """
SELECT entity_uri,
       CAST(count(*) AS BIGINT) AS n_convs,
       CAST(sum(n) AS BIGINT) AS n_turns,
       min(f) AS first_ts_us, max(l) AS last_ts_us
FROM (
  SELECT d.entity_uri, d.conv_id,
         min(epoch_us(t.ts)) AS f, max(epoch_us(t.ts)) AS l, count(*) AS n
  FROM (SELECT DISTINCT conv_id, turn_idx, entity_uri FROM linked) d
  JOIN t ON t.conv_id = d.conv_id AND t.turn_idx = d.turn_idx
  GROUP BY 1, 2)
GROUP BY 1""",
        "kg_entity_growth": w + """
, lf AS (
  SELECT entity_uri, min(f) AS first_ts_us FROM (
    SELECT d.entity_uri, d.conv_id, min(epoch_us(t.ts)) AS f
    FROM (SELECT DISTINCT conv_id, turn_idx, entity_uri FROM linked) d
    JOIN t ON t.conv_id = d.conv_id AND t.turn_idx = d.turn_idx
    GROUP BY 1, 2) GROUP BY 1),
pd AS (SELECT first_ts_us // 86400000000 AS day,
              CAST(count(*) AS BIGINT) AS n_new FROM lf GROUP BY 1)
SELECT day, n_new AS n_new_entities,
       CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_entities
FROM pd""",
        "kg_pred_stats": w + "SELECT pred, CAST(count(*) AS BIGINT) AS "
                             "n_triples FROM (" + full_union +
                             ") GROUP BY pred",
        "kg_inverse_preds": w + ", tr AS MATERIALIZED (" + full_union
                            + """),
e AS (SELECT DISTINCT subj, pred, obj FROM tr WHERE subj <> obj)
SELECT x.pred AS pred_a, y.pred AS pred_b,
 CAST(count(*) AS BIGINT) AS n_pairs
FROM e x JOIN e y ON y.subj = x.obj AND y.obj = x.subj
GROUP BY 1, 2""",
        "kg_pred_cardinality": w + ", tr AS MATERIALIZED (" + full_union
                               + """),
ps AS (SELECT pred, subj, CAST(count(*) AS BIGINT) AS c
       FROM tr GROUP BY 1, 2),
po AS (SELECT pred, CAST(count(DISTINCT obj) AS BIGINT) AS n_objects
       FROM tr GROUP BY 1)
SELECT ps.pred, CAST(sum(ps.c) AS BIGINT) AS n_triples,
 CAST(count(*) AS BIGINT) AS n_subjects, po.n_objects,
 CAST(max(ps.c) AS BIGINT) AS max_per_subject,
 CAST(CASE WHEN max(ps.c) = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_functional
FROM ps JOIN po ON po.pred = ps.pred
GROUP BY 1, po.n_objects""",
        "kg_image_numbers": w + _img_numbers_select(sf_dir_or_tag),
        "kg_structural": w + SEL_STRUCTURAL,
        "kg_conv_triples": w + SEL_CONV,
        "kg_mentions": w + SEL_MENTIONS,
        "kg_entities": w + SEL_ENTITIES,
        "kg_quarantine": w + SEL_QUARANTINE,
        "kg_location_nodes": w + SEL_LOCNODES,
        "kg_locations": w + SEL_LOCATIONS,
        "kg_chap_locations": w + SEL_CHAP_LOCATIONS,
        "kg_creator_events": w + SEL_CREATOR_EVENTS,
        "kg_role_pivot": w + SEL_ROLE_PIVOT,
        "kg_cooccurrence": w + """
SELECT a.entity_uri AS e1, b.entity_uri AS e2,
       CAST(count(*) AS BIGINT) AS n_convs
FROM (SELECT DISTINCT conv_id, entity_uri FROM linked) a
JOIN (SELECT DISTINCT conv_id, entity_uri FROM linked) b
  ON a.conv_id = b.conv_id AND a.entity_uri < b.entity_uri
GROUP BY 1, 2""",
        "kg_adamic_adar": w + """
, aaed AS MATERIALIZED (
  SELECT DISTINCT a.entity_uri AS e1, b.entity_uri AS e2
  FROM (SELECT DISTINCT conv_id, entity_uri FROM linked) a
  JOIN (SELECT DISTINCT conv_id, entity_uri FROM linked) b
    ON a.conv_id = b.conv_id AND a.entity_uri < b.entity_uri),
aadg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM
  (SELECT e1 AS node FROM aaed UNION ALL SELECT e2 FROM aaed) GROUP BY 1),
aawt AS (SELECT node,
  CAST(floor(1000000.0 / ln(CAST(d AS DOUBLE)) + 0.5) AS BIGINT) AS wm
  FROM aadg WHERE d >= 2),
aatri AS (SELECT x.e1 AS a, x.e2 AS b, y.e2 AS c
  FROM aaed x JOIN aaed y ON y.e1 = x.e2
  JOIN aaed z ON z.e1 = x.e1 AND z.e2 = y.e2),
aaco AS (SELECT a AS x, b AS y, c AS z FROM aatri
  UNION ALL SELECT a, c, b FROM aatri
  UNION ALL SELECT b, c, a FROM aatri),
aasc AS (SELECT x, y, sum(wt.wm) AS s
         FROM aaco JOIN aawt wt ON wt.node = aaco.z GROUP BY 1, 2)
SELECT e.e1, e.e2, CAST(coalesce(aasc.s, 0) AS BIGINT) AS aa_micro
FROM aaed e LEFT JOIN aasc ON aasc.x = e.e1 AND aasc.y = e.e2""",
        "conv_clean_text": w + _clean_text_select(),
        "sft_dpo_pairs": w + _dpo_pairs_select(),
        "conv_context_budget": w + _context_budget_select(),
        "conv_topic_shift": w + """
, tsx AS MATERIALIZED (SELECT DISTINCT conv_id, turn_idx, entity_uri
                       FROM linked),
tsn AS (SELECT conv_id, turn_idx, CAST(count(*) AS BIGINT) AS n
        FROM tsx GROUP BY 1, 2),
tso AS (SELECT a.conv_id, a.turn_idx, CAST(count(*) AS BIGINT) AS o
        FROM tsx a JOIN tsx b ON b.conv_id = a.conv_id
         AND b.turn_idx = a.turn_idx + 1
         AND b.entity_uri = a.entity_uri
        GROUP BY 1, 2)
SELECT na.conv_id, CAST(na.turn_idx AS BIGINT) AS turn_idx,
 na.n AS n_a, nb.n AS n_b, COALESCE(o.o, 0) AS n_overlap,
 round(CAST(COALESCE(o.o, 0) AS DOUBLE)
       / greatest(na.n + nb.n - COALESCE(o.o, 0), 1), 6) AS jaccard
FROM tsn na JOIN tsn nb ON nb.conv_id = na.conv_id
 AND nb.turn_idx = na.turn_idx + 1
LEFT JOIN tso o ON o.conv_id = na.conv_id AND o.turn_idx = na.turn_idx""",
        "conv_speaker_stats": w + """
SELECT COALESCE(role, '') AS role,
 CAST(count(*) AS BIGINT) AS n_turns,
 CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
 CAST(sum(len(regexp_extract_all(lower(COALESCE(text, '')), '[a-z]+')))
      AS BIGINT) AS n_tokens,
 CAST(sum(length(COALESCE(text, ''))) AS BIGINT) AS n_chars,
 CAST(sum(len(regexp_extract_all(lower(COALESCE(text, '')), '[a-z]+')))
      * 1000000 // greatest(count(*), 1) AS BIGINT) AS mean_tokens_ppm
FROM t GROUP BY 1""",
        "conv_dialog_acts": w + _dialog_acts_select(),
        "conv_pii_spans": w + _pii_spans_select(),
        "conv_pii_redact": w + _pii_redact_select(),
        # exact neighborhood-Jaccard over the co-occurrence graph (the
        # adj-join formulation is the order-free twin of the engine's
        # prefix-filtered candidate generation)
        "kg_neighbor_jaccard": w + """
, co AS MATERIALIZED (
  SELECT a.entity_uri AS a, b.entity_uri AS b
  FROM (SELECT DISTINCT conv_id, entity_uri FROM linked) a
  JOIN (SELECT DISTINCT conv_id, entity_uri FROM linked) b
    ON a.conv_id = b.conv_id AND a.entity_uri < b.entity_uri
  GROUP BY 1, 2),
adj AS (SELECT a AS node, b AS nbr FROM co UNION ALL SELECT b, a FROM co),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY 1),
inter AS (SELECT x.node AS e1, y.node AS e2, CAST(count(*) AS BIGINT) AS i
          FROM adj x JOIN adj y ON y.nbr = x.nbr AND x.node < y.node
          GROUP BY 1, 2)
SELECT i.e1, i.e2, i.i AS n_common,
 round(CAST(i.i AS DOUBLE) / (da.d + db.d - i.i), 6) AS jaccard
FROM inter i JOIN deg da ON da.node = i.e1 JOIN deg db ON db.node = i.e2
WHERE round(CAST(i.i AS DOUBLE) / (da.d + db.d - i.i), 6) >= 0.8""",
        "kg_triangles": w + """
, co AS MATERIALIZED (
  SELECT a.entity_uri AS a, b.entity_uri AS b
  FROM (SELECT DISTINCT conv_id, entity_uri FROM linked) a
  JOIN (SELECT DISTINCT conv_id, entity_uri FROM linked) b
    ON a.conv_id = b.conv_id AND a.entity_uri < b.entity_uri
  GROUP BY 1, 2),
tri AS MATERIALIZED (
  SELECT x.a AS a, x.b AS b, y.b AS c
  FROM co x JOIN co y ON y.a = x.b JOIN co z ON z.a = x.a AND z.b = y.b)
SELECT entity, CAST(count(*) AS BIGINT) AS n_triangles
FROM (SELECT unnest([a, b, c]) AS entity FROM tri) GROUP BY 1""",
        "kg_assortativity": w + """
, co AS MATERIALIZED (
  SELECT a.entity_uri AS a, b.entity_uri AS b
  FROM (SELECT DISTINCT conv_id, entity_uri FROM linked) a
  JOIN (SELECT DISTINCT conv_id, entity_uri FROM linked) b
    ON a.conv_id = b.conv_id AND a.entity_uri < b.entity_uri
  GROUP BY 1, 2),
adg AS (SELECT entity, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT a AS entity FROM co UNION ALL SELECT b FROM co)
        GROUP BY 1),
aed AS (SELECT a AS x, b AS y FROM co UNION ALL SELECT b, a FROM co),
aej AS (SELECT da.deg AS dx, db.deg AS dy
        FROM aed JOIN adg da ON da.entity = aed.x
        JOIN adg db ON db.entity = aed.y),
amo AS (SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
         CAST(sum(dx * dy) AS BIGINT) AS sxy,
         CAST(sum(dx * dx) AS BIGINT) AS sx2,
         CAST(sum(dy * dy) AS BIGINT) AS sy2
        FROM aej)
SELECT n AS n_dir_edges, sx AS sum_deg, sxy AS sum_prod, sx2 AS sum_sq,
 round(CASE WHEN CAST(n AS DOUBLE) * sx2 - CAST(sx AS DOUBLE) * sx > 0
             AND CAST(n AS DOUBLE) * sy2 - CAST(sy AS DOUBLE) * sy > 0
       THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / sqrt((CAST(n AS DOUBLE) * sx2 - CAST(sx AS DOUBLE) * sx)
                   * (CAST(n AS DOUBLE) * sy2 - CAST(sy AS DOUBLE) * sy))
       ELSE 0 END, 6) AS assortativity
FROM amo""",
        "kg_clustering_coef": w + """
, co AS MATERIALIZED (
  SELECT a.entity_uri AS a, b.entity_uri AS b
  FROM (SELECT DISTINCT conv_id, entity_uri FROM linked) a
  JOIN (SELECT DISTINCT conv_id, entity_uri FROM linked) b
    ON a.conv_id = b.conv_id AND a.entity_uri < b.entity_uri
  GROUP BY 1, 2),
tri AS MATERIALIZED (
  SELECT x.a AS a, x.b AS b, y.b AS c
  FROM co x JOIN co y ON y.a = x.b JOIN co z ON z.a = x.a AND z.b = y.b),
trc AS (SELECT entity, CAST(count(*) AS BIGINT) AS tri
        FROM (SELECT unnest([a, b, c]) AS entity FROM tri) GROUP BY 1),
dgc AS (SELECT entity, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT a AS entity FROM co UNION ALL SELECT b FROM co)
        GROUP BY 1)
SELECT d.entity, d.deg AS degree, COALESCE(t.tri, 0) AS n_triangles,
 CAST(CASE WHEN d.deg >= 2
       THEN (2000000 * COALESCE(t.tri, 0)) // (d.deg * (d.deg - 1))
       ELSE 0 END AS BIGINT) AS cc_ppm
FROM dgc d LEFT JOIN trc t USING (entity)""",
        "sft_examples": w + """
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       n_context_turns, COALESCE(context, '') AS context, target
FROM (
  SELECT conv_id, turn_idx, role,
    CAST(count(*) OVER win AS BIGINT) AS n_context_turns,
    string_agg(COALESCE(role, '') || ': ' || COALESCE(text, ''), chr(10))
      OVER win AS context,
    COALESCE(text, '') AS target
  FROM t
  WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx, role, text
                 ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING))
WHERE role = 'assistant'""",
        "conv_flatten": w + """
SELECT conv_id, n_turns, CAST(length(doc) AS BIGINT) AS n_chars, doc FROM (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
    string_agg(COALESCE(role,'')
      || CASE WHEN COALESCE(tool,'') <> '' THEN '[' || tool || ']' ELSE '' END
      || ': ' || COALESCE(text,''),
      chr(10) ORDER BY turn_idx, role, text) AS doc
  FROM t GROUP BY conv_id)""",
        "kg_validate": w + SEL_VALIDATE,
        "kg_triples": w + full_union,
        # right-to-be-forgotten retraction census: forgotten convs by
        # md5(conv_id)[:15hex] % 10 == 0; entity cascade only on ORPHANED
        # entities (no surviving tr:mentions edge), facet nodes follow
        "kg_forget": w + ", tri AS (" + full_union + """),
fg0 AS (SELECT *,
  CASE WHEN graph LIKE 'G:conv%' THEN 'conv'
       WHEN graph = 'G:quarantine' THEN 'quarantine'
       ELSE 'entities' END AS graph_class,
  CASE WHEN graph LIKE 'G:conv%' THEN substr(graph, 3)
       WHEN graph = 'G:quarantine' AND strpos(subj, '/') > 0
         THEN substr(subj, 3, strpos(subj, '/') - 3)
       ELSE '' END AS conv
  FROM tri),
fg AS (SELECT *, conv <> '' AND
        CAST(('0x' || substr(md5(conv), 1, 15)) AS UBIGINT) % 10 = 0 AS fgt
       FROM fg0),
fme AS (SELECT obj AS ent,
         CAST(SUM(CASE WHEN fgt THEN 0 ELSE 1 END) AS BIGINT) AS surv
        FROM fg WHERE graph_class = 'conv' AND pred = 'tr:mentions'
        GROUP BY 1),
orp AS (SELECT ent FROM fme WHERE surv = 0),
r12 AS (SELECT graph_class, pred FROM fg
        WHERE fgt AND graph_class <> 'entities'),
r3 AS (SELECT f.graph_class, f.pred, f.obj FROM fg f JOIN orp o
       ON f.subj = o.ent WHERE f.graph_class = 'entities'),
fco AS (SELECT DISTINCT obj FROM r3 WHERE obj LIKE 'N:%'),
r4 AS (SELECT f.graph_class, f.pred FROM fg f JOIN fco c ON f.subj = c.obj
       WHERE f.graph_class = 'entities'),
alr AS (SELECT graph_class, pred FROM r12
        UNION ALL SELECT graph_class, pred FROM r3
        UNION ALL SELECT graph_class, pred FROM r4)
SELECT graph_class, pred, CAST(count(*) AS BIGINT) AS n_retract
FROM alr GROUP BY 1, 2""",
        # idempotent re-migration: base + tombstoned delta == from-scratch
        "kg_incremental": w + full_union,
        "kg_reproductions": w + _repro_select(),
    }
    # per-entity serving card: nested-CTE composition of the lifespan /
    # co-occurrence / top-neighbor oracles, so the card cannot drift from
    # the per-facet queries
    sqls["kg_entity_cards"] = (
        "WITH ecl AS (" + sqls["kg_entity_lifespan"] + "),\n"
        "ecn AS (" + sqls["kg_neighbors_topk"] + "),\n"
        "eco AS (" + sqls["kg_cooccurrence"] + """),
ecd AS (SELECT entity, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT e1 AS entity FROM eco UNION ALL SELECT e2 FROM eco)
        GROUP BY 1),
ect AS (SELECT entity_uri, neighbor_uri, n_convs FROM ecn WHERE rank = 1)
SELECT l.entity_uri, l.n_convs, l.n_turns, l.first_ts_us, l.last_ts_us,
 CAST(COALESCE(d.deg, 0) AS BIGINT) AS degree,
 COALESCE(t.neighbor_uri, '') AS top_neighbor,
 CAST(COALESCE(t.n_convs, 0) AS BIGINT) AS top_neighbor_convs
FROM ecl l LEFT JOIN ecd d ON d.entity = l.entity_uri
LEFT JOIN ect t ON t.entity_uri = l.entity_uri""")
    return sqls
