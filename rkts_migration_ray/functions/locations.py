"""Location-string parsing — the reference's position grammar, vectorized.

Grammar reimplemented from the regex *specifications* at utils.php:564-572 and
the parser semantics of get_text_loc_str (utils.php:660-690) / set_pageline
(utils.php:669-704):

- full dialect  : "<section>, <vol> <page><a|b><line>-<vol> <page><a|b><line> (vol. <b>-<e>)"
  e.g. "'dul ba, ka 1b1-nga 302a5 (vol. 1-4)"  (doc-test, utils.php:748-752)
- simple dialect: "<bvol>.<bpage>?, - <evol>.<epage>"  (chemdo branch,
  pattern_loc_simple utils.php:570 + dialect switch utils.php:629-633)
- pageline      : "<page><a|b><line>?" sub-parse (pattern_small_loc utils.php:564)
- volume-letter whitelist → quarantine (allowed_vol_letters utils.php:562,634-639)

All parsing is pc.extract_regex (RE2) over Arrow string arrays — no Python
row loop. Unmatched strings yield valid=false + an invalid_loc quarantine row.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .arrowutils import to_int64

# verbatim grammar tokens (the *language* being parsed is reference-defined)
PATTERN_LOC = (
    r"^(?P<section>[^,]+)(?:, (?P<bvolname>[^ ]+))? (?P<bpageline>[0-9ab]+)\??"
    r"(?:\-(?:(?P<evolname>[^ ]+) )?(?P<epageline>[0-9ab]+))?\??"
    r"(?: \(vol\. (?P<bvolnum>\d+)(?:\-(?P<evolnum>\d+))?)?"
)
PATTERN_SMALL_LOC = r"^(?P<pagenum>\d+)(?P<side>[ab])(?P<linenum>\d+)?\??"
PATTERN_LOC_SIMPLE = (
    r"^(?P<bvolnum>\d+)\.(?P<bpagenum>\d+)\?, ?- ?(?P<evolnum>\d+)\.(?P<epagenum>\d+)$"
)
# bampo/chapter dialect (pattern_bampo_chap_loc utils.php:566, consumed by
# get_bampo_loc/get_chap_loc utils.php:707-746): like the full dialect but
# with no section and no '(vol. N)' tail, and the volume letter optional.
# Doc-test strings: "ga 107a7-116a5", "ga 107a7" (utils.php:748-749).
PATTERN_BAMPO_CHAP = (
    r"^(?:(?P<bvolname>[^ ]+) )?(?P<bpageline>[0-9ab]+)"
    r"(?:\-(?:(?P<evolname>[^ ]+) )?(?P<epageline>[0-9ab]+))?$"
)
# chemdo/chemdot editions switch BOTH chap and bampo locations to
# pattern_loc_simple_small (utils.php:572, dialect switch utils.php:711-713,
# 731-733) and SKIP the volume-letter whitelist + pageline sub-parse
# (utils.php:719-724, 739-744 guard on fileName).
PATTERN_CHAP_SIMPLE = r"^(?P<bpagenum>\d+)-(?P<epagenum>\d+)$"

# allowed_vol_letters (utils.php:562) — the validation whitelist, VERBATIM
# from the reference (141 entries incl. the empty string); round-1 advice
# caught a transcription drift ('dzi' missing, spurious 'wam'). The fixture
# generator draws valid letters from a subset and injects out-of-list letters
# to exercise the quarantine path; tests/test_locations.py re-diffs this set
# against the reference list.
ALLOWED_VOL_LETTERS = frozenset([
    "ka", "kha", "ga", "nga", "ca", "cha", "ja", "nya", "ta", "tha", "da",
    "na", "pa", "pha", "ba", "ma", "a", "wa", "za", "zha", "'a", "dza",
    "tsha", "tsa", "ya", "ra", "sha", "ha", "aM", "aH", "e", "waM", "sa",
    "la", "shrI", "ki", "khi", "gi", "ngi", "ci", "chi", "ji", "nyi", "ti",
    "thi", "di", "ni", "pi", "phi", "bi", "mi", "tsi", "tshi", "dzi", "wi",
    "zhi", "zi", "'i", "yi", "ri", "li", "shi", "si", "i", "ku", "khu", "gu",
    "ngu", "cu", "chu", "ju", "nyu", "tu", "thu", "du", "nu", "pu", "phu",
    "bu", "mu", "tsu", "tshu", "hi", "dzu", "wu", "zhu", "'u", "ru", "lu",
    "shu", "su", "hu", "u", "ke", "ge", "nge", "ce", "che", "je", "te", "de",
    "pe", "phe", "tshe", "dze", "we", "zhe", "ze", "ye", "re", "le", "she",
    "se", "he", "ko", "ngo", "co", "jo", "nyo", "to", "tho", "no", "po",
    "zu", "yu", "A", "khe", "nye", "the", "ne", "tse", "'e", "kho", "go",
    "cho", "do", "pho", "bo", "mo", "", "oM",
])

LOC_FIELDS = [
    ("section", pa.string()),
    ("bvolname", pa.string()),
    ("evolname", pa.string()),
    ("bvolnum", pa.int64()),
    ("evolnum", pa.int64()),
    ("bpagenum", pa.int64()),
    ("bpageside", pa.string()),
    ("blinenum", pa.int64()),
    ("epagenum", pa.int64()),
    ("epageside", pa.string()),
    ("elinenum", pa.int64()),
]


def _pageline_fields(pageline: pa.Array) -> tuple[pa.Array, pa.Array, pa.Array]:
    """set_pageline sub-parse (utils.php:669-704): '107a7' → (107,'a',7)."""
    ext = pc.extract_regex(pageline, PATTERN_SMALL_LOC)
    null = pa.nulls(len(pageline), pa.struct(
        [("pagenum", pa.string()), ("side", pa.string()), ("linenum", pa.string())]))
    ext = pc.if_else(pc.is_valid(ext), ext, null)
    return (
        to_int64(pc.struct_field(ext, "pagenum")),
        pc.struct_field(ext, "side"),
        to_int64(pc.struct_field(ext, "linenum")),
    )


def parse_loc_full(body: pa.Array) -> dict[str, pa.Array]:
    """Full-dialect parse → dict of LOC_FIELDS arrays + 'valid' + 'badvol'.

    valid=false rows ≈ report_error('invalid_loc', …) (utils.php:626);
    badvol carries the offending out-of-whitelist volume letter
    (utils.php:634-639)."""
    ext = pc.extract_regex(body, PATTERN_LOC)
    valid = pc.is_valid(ext)
    null = pa.nulls(len(body), ext.type if len(body) else pa.struct([]))
    if len(body):
        ext = pc.if_else(valid, ext, null)
    f = {name: pc.struct_field(ext, name)
         for name in ("section", "bvolname", "evolname", "bpageline", "epageline", "bvolnum", "evolnum")}
    bpage, bside, bline = _pageline_fields(f["bpageline"])
    epage, eside, eline = _pageline_fields(f["epageline"])
    allowed = pa.array(sorted(ALLOWED_VOL_LETTERS))
    bvol_bad = pc.and_(
        pc.invert(pc.is_in(f["bvolname"], value_set=allowed)),
        pc.invert(pc.equal(pc.coalesce(f["bvolname"], ""), "")),
    )
    evol_bad = pc.and_(
        pc.invert(pc.is_in(f["evolname"], value_set=allowed)),
        pc.invert(pc.equal(pc.coalesce(f["evolname"], ""), "")),
    )
    badvol = pc.if_else(bvol_bad, f["bvolname"],
                        pc.if_else(evol_bad, f["evolname"], pa.scalar(None, pa.string())))
    from .arrowutils import empty_string_to_null

    return {
        "section": empty_string_to_null(f["section"]),
        "bvolname": empty_string_to_null(f["bvolname"]),
        "evolname": empty_string_to_null(f["evolname"]),
        "bvolnum": to_int64(f["bvolnum"]),
        "evolnum": to_int64(f["evolnum"]),
        "bpagenum": bpage,
        "bpageside": bside,
        "blinenum": bline,
        "epagenum": epage,
        "epageside": eside,
        "elinenum": eline,
        "valid": valid,
        "badvol": badvol,
    }


def parse_loc_bampo_chap(body: pa.Array) -> dict[str, pa.Array]:
    """Bampo/chapter dialect parse (get_chap_loc / get_bampo_loc,
    utils.php:707-746, non-chemdo branch) → LOC_FIELDS arrays + 'valid' +
    'badvol'.

    Semantics mirrored branch-for-branch:
    - no grammar match → valid=false (report_error 'invalid_chap_loc' /
      'invalid_bampo_loc', utils.php:713-716 / 730-733; the caller emits the
      quarantine row);
    - ONLY bvolname runs the whitelist (utils.php:718-719 / 739-740 check
      bvolname alone — unlike get_text_loc, evolname is never validated);
      a whitelist miss does NOT invalidate the row (the reference reports
      the error and still returns the match);
    - pagelines sub-parse via set_pageline (utils.php:669-704); a failed
      sub-parse leaves the page fields null (same contract as
      parse_loc_full)."""
    ext = pc.extract_regex(body, PATTERN_BAMPO_CHAP)
    valid = pc.is_valid(ext)
    null = pa.nulls(len(body), ext.type if len(body) else pa.struct([]))
    if len(body):
        ext = pc.if_else(valid, ext, null)
    f = {name: pc.struct_field(ext, name)
         for name in ("bvolname", "evolname", "bpageline", "epageline")}
    bpage, bside, bline = _pageline_fields(f["bpageline"])
    epage, eside, eline = _pageline_fields(f["epageline"])
    allowed = pa.array(sorted(ALLOWED_VOL_LETTERS))
    bvol_bad = pc.and_(
        pc.invert(pc.is_in(f["bvolname"], value_set=allowed)),
        pc.invert(pc.equal(pc.coalesce(f["bvolname"], ""), "")),
    )
    badvol = pc.if_else(bvol_bad, f["bvolname"], pa.scalar(None, pa.string()))
    from .arrowutils import empty_string_to_null

    nulls_str = pa.nulls(len(body), pa.string())
    nulls_int = pa.nulls(len(body), pa.int64())
    return {
        "section": nulls_str,
        "bvolname": empty_string_to_null(f["bvolname"]),
        "evolname": empty_string_to_null(f["evolname"]),
        "bvolnum": nulls_int,
        "evolnum": nulls_int,
        "bpagenum": bpage,
        "bpageside": bside,
        "blinenum": bline,
        "epagenum": epage,
        "epageside": eside,
        "elinenum": eline,
        "valid": valid,
        "badvol": badvol,
    }


def parse_loc_chap_simple(body: pa.Array) -> dict[str, pa.Array]:
    """Chemdo/chemdot chap-loc dialect: 'N-N' (pattern_loc_simple_small,
    utils.php:572). NO whitelist check and NO pageline sub-parse — the
    edition-name-conditional skip at utils.php:719-724 / 739-744."""
    ext = pc.extract_regex(body, PATTERN_CHAP_SIMPLE)
    valid = pc.is_valid(ext)
    null = pa.nulls(len(body), ext.type if len(body) else pa.struct([]))
    if len(body):
        ext = pc.if_else(valid, ext, null)
    nulls_str = pa.nulls(len(body), pa.string())
    nulls_int = pa.nulls(len(body), pa.int64())
    return {
        "section": nulls_str,
        "bvolname": nulls_str,
        "evolname": nulls_str,
        "bvolnum": nulls_int,
        "evolnum": nulls_int,
        "bpagenum": to_int64(pc.struct_field(ext, "bpagenum")),
        "bpageside": nulls_str,
        "blinenum": nulls_int,
        "epagenum": to_int64(pc.struct_field(ext, "epagenum")),
        "epageside": nulls_str,
        "elinenum": nulls_int,
        "valid": valid,
        "badvol": nulls_str,
    }


def parse_loc_simple(body: pa.Array) -> dict[str, pa.Array]:
    """Simple (chemdo) dialect: '3.12?, - 4.118' → vol/page ints only
    (utils.php:629-633: bpagenum/epagenum set directly, no pageside/line)."""
    ext = pc.extract_regex(body, PATTERN_LOC_SIMPLE)
    valid = pc.is_valid(ext)
    null = pa.nulls(len(body), ext.type if len(body) else pa.struct([]))
    if len(body):
        ext = pc.if_else(valid, ext, null)
    nulls_str = pa.nulls(len(body), pa.string())
    nulls_int = pa.nulls(len(body), pa.int64())
    return {
        "section": nulls_str,
        "bvolname": nulls_str,
        "evolname": nulls_str,
        "bvolnum": to_int64(pc.struct_field(ext, "bvolnum")),
        "evolnum": to_int64(pc.struct_field(ext, "evolnum")),
        "bpagenum": to_int64(pc.struct_field(ext, "bpagenum")),
        "bpageside": nulls_str,
        "blinenum": nulls_int,
        "epagenum": to_int64(pc.struct_field(ext, "epagenum")),
        "epageside": nulls_str,
        "elinenum": nulls_int,
        "valid": valid,
        "badvol": nulls_str,
    }
