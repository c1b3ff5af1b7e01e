"""Pagination / folio arithmetic (SURVEY.md M13, M18, ST3 analogs).

- folio_side_to_pagenum: the arithmetic fallback of utils.php:390-403 —
  image number = 2*(folio-1) + one_a_offset + side(+1 for 'b') with
  per-volume first-folio overrides (rkts.yaml:269-322 volumeBdrcPageFirstFolio).
- parse_pagination_token / compare_pagination: the folio/duplicate-mark/side
  tuple comparison of migrate-bvm.py:14,58-76 (PG_RE + comparepg), used for
  order-monotonicity validation.
- PaginationCache: the per-actor LRU-1 memo of utils.php:211-212,360-367 —
  consecutive records of one volume hit the cache; in the engine this holds
  because stages sort within partitions before stateful lookups (ST3).
"""

from __future__ import annotations

import re
from collections.abc import Callable

# verbatim reference grammar (migrate-bvm.py:14): folio is 'x' (wildcard) or
# digits; duplicate mark is a run of apostrophes; side letter is MANDATORY;
# optional uncertainty '?' and detail '(dN)' suffixes don't affect ordering.
PG_RE = re.compile(
    r"^(?P<folionum>x|\d+)(?P<duplind>'*)(?P<side>[ab])"
    r"(?P<certaintyind>\??)(?P<detailind>\(d\d*\))?")


def folio_side_to_pagenum(folio: int, side: str, one_a: int = 1,
                          first_folio: int = 1) -> int:
    """Arithmetic image-number resolution (utils.php:390-403 semantics):
    pages before `first_folio` don't exist on film; 'a' side is the first
    image of a folio, 'b' the second; `one_a` shifts for leading matter."""
    eff = folio - (first_folio - 1)
    if eff < 1:
        raise ValueError(f"folio {folio} precedes first folio {first_folio}")
    return 2 * (eff - 1) + one_a + (1 if side == "b" else 0)


def parse_pagination_token(tok: str) -> tuple[int | None, str, str] | None:
    """'107a' → (107, '', 'a'); "107''b?" → (107, "''", 'b');
    'xa' → (None, '', 'a') (wildcard folio); None if unparsable."""
    m = PG_RE.match(tok)
    if not m:
        return None
    f = m.group("folionum")
    return (None if f == "x" else int(f), m.group("duplind"), m.group("side"))


def _strcmp(a: str, b: str) -> int:
    return (a > b) - (a < b)


def compare_pagination(a: str, b: str) -> int:
    """comparepg semantics (migrate-bvm.py:58-76): equal strings → 0;
    unparsable tokens or a wildcard 'x' folio on either side compare equal
    (so they don't poison monotonicity validation); else folio int, then
    apostrophe duplicate-mark strcmp, then side strcmp."""
    if a == b:
        return 0
    ta, tb = parse_pagination_token(a), parse_pagination_token(b)
    if ta is None or tb is None:
        return 0
    if ta[0] is None or tb[0] is None:
        return 0
    if ta[0] != tb[0]:
        return ta[0] - tb[0]
    d = _strcmp(ta[1], tb[1])
    if d != 0:
        return d
    return _strcmp(ta[2], tb[2])


def build_volume_index(pag_rows: list[dict], img_filenames: list[str]) -> dict:
    """get_json_full (utils.php:280-349): per-volume pagination → image-number
    index. 'missing' entries attach to the NEXT non-missing row's image
    number (utils.php:313-338); trailing 'missing' entries flush to the last
    assigned number (:341-347); a file reference not in the image list (or a
    row without a usable file) maps to None (PHP null lookup); duplicate
    pagination keys within a psection: last wins (assoc assignment).
    Returns {"sections": {psection: {pg: imgnum|None}}, "zzlastimgnum": n,
    "first_ps": first inserted psection}."""
    fname_to_num = {f: i + 1 for i, f in enumerate(img_filenames)}
    res: dict[str, dict] = {}
    attach: list[tuple[str, str]] = []
    imgnum = None
    for r in pag_rows:
        ps = r["psection"] if r.get("psection") is not None else "default"
        pg = r["pagination"]
        file_val = r.get("file")
        if file_val == "missing":
            attach.append((ps, pg))
            continue
        fname = None
        if file_val is not None:
            parts = file_val.split("::", 1)
            fname = parts[1] if len(parts) > 1 else None
        imgnum = fname_to_num.get(fname)
        res.setdefault(ps, {})[pg] = imgnum
        for aps, apg in attach:
            res.setdefault(aps, {})[apg] = imgnum
        attach = []
    for aps, apg in attach:
        res.setdefault(aps, {})[apg] = imgnum
    return {"sections": res,
            "zzlastimgnum": len(img_filenames) or None,
            "first_ps": next(iter(res), None)}


def resolve_image_number(folio: int, side: str | None, volnum: int,
                         index: dict | None, onea_default: int = 1,
                         overrides: dict | None = None):
    """folio_side_to_pagenum (utils.php:351-404): side-less locations return
    the folio unchanged (:353-358); volumes with a pagination index resolve
    through it — psection 'default' falling back to the first section
    (:370-377), '1a'→'1b' fallback (:379-383), last-image fallback (:384-387)
    — otherwise the arithmetic path 2*(folio-1)+onea+side with per-volume
    first-folio overrides (:389-403, rkts.yaml:269-322)."""
    if side is None or side == "":
        return folio
    if index is not None:
        secs = index["sections"]
        ps = "default"
        if ps not in secs:
            ps = index["first_ps"]
        pgs = secs.get(ps, {}) if ps is not None else {}
        key = f"{folio}{side}"
        if key not in pgs and key == "1a":
            key = "1b"
        if key not in pgs:
            return index["zzlastimgnum"]
        return pgs[key]
    onea = (overrides or {}).get(volnum, onea_default)
    return 2 * (folio - 1) + onea + (1 if side == "b" else 0)


class PaginationCache:
    """LRU-1 per-actor side-file cache (ST3): `get(name)` re-loads only when
    the requested volume changes — exact analog of $lastjsonbname/$lastjson."""

    def __init__(self, loader: Callable[[str], object]):
        self._loader = loader
        self._name: str | None = None
        self._value: object = None
        self.misses = 0

    def get(self, name: str):
        if name != self._name:
            self._value = self._loader(name)
            self._name = name
            self.misses += 1
        return self._value


# ---------------------------------------------------------------------------
# remote image-list fetch seam (migrate-bvm.py:369-387 dl_image_list /
# get_img_list): md5-bucketed remote key + gz side-file cache. The sandbox
# has no network, so the transport is an INJECTED callable — same contract
# pattern as the multimodal codec seam (stages/multimodal.py) — and the
# default store is local-cache-only.
# ---------------------------------------------------------------------------


def image_list_key(iilname: str, iglocalname: str) -> str:
    """Remote object key for a volume's image list (migrate-bvm.py:369-377):
    'Works/<md5(iilname)[:2]>/<iilname>/images/<iilname>-<suffix>/
    dimensions.json' where suffix drops the 'I' prefix of a purely-numeric
    4-digit local name and is the local name verbatim otherwise."""
    import hashlib

    if not iglocalname:
        # the reference would IndexError here (migrate-bvm.py:373); fail
        # with the volume named so a malformed row is diagnosable
        raise ValueError(
            f"empty image-group local name for image list {iilname!r}")
    hashbucket = hashlib.md5(iilname.encode("utf8")).hexdigest()[:2]
    pre, rest = iglocalname[0], iglocalname[1:]
    suffix = rest if (pre == "I" and rest.isdigit() and len(rest) == 4) \
        else iglocalname
    return (f"Works/{hashbucket}/{iilname}/images/"
            f"{iilname}-{suffix}/dimensions.json")


class ImageListStore:
    """Image-list side files with the reference's cache discipline
    (migrate-bvm.py:380-387 get_img_list): look for
    ``<cache_dir>/<iglocalname>.json.gz``; on a miss, fetch the remote key
    via the injected ``fetch: Callable[[str], bytes]`` (bytes of the .json.gz
    object) and persist it; parse with gzip+json. With no fetcher (the
    default) a cache miss raises — the engine never silently invents an
    image list. A PaginationCache memo on top gives the per-actor LRU-1
    behavior for consecutive volumes."""

    def __init__(self, cache_dir: str,
                 fetch: Callable[[str], bytes] | None = None):
        self.cache_dir = cache_dir
        self.fetch = fetch
        self.fetch_calls = 0
        self._memo = PaginationCache(self._load)

    def _path(self, iglocalname: str) -> str:
        import os

        return os.path.join(self.cache_dir, f"{iglocalname}.json.gz")

    def _load(self, key: str):
        import gzip
        import json
        import os

        iilname, iglocalname = key.split("|", 1)
        fname = self._path(iglocalname)
        if not os.path.exists(fname):
            if self.fetch is None:
                raise FileNotFoundError(
                    f"image list {iglocalname} not in cache {self.cache_dir} "
                    f"and no fetcher injected")
            os.makedirs(self.cache_dir, exist_ok=True)
            payload = self.fetch(image_list_key(iilname, iglocalname))
            self.fetch_calls += 1
            tmp = f"{fname}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, fname)  # atomic: concurrent actors never see a
            # half-written side file
        with gzip.open(fname, "r") as f:
            return json.load(f)

    def get(self, iilname: str, iglocalname: str):
        return self._memo.get(f"{iilname}|{iglocalname}")
