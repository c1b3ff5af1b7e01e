"""Literal normalization: Tibetan shad appending, language policy, dedup keys.

Semantics from the reference:
- add_shad (utils.php:777-793): append ' /' after final ng, nothing after
  g/k/…sh (with exceptions), '/' after other Tibetan letters; vowel a/i/e/o is
  skipped when finding the "last letter".
- normalize_lit (utils.php:804-818): for the bdrc target drop
  cmg-x-poppe-simpl and sa-Deva literals; apply add_shad to *-ewts tags.
- title dedup key (kernelxmltottl.php:209-214): lowercase, strip '-' and ' '.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DROPPED_LANGS_BDRC


def add_shad(s: str) -> str:
    """Faithful reimplementation of utils.php:777-793 (rules, not code).

    Inline doc-test inputs recorded at utils.php:795-802; derived goldens:
    'a ga'→'a ga', 'a sho'→'a sho', 'a ki'→'a ki', 'a gu'→'a gu/',
    'a nga'→'a nga /', 'a ngu'→'a ngu/', 'a ngi'→'a ngi /', 'a tsho'→'a tsho/'
    (the vowel-skip set is a/i/e/o only — 'u' is treated as a final letter).
    """
    n = len(s)
    if n < 2:
        return s
    last = s[-1]
    if last in "aieo":
        last = s[-2]
    if n > 2 and last == "g" and s[-3] == "n":
        return s + " /"
    if (
        last in "gk"
        or (n == 3 and last == "h" and s[-3] == "s")
        or (n > 3 and last == "h" and s[-3] == "s" and s[-4] != "t")
    ):
        return s
    if last < "A" or last > "z" or ("Z" < last < "a"):
        return s
    return s + "/"


def add_shad_array(arr: pa.Array) -> pa.Array:
    """Vectorized add_shad via positional char columns + numpy select.

    Avoids a per-row Python call in the title-normalization hot path."""
    if len(arr) == 0:
        return pa.array([], pa.string())
    raw = np.asarray(pc.cast(arr, pa.string()), dtype=object)
    null_mask = np.array([x is None for x in raw])
    np_arr = np.where(null_mask, "", raw)
    n = np.array([len(x) for x in np_arr])
    # fixed-position characters from the end (empty when out of range)
    def char_at(offset: int) -> np.ndarray:
        return np.array(
            [x[offset] if len(x) >= -offset else "" for x in np_arr],
            dtype=object,
        )

    c1, c2, c3, c4 = char_at(-1), char_at(-2), char_at(-3), char_at(-4)
    last = np.where(np.isin(c1, list("aieo")), c2, c1)
    is_ng = (n > 2) & (last == "g") & (c3 == "n")
    keep = (
        np.isin(last, ["g", "k"])
        | ((n == 3) & (last == "h") & (c3 == "s"))
        | ((n > 3) & (last == "h") & (c3 == "s") & (c4 != "t"))
    )
    non_letter = np.array(
        [(c < "A" or c > "z" or ("Z" < c < "a")) if c else True for c in last],
        dtype=bool,
    )
    out = np.select(
        [n < 2, is_ng, keep, non_letter],
        [np_arr, np_arr + " /", np_arr, np_arr],
        default=np_arr + "/",
    )
    out[null_mask] = None
    return pa.array(out, type=pa.string())


def title_dedup_key(title_arr: pa.Array) -> pa.Array:
    """Case/separator-insensitive dedup key (kernelxmltottl.php:209-214)."""
    t = pc.utf8_lower(title_arr)
    t = pc.replace_substring(t, "-", "")
    return pc.replace_substring(t, " ", "")


def normalize_title_array(title_arr: pa.Array, lang_arr: pa.Array, target: str) -> pa.Array:
    """normalize_lit semantics (utils.php:804-818): returns normalized titles,
    null where the language policy drops the literal entirely."""
    titles = pc.cast(title_arr, pa.string())
    if target != "bdrc":
        return titles
    is_ewts = pc.match_substring_regex(lang_arr, "ewts$")
    shadded = add_shad_array(titles)
    out = pc.if_else(is_ewts, shadded, titles)
    dropped = pc.is_in(lang_arr, value_set=pa.array(sorted(DROPPED_LANGS_BDRC)))
    return pc.if_else(dropped, pa.scalar(None, pa.string()), out)
