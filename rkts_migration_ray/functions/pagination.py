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

PG_RE = re.compile(r"^(?P<folio>\d+)(?P<dup>x?)(?P<side>[ab]?)$")


def folio_side_to_pagenum(folio: int, side: str, one_a: int = 1,
                          first_folio: int = 1) -> int:
    """Arithmetic image-number resolution (utils.php:390-403 semantics):
    pages before `first_folio` don't exist on film; 'a' side is the first
    image of a folio, 'b' the second; `one_a` shifts for leading matter."""
    eff = folio - (first_folio - 1)
    if eff < 1:
        raise ValueError(f"folio {folio} precedes first folio {first_folio}")
    return 2 * (eff - 1) + one_a + (1 if side == "b" else 0)


def parse_pagination_token(tok: str) -> tuple[int, int, int] | None:
    """'107a' → (107, 0, 0); '107xb' → (107, 1, 1); None if unparsable."""
    m = PG_RE.match(tok)
    if not m:
        return None
    return (int(m.group("folio")), 1 if m.group("dup") else 0,
            0 if m.group("side") in ("", "a") else 1)


def compare_pagination(a: str, b: str) -> int:
    """comparepg semantics (migrate-bvm.py:58-76): lexicographic on
    (folio, dup-mark, side); unparsable tokens compare equal (0) so they
    don't poison monotonicity validation."""
    ta, tb = parse_pagination_token(a), parse_pagination_token(b)
    if ta is None or tb is None:
        return 0
    return (ta > tb) - (ta < tb)


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
