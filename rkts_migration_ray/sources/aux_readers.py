"""Auxiliary source utilities (SURVEY.md §2.1 S2/S6/S7/S11 analogs).

- load_yaml_config: YAML → PipelineConfig (rkts.yaml behavior flags,
  migrate.php:63) — gated import, falls back to JSON.
- read_json_gz: gzipped-JSON side files (gz_get_contents, utils.php:199-209)
  read once per actor / driver, not per record.
- sorted_json_keys: numeric key-sort of pagination-style dicts
  (ksort at utils.php:238,298).
- glob_with_denylist: path discovery with substring exclusion
  (migrate-bvm.py:395-404).
"""

from __future__ import annotations

import glob as _glob
import gzip
import json

from ..config import DEFAULT_CONFIG, PipelineConfig


def load_yaml_config(path: str) -> PipelineConfig:
    """YAML (or JSON) file → PipelineConfig; unknown keys ignored."""
    text = open(path).read()
    data = None
    try:
        import yaml  # type: ignore

        data = yaml.safe_load(text)
    except ImportError:
        data = json.loads(text)
    if not isinstance(data, dict):
        return DEFAULT_CONFIG
    fields = {f for f in PipelineConfig.__dataclass_fields__}
    return PipelineConfig(**{k: v for k, v in data.items() if k in fields})


def read_json_gz(path: str):
    """Stream-decompress one gzipped JSON document."""
    with gzip.open(path, "rt", encoding="utf-8") as f:
        return json.load(f)


def sorted_json_keys(d: dict) -> list:
    """Numeric-aware key sort (pagination dicts use stringified ints)."""
    def key(k):
        try:
            return (0, int(k))
        except (TypeError, ValueError):
            return (1, str(k))

    return sorted(d, key=key)


def glob_with_denylist(pattern: str, deny_substrings: list[str]) -> list[str]:
    """Recursive glob minus any path containing a denied substring."""
    return sorted(p for p in _glob.glob(pattern, recursive=True)
                  if not any(d in p for d in deny_substrings))
