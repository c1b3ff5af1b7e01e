"""Driver contract for the graft builder (Ray Data target).

The driver calls ray.init() itself before importing this module; nothing here
(or in rkts_migration_ray) calls ray.init()/ray.shutdown().

- entry(): flagship KG pipeline (transcripts → triples) on the sf0.001-scale
  deterministic fixture; returns the triple Dataset.
- queries(): one callable per implemented pipeline (SURVEY.md §2 coverage);
  each takes sf_dir and returns a Dataset / DataFrame / Table.
- oracle_sql(): DuckDB twins of each query at sf=0.01, reading the same
  deterministic fixture parquet (generated idempotently at import so the
  oracle can run in any order relative to the Ray side).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from rkts_migration_ray import fixtures, oracles
from rkts_migration_ray.pipelines import kg
from rkts_migration_ray.sources import readers
from rkts_migration_ray.stages.validate import validate_transcripts

# the driver compares at sf0.01; make sure the oracle's parquet exists even if
# the SQL runs before any queries() callable (generation is cheap + cached)
fixtures.ensure_fixture("sf0.01")
fixtures.ensure_fixture("sf0.001")


def entry() -> Any:
    """Flagship pipeline on the sf0.001-scale fixture; driver checks rows>=0."""
    return kg.kg_triples_ds("sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {
        "kg_structural": lambda sf: kg.structural_ds(sf, include_quarantine=False),
        "kg_conv_triples": kg.conv_triples_ds,
        "kg_mentions": kg.mention_triples_ds,
        "kg_entities": lambda sf: kg.entity_triples_ds(sf, include_quarantine=False),
        "kg_quarantine": kg.quarantine_ds,
        "kg_locations": kg.locations_ds,
        "kg_validate": lambda sf: validate_transcripts(readers.read_transcripts(sf)),
        "kg_triples": kg.kg_triples_ds,
    }
    return q


def oracle_sql() -> dict[str, str]:
    return oracles.kg_oracle_sql("sf0.01")
