"""PII pattern-family unit tests (conv_pii_spans / conv_pii_redact).

The synthetic corpus exercises only the identifier families (entity_id,
location_ref, chapter_ref — covered by the sf0.001 oracle parity in
test_pipeline.py); the standard web-PII families (email, ipv4, phone) are
exercised here on crafted strings through the SAME Arrow RE2 kernels the
pipeline uses, and cross-checked against DuckDB so all three engines
(polars Rust regex, Arrow RE2, DuckDB RE2) agree on every family.
"""

import duckdb
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from rkts_migration_ray.pipelines.kg import PII_PATTERNS

PATS = dict(PII_PATTERNS)

CRAFTED = (
    "mail bob.smith+spam@ex-ample.co.uk then 10.0.255.7 and +41 555 1234 "
    "plus @[ent-00042] loc{ka 12a3} locs{5-7} chl{x??} chls{3-4} end"
)

EXPECT = {
    "email": ["bob.smith+spam@ex-ample.co.uk"],
    "ipv4": ["10.0.255.7"],
    "phone": ["+41 555 1234"],
    "entity_id": ["@[ent-00042]"],
    "location_ref": ["loc{ka 12a3}", "locs{5-7}"],
    "chapter_ref": ["chl{x??}", "chls{3-4}"],
}


def test_families_match_crafted_spans():
    arr = pa.array([CRAFTED])
    for fam, pat in PII_PATTERNS:
        # Arrow RE2 count (the redact op's counting kernel)
        assert pc.count_substring_regex(arr, pat)[0].as_py() == \
            len(EXPECT[fam]), fam
        # polars Rust regex extraction (the spans op's kernel)
        got = (pl.DataFrame({"t": [CRAFTED]})
               .select(pl.col("t").str.extract_all(pat))["t"][0].to_list())
        assert got == EXPECT[fam], fam
        # DuckDB RE2 (the oracle's kernel)
        sql = duckdb.sql(
            "SELECT regexp_extract_all(?, ?)", params=[CRAFTED, pat]
        ).fetchone()[0]
        assert sql == EXPECT[fam], fam


def test_families_disjoint_on_crafted_text():
    """No span of one family intersects a span of another (the redaction
    order-independence argument in conv_pii_redact_ds's docstring)."""
    import re

    taken = []
    for fam, pat in PII_PATTERNS:
        for m in re.finditer(pat, CRAFTED):
            for (a, b) in taken:
                assert m.end() <= a or m.start() >= b, fam
            taken.append((m.start(), m.end()))


def test_redact_kernel_produces_typed_placeholders():
    text = pa.array([CRAFTED])
    for fam, pat in PII_PATTERNS:
        text = pc.replace_substring_regex(text, pat, "<" + fam.upper() + ">")
    out = text[0].as_py()
    assert out.count("<EMAIL>") == 1 and out.count("<IPV4>") == 1
    assert out.count("<PHONE>") == 1 and out.count("<ENTITY_ID>") == 1
    assert out.count("<LOCATION_REF>") == 2 and out.count("<CHAPTER_REF>") == 2
    for fam in PATS:
        for src in EXPECT[fam]:
            assert src not in out
