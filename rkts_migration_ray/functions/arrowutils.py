"""Arrow helpers: vectorized extract-all-matches without per-row Python regex.

pyarrow.compute has extract_regex (first match only). For repeated markers
(mentions '@[..]', titles 'ttl[k]{..}') we split on the marker prefix with
pc.split_pattern, flatten the list, and run one extract_regex over the flat
tail fragments — all Arrow kernels, no Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def extract_all(
    text: pa.Array | pa.ChunkedArray, split_prefix: str, tail_pattern: str
) -> tuple[np.ndarray, pa.StructArray]:
    """Return (row_indices, struct_of_groups) for every occurrence of a marker.

    ``split_prefix`` is the literal marker prefix (e.g. '@['); ``tail_pattern``
    is an anchored named-group regex applied to the text following each prefix
    (e.g. r'^(?P<alias>[^\\]]*)\\]').  Rows with no marker contribute nothing.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    parts = pc.split_pattern(text, pattern=split_prefix)
    offsets = np.asarray(parts.offsets)
    flat = parts.values
    n_rows = len(text)
    # element j belongs to row r where offsets[r] <= j < offsets[r+1];
    # the first element of each row's list is the pre-marker prefix — drop it.
    row_of = np.repeat(np.arange(n_rows), np.diff(offsets))
    is_first = np.zeros(len(flat), dtype=bool)
    starts = offsets[:-1][np.diff(offsets) > 0]
    is_first[starts] = True
    keep = ~is_first
    if not keep.any():
        empty = pc.extract_regex(pa.array([], pa.string()), tail_pattern)
        return np.array([], dtype=np.int64), empty
    tails = flat.filter(pa.array(keep))
    rows = row_of[keep]
    extracted = pc.extract_regex(tails, tail_pattern)
    valid = np.asarray(pc.is_valid(extracted))
    return rows[valid], extracted.filter(pa.array(valid))


def from_pandas_clean(df, schema: pa.Schema | None = None) -> pa.Table:
    """pandas → Arrow without the pandas schema-metadata blob (which defeats
    Ray Data's block schema deduplication and bloats object-store blocks)."""
    t = pa.Table.from_pandas(df, preserve_index=False)
    if schema is not None:
        t = t.cast(schema)
    return t.replace_schema_metadata(None)


def empty_string_to_null(arr: pa.Array) -> pa.Array:
    return pc.if_else(pc.equal(arr, ""), pa.scalar(None, pa.string()), arr)


def to_int64(arr: pa.Array) -> pa.Array:
    """'' → null, then cast to int64 (intval coercions, utils.php:419,424,688)."""
    return pc.cast(empty_string_to_null(arr), pa.int64())
