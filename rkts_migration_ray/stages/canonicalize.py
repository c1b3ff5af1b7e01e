"""Canonicalization merge + salted exact distinct.

≈ the reference's duplicate-expression merge (gl_KanToTenExpressions,
kernelxmltottl.php:90-102,234-241) and seen-set dedup (A5/A7), re-expressed as
explicit groupby merges instead of cross-pass in-memory buffers (ST5).

Skew handling: the fixture's head entities appear in ~20% of turns (the
analog of P7326 in rkts-actors.csv). Two-phase distinct bounds every group:
1. partial: in-batch drop_duplicates inside map_batches (combiner) — a head
   key collapses to ≤1 row per input block;
2. final: groupby on a salted key, then on the bare key, each group now tiny.
For post-combiner streams whose per-key row count is already ≤ #blocks the
single bare-key groupby suffices (salt=1).
"""

from __future__ import annotations

import pandas as pd
import zlib


def _crc_salt(values: pd.Series, salt: int) -> pd.Series:
    return values.map(lambda v: zlib.crc32(v.encode()) % salt)


def distinct_on(ds, key: str, salt: int = 1):
    """Exact distinct rows by ``key`` (first occurrence, any order) with
    partial in-batch dedup and optional salted two-phase merge."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(key)

    def head1(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(key)

    out = ds.map_batches(partial, batch_format="pandas")
    if salt > 1:
        def add_salt(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_salt"] = df[key].astype(str).map(lambda v: zlib.crc32(v.encode()) % salt)
            return df

        out = (out.map_batches(add_salt, batch_format="pandas")
                  .groupby(["_salt", key])
                  .map_groups(head1, batch_format="pandas")
                  .drop_columns(["_salt"]))
    return out.groupby(key).map_groups(head1, batch_format="pandas")


def broadcast_semi_join(ds, column: str, keyset, prefixes: tuple[str, ...] = ("",)):
    """Semi-join against a broadcast key set with prefix tolerance.

    ≈ the loc `set`-filter (utils.php:583-592): a child is kept when
    set == eid OR 'M'+set == eid OR 'MW'+set == eid. Here: a row survives
    when any prefix+value is in the broadcast set. The set ships once via
    ray.put; the filter is a vectorized isin per batch (no shuffle)."""
    import ray

    ref = ray.put(frozenset(keyset))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        mask = None
        for p in prefixes:
            m = (p + df[column].astype(str)).isin(ks)
            mask = m if mask is None else (mask | m)
        return df[mask]

    return ds.map_batches(keep, batch_format="pandas")


def add_triple_key(df: pd.DataFrame) -> pd.DataFrame:
    """Content key for triple-level exact dedup (sha-free: concat is enough
    for grouping; the groupby key never leaves the job)."""
    df = df.copy()
    df["_tk"] = (df["subj"] + "\x1f" + df["pred"] + "\x1f" + df["obj"]
                 + "\x1f" + df["obj_lang"] + "\x1f" + df["obj_dt"] + "\x1f" + df["graph"])
    return df


def distinct_triples(ds, salt: int = 1):
    """Exact dedup of a triple Dataset by full row content."""
    keyed = ds.map_batches(add_triple_key, batch_format="pandas")
    return distinct_on(keyed, "_tk", salt=salt).drop_columns(["_tk"])
