"""Transcript invariant validation — the sort-within-conv_id stage.

Enforces the north rule's per-row invariant ("per-turn text equality under
stable turn ordering") plus the reference's monotonicity checks
(exportlocations.php:48-62: evolnum ≥ bvolnum, volume order; migrate-bvm.py
:243-260 duplicate/ordering validation) transposed to transcripts:

per conversation (sorted by turn_idx):
- turn_idx values are dense 0..n-1 and unique;
- ts is strictly monotone increasing in turn order;
- re-sorting any arrival permutation yields the same text sequence, which
  holds iff turn_idx is unique (checked) — the validation output is stable
  across input permutations.

Output: one row per conversation with boolean verdicts (empty-violation
convention: dense && monotone && unique everywhere when input is healthy).
"""

from __future__ import annotations

import pandas as pd

VALIDATE_COLUMNS = ["conv_id", "n_turns", "n_distinct", "max_idx", "dense", "ts_monotone"]


def validate_conv(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values("turn_idx", kind="stable")
    n = len(df)
    n_distinct = int(df["turn_idx"].nunique())
    max_idx = int(df["turn_idx"].max())
    dense = bool(n_distinct == n and max_idx == n - 1 and int(df["turn_idx"].min()) == 0)
    ts = df["ts"].astype("int64")
    ts_monotone = bool((ts.diff().dropna() > 0).all()) if n > 1 else True
    return pd.DataFrame({
        "conv_id": [df["conv_id"].iloc[0]],
        "n_turns": [n],
        "n_distinct": [n_distinct],
        "max_idx": [max_idx],
        "dense": [dense],
        "ts_monotone": [ts_monotone],
    })


def validate_transcripts(ds):
    """groupby(conv_id) validation — shares the conv-keyed shuffle shape."""
    return ds.groupby("conv_id").map_groups(validate_conv, batch_format="pandas")
