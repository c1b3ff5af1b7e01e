"""URI templates (M8), broadcast semi-join (J5), role pivot (A6)."""

import pytest

from rkts_migration_ray.functions import minting


def test_mint_from_template():
    assert minting.mint_from_template("turn", conv="c1", turn=7) == "U:c1/00007"
    assert minting.mint_from_template("conv", conv="c1") == "C:c1"
    assert minting.mint_from_template("entity", eid="WA000001") == "ENT:WA000001"
    with pytest.raises(ValueError):
        minting.mint_from_template("turn", conv="c1")  # %TURN unsubstituted


def test_broadcast_semi_join(sf_tag):
    import ray.data as rd

    from rkts_migration_ray.stages.canonicalize import broadcast_semi_join

    ds = rd.from_items([{"set": "W1"}, {"set": "2"}, {"set": "X9"}])
    # prefix-tolerant membership (utils.php:583-592: set / M+set / MW+set)
    out = broadcast_semi_join(ds, "set", {"MW1", "M2"}, prefixes=("", "M", "MW"))
    assert sorted(r["set"] for r in out.take_all()) == ["2", "W1"]


def test_role_pivot_parity(sf_tag):
    import duckdb
    import pandas as pd

    from rkts_migration_ray import oracles
    from rkts_migration_ray.pipelines import kg

    ray_df = kg.role_pivot_ds(sf_tag).to_pandas()
    sql_df = duckdb.sql(oracles.kg_oracle_sql(sf_tag)["kg_role_pivot"]).df()
    a = ray_df.sort_values("conv_id").reset_index(drop=True)[sorted(ray_df.columns)]
    b = sql_df.sort_values("conv_id").reset_index(drop=True)[sorted(sql_df.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert (a["n_total"] == a[["n_user", "n_assistant", "n_tool", "n_system"]]
            .sum(axis=1)).all()
