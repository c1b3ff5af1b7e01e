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


def test_dialog_act_question_regex_cross_engine():
    """Round-4 advice: the trailing-'?' question test must classify
    identically in pandas (Python re, Unicode-aware \\s) and DuckDB (RE2,
    ASCII \\s) — both sides now pin the ASCII class [ \\t\\r\\n]. NBSP and
    other Unicode spaces after '?' are the cases that used to diverge."""
    import duckdb
    import pandas as pd

    cases = ["a?", "a? ", "a?\t", "a?\r\n", "a?  \t ", "a?x", "x a? b",
             "a? ", "a? ", "a?" + chr(0x1680), "", "?",
             "tail space then q?  "]
    py = (pd.Series(cases)
          .str.contains(r"\?[ \t\r\n]*$", regex=True, na=False).tolist())
    con = duckdb.connect()
    sql = con.execute(
        "SELECT regexp_matches(s, '\\?[ \t\r\n]*$') "
        "FROM (SELECT unnest(?::VARCHAR[]) AS s)", [cases]).fetchall()
    duck = [bool(r[0]) for r in sql]
    assert py == duck
    # and the NBSP case specifically is NOT a question on either side
    assert py[cases.index("a? ")] is False
