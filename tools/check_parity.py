"""Local stand-in for the driver's correctness gate.

Runs every queries() entry through Ray AND its oracle_sql() twin through
DuckDB on the same fixture tier, then compares row count, schema (sorted
column names) and an order-insensitive value comparison (sorted rows).

    python tools/check_parity.py [sf_tag=sf0.001]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].where(pd.notna(df[c]), None)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> bool:
    ok = True
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        print(f"  [{name}] SCHEMA MISMATCH ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return False
    if len(ray_df) != len(sql_df):
        print(f"  [{name}] ROWCOUNT MISMATCH ray={len(ray_df)} sql={len(sql_df)}")
        ok = False
    a, b = normalize(ray_df), normalize(sql_df)
    n = min(len(a), len(b))
    if not a.head(n).reset_index(drop=True).equals(b.head(n).reset_index(drop=True)):
        diff = (a.head(n).reset_index(drop=True) != b.head(n).reset_index(drop=True))
        bad = diff.any(axis=1)
        print(f"  [{name}] VALUE MISMATCH in {int(bad.sum())}/{n} rows; first diffs:")
        idx = bad[bad].index[:3]
        for i in idx:
            print("    ray:", a.iloc[i].to_dict())
            print("    sql:", b.iloc[i].to_dict())
        ok = False
    return ok


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "sf0.001"
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    try:
        sys.path.insert(0, ".")
        import __ray_entry__ as e
        from rkts_migration_ray import oracles
        from rkts_migration_ray.pipelines.docs import resolve_sf_dir

        con = duckdb.connect()
        sf_dir = resolve_sf_dir(tag)
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

        qs = e.queries()
        from rkts_migration_ray.stages import multimodal

        sqls = oracles.kg_oracle_sql(tag)
        sqls.update(oracles.bvm_oracle_sql(tag))
        sqls.update(oracles.doc_rel_oracle_sql())
        sqls.update(oracles.mm_oracle_sql(
            multimodal.ensure_media_fixture("/tmp/graft_fixtures/media")))
        only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
        failures = []
        for name, fn in qs.items():
            if only and name not in only:
                continue
            res = fn(tag)
            ray_df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
            if name not in sqls:
                print(f"  [{name}] rows-only: {len(ray_df)}")
                continue
            sql_df = con.sql(sqls[name]).df()
            if compare(name, ray_df, sql_df):
                print(f"  [{name}] OK rows={len(ray_df)}")
            else:
                failures.append(name)
        print("FAILURES:", failures or "none")
        return 1 if failures else 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
