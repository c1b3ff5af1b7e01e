"""Relational operator coverage over the TPC-H-ish testdata tables.

Demonstrates the engine's general relational surface (filters, multi-key
grouped aggregation with partial pre-aggregation, broadcast joins, sort +
limit, event-time windowed aggregation) with exact-integer money arithmetic
(floor(x*100+0.5) cents) so the DuckDB oracles hash-match bit-for-bit —
float summation order never leaks into results.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowutils import from_pandas_clean
from .docs import resolve_sf_dir

PRICING_CUTOFF = "1998-09-01"


def _table(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(resolve_sf_dir(sf_dir), f"{name}.parquet"),
                           columns=columns)


def _cents(arr) -> pa.Array:
    """Exact, order-independent money: floor(x*100 + 0.5) as int64 per row."""
    return pc.cast(pc.floor(pc.add(pc.multiply(arr, 100.0), 0.5)), pa.int64())


def pricing_summary_ds(sf_dir: str):
    """TPC-H Q1 shape: filter → per-batch cents conversion (combiner-ready) →
    multi-key groupby aggregate."""
    from ray.data.aggregate import Sum

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"],
                                   pa.scalar(pd.Timestamp(PRICING_CUTOFF))))
        disc_price = pc.multiply(t["l_extendedprice"],
                                 pc.subtract(1.0, t["l_discount"]))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty_c": _cents(t["l_quantity"]),
            "base_c": _cents(t["l_extendedprice"]),
            "disc_c": _cents(disc_price),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })

    return (_table(sf_dir, "lineitem",
                   ["l_returnflag", "l_linestatus", "l_quantity",
                    "l_extendedprice", "l_discount", "l_shipdate"])
            .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("qty_c", alias_name="sum_qty_c"),
                       Sum("base_c", alias_name="sum_base_c"),
                       Sum("disc_c", alias_name="sum_disc_c"),
                       Sum("one", alias_name="n_rows")))


def top_customers_ds(sf_dir: str, k: int = 10):
    """Broadcast join (customer name dict via ray.put) + grouped revenue +
    deterministic sort/limit (tiebreak on custkey)."""
    import ray
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq

    cust = pq.read_table(os.path.join(resolve_sf_dir(sf_dir), "customer.parquet"),
                         columns=["c_custkey", "c_name"])
    name_ref = ray.put(dict(zip(cust["c_custkey"].to_pylist(),
                                cust["c_name"].to_pylist())))

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t["o_custkey"],
            "rev_c": _cents(t["o_totalprice"]),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })

    class AttachName:
        def __init__(self, ref):
            self.names = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df["c_name"] = df["o_custkey"].map(self.names)
            return from_pandas_clean(df)

    agg = (_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
           .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("o_custkey")
           .aggregate(Sum("rev_c", alias_name="revenue_c"),
                      Sum("one", alias_name="n_orders")))
    return (agg.map_batches(AttachName, batch_format="pyarrow",
                            fn_constructor_kwargs={"ref": name_ref},
                            concurrency=(1, 2))
            .sort(["revenue_c", "o_custkey"], descending=[True, False])
            .limit(k))


def events_window_ds(sf_dir: str):
    """Tumbling 1-hour event-time windows per event_type (the engine's
    windowed-aggregate shape: window key derived per batch, then groupby)."""
    from ray.data.aggregate import Sum

    def prep(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t["ts"], pa.int64())
        window = pc.cast(pc.floor(pc.divide(pc.cast(epoch, pa.float64()),
                                            3_600_000_000.0)), pa.int64())
        return pa.table({
            "event_type": t["event_type"],
            "window": window,
            "val_c": _cents(t["value"]),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })

    return (_table(sf_dir, "events", ["event_type", "ts", "value"])
            .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["event_type", "window"])
            .aggregate(Sum("val_c", alias_name="sum_value_c"),
                       Sum("one", alias_name="n_events")))


def events_asof_ds(sf_dir: str, n_buckets: int = 16):
    """As-of join (J7 analog, ≈ the ordered image-list/pagination merge of
    migrate-bvm.py:286-356): each event picks the latest order of the same
    customer at or before its timestamp.

    Shape: hash-bucket events by key → per-bucket pd.merge_asof against the
    (small, broadcast) orders side, pre-deduplicated per (key, time) so the
    pick is unambiguous on both engines. For a large right side the identical
    code runs with orders pre-bucketed on the same key hash."""
    import ray
    import zlib

    import pyarrow.parquet as pq

    orders = (pq.read_table(os.path.join(resolve_sf_dir(sf_dir), "orders.parquet"),
                            columns=["o_custkey", "o_orderdate", "o_orderkey"])
              .to_pandas()
              .groupby(["o_custkey", "o_orderdate"], as_index=False)["o_orderkey"]
              .max()
              .sort_values("o_orderdate", kind="stable"))
    ref = ray.put(orders)

    def bucketize(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"])
        b = (uid % np.int64(n_buckets)).astype(np.int32)
        return t.append_column("kbucket", pa.array(b, pa.int32()))

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        right = ray.get(ref)
        keys = df["user_id"].unique()
        right = right[right["o_custkey"].isin(keys)]
        left = df.sort_values("ts", kind="stable")
        out = pd.merge_asof(left, right, left_on="ts", right_on="o_orderdate",
                            left_by="user_id", right_by="o_custkey",
                            direction="backward")
        out["o_orderkey"] = out["o_orderkey"].astype("float64")
        return out[["event_id", "user_id", "ts", "o_orderkey", "o_orderdate"]]

    return (_table(sf_dir, "events", ["event_id", "user_id", "ts"])
            .map_batches(bucketize, batch_format="pyarrow")
            .groupby("kbucket")
            .map_groups(join_bucket, batch_format="pandas"))


def orders_by_nation_ds(sf_dir: str):
    """Two-hop broadcast join orders→customer→nation, then grouped count."""
    import ray
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq

    d = resolve_sf_dir(sf_dir)
    cust = pq.read_table(os.path.join(d, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(os.path.join(d, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    cust_nation = dict(zip(cust["c_custkey"].to_pylist(),
                           cust["c_nationkey"].to_pylist()))
    nation_name = dict(zip(nation["n_nationkey"].to_pylist(),
                           nation["n_name"].to_pylist()))
    ref = ray.put((cust_nation, nation_name))

    class Hop:
        def __init__(self, ref):
            self.cn, self.nn = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df["n_name"] = df["o_custkey"].map(self.cn).map(self.nn)
            df["one"] = np.ones(len(df), dtype=np.int64)
            return from_pandas_clean(df[["n_name", "one"]])

    return (_table(sf_dir, "orders", ["o_custkey"])
            .map_batches(Hop, batch_format="pyarrow",
                         fn_constructor_kwargs={"ref": ref}, concurrency=(1, 2))
            .groupby("n_name")
            .aggregate(Sum("one", alias_name="n_orders")))
