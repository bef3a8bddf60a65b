"""Property test for the skyline two-phase pruning: on ANY random point
set, the per-day-min + strict-suffix-min + filter plan must equal the
brute-force strict-dominance definition. Small integer domains force
heavy ties (same day, same price, duplicate points) — exactly where
two-phase prunings go wrong."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_manager_spark.workloads.analytics import skyline_orders_price_date

_BASE = datetime.date(2024, 1, 1)


def _reference(points):
    """Brute force: (key, day, price) survives iff no other point has
    (price' <= price AND day' >= day) with at least one strict."""
    out = []
    for k, d, p in points:
        dominated = any(
            (p2 <= p and d2 >= d) and (p2 < p or d2 > d)
            for k2, d2, p2 in points
            if k2 != k
        )
        if not dominated:
            out.append((k, d, p))
    return sorted(out)


points_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 7)),  # (day offset, price)
    min_size=1,
    max_size=25,
)


@settings(max_examples=30, deadline=None)
@given(pts=points_strategy)
def test_skyline_matches_bruteforce(spark, tmp_path_factory, pts):
    rows = [
        (i, _BASE + datetime.timedelta(days=d), float(p))
        for i, (d, p) in enumerate(pts)
    ]
    td = tmp_path_factory.mktemp("skyline")
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([0] * len(rows), pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows)),
            "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[1] for r in rows], pa.date32()),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
        }
    )
    pq.write_table(tbl, str(td / "orders.parquet"))
    got = sorted(
        (r["o_orderkey"], r["day"], r["price_c"] // 100)
        for r in skyline_orders_price_date(spark, str(td)).collect()
    )
    exp = _reference([(r[0], r[1], int(r[2])) for r in rows])
    assert got == exp
