"""Round-9 bounded-oracle rewrites, property-checked against independent
references (DuckDB-only — no SparkSession, so these run in seconds).

The three sf1-timeout oracles were rewritten into equivalent bounded
forms (PARITY_SWEEPS.md round-9 section). Sweep parity at 12 datasets
shows the engine and the new oracles agree; these tests additionally
pin the new ORACLES to brute-force references on adversarial random
inputs, so a rewrite bug can't hide behind a matching engine bug:

- identity_stitching's min-label propagation vs a Python union-find
  over the SAME node-id semantics (including user/device id collisions
  from negative k, which merge nodes by id — the exact case a
  bipartite-collapse rewrite would get wrong);
- skyline's per-day-min + suffix-min sweep vs the O(n²) dominance scan.
"""

from __future__ import annotations

import json
import math
import os
import sys

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def oracles():
    from etl_manager_spark.workloads import load_registry

    reg = load_registry()
    return {
        "stitch": reg["identity_stitching_events"].oracle,
        "skyline": reg["skyline_orders_price_date"].oracle,
    }


# --------------------------------------------------------------------- #
# identity stitching


def _union_find_reference(rows):
    """(cluster_id, n_users, n_devices) rows per the ORIGINAL closure
    semantics: nodes are ids (a device id colliding with a user id IS
    that node), edges from valid (user_id, 1000000+k) pairs, cluster
    label = min id in component, classification by id < 10^6."""
    edges = set()
    for user_id, props in rows:
        if user_id is None or props is None:
            continue
        try:
            k = json.loads(props).get("k")
        except (ValueError, TypeError):
            continue
        try:
            d = 1_000_000 + int(k)
        except (TypeError, ValueError):
            continue
        edges.add((user_id, d))
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, d in edges:
        for n in (u, d):
            parent.setdefault(n, n)
        ru, rd = find(u), find(d)
        if ru != rd:
            parent[max(ru, rd)] = min(ru, rd)
    comps = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    out = set()
    for root, nodes in comps.items():
        cluster = min(nodes)
        n_users = sum(1 for n in nodes if n < 1_000_000)
        n_devices = sum(1 for n in nodes if n >= 1_000_000)
        out.add((cluster, n_users, n_devices))
    return out


_props = st.one_of(
    st.none(),
    st.just("{}"),
    st.just('{"k": "oops"}'),
    st.integers(min_value=-5, max_value=30).map(lambda k: json.dumps({"k": k})),
    # string-typed numerics must parse too (TRY_CAST of the ->> text)
    st.integers(min_value=-5, max_value=30).map(
        lambda k: json.dumps({"k": str(k)})
    ),
)

_event_rows = st.lists(
    st.tuples(
        st.one_of(
            st.none(),
            st.integers(min_value=0, max_value=40),
            # ids straddling the 10^6 boundary collide with device ids:
            # 1_000_000 + k for k in [-5, 30] overlaps this band
            st.integers(min_value=999_995, max_value=1_000_030),
        ),
        _props,
    ),
    max_size=60,
)


@settings(max_examples=60, deadline=None)
@given(rows=_event_rows)
def test_stitching_oracle_matches_union_find(oracles, rows):
    duck = duckdb.connect()
    duck.execute("CREATE TABLE events (user_id BIGINT, props VARCHAR)")
    duck.executemany("INSERT INTO events VALUES (?, ?)", rows or [(None, None)])
    if not rows:
        duck.execute("DELETE FROM events")
    got = set(duck.execute(oracles["stitch"]).fetchall())
    duck.close()
    assert got == _union_find_reference(rows)


# --------------------------------------------------------------------- #
# skyline


def _skyline_reference(rows):
    """Strict-dominance brute force over (orderkey, day, price_cents):
    keep a iff no b has price<= & day>= with at least one strict."""
    pts = []
    for okey, day, price in rows:
        if day is None or price is None:
            continue
        pc = math.floor(
            float(duckdb.sql(
                f"SELECT CAST({price!r} AS DECIMAL(18,2)) * 100"
            ).fetchone()[0])
        )
        pts.append((okey, day, pc))
    out = set()
    for a in pts:
        dominated = any(
            b[2] <= a[2] and b[1] >= a[1] and (b[2] < a[2] or b[1] > a[1])
            for b in pts
        )
        if not dominated:
            out.add(a)
    return out


_order_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10**6),
        st.one_of(
            st.none(),
            st.dates(
                min_value=__import__("datetime").date(2023, 1, 1),
                max_value=__import__("datetime").date(2023, 1, 20),
            ),
        ),
        st.one_of(
            st.none(),
            st.decimals(
                min_value=0, max_value=999, places=2, allow_nan=False
            ).map(str),
        ),
    ),
    max_size=50,
    unique_by=lambda r: r[0],
)


@settings(max_examples=60, deadline=None)
@given(rows=_order_rows)
def test_skyline_oracle_matches_bruteforce(oracles, rows):
    duck = duckdb.connect()
    duck.execute(
        "CREATE TABLE orders (o_orderkey BIGINT, o_orderdate DATE, "
        "o_totalprice DECIMAL(18,2))"
    )
    duck.executemany(
        "INSERT INTO orders VALUES (?, ?, ?)", rows or [(1, None, None)]
    )
    if not rows:
        duck.execute("DELETE FROM orders")
    got = set(duck.execute(oracles["skyline"]).fetchall())
    duck.close()
    assert got == _skyline_reference(rows)
