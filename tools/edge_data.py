"""Adversarial edge-case twins of the driver testdata tables.

The oracle-parity gate (tests/test_oracle_parity.py, driver CORRECTNESS)
proves Spark == DuckDB on the *real* synthetic data. That data is benign:
keys are unique, FKs resolve, text is non-empty ASCII, every JSON prop
parses, no column is ever NULL. At 100 TB none of that holds — so this
tool writes the same ten tables (identical parquet physical schemas,
checked against /root/testdata) populated with the hostile rows a real
corpus contains, and tools/edge_parity.py re-runs the full Spark-vs-DuckDB
catalog over them. A query that diverges or crashes here would diverge or
crash in production on the row the sf* data never contains.

Two datasets:

- ``empty``  — all tables, zero rows, exact schema. Every query must agree
  with its oracle on the empty database (typically 0 rows or one all-NULL /
  zero-count aggregate row) without crashing.
- ``weird``  — a handful of rows per table covering, deliberately:
  NULL in every nullable column (incl. NULL timestamps, NULL text, NULL
  embedding), duplicate primary keys, dangling foreign keys, full-row
  duplicates (total-order tiebreak discipline: identical rows make any
  non-total ORDER BY visible as nondeterminism), empty/whitespace/unicode
  strings, zero/negative/extreme numerics, ties on every ordering column,
  derived-column drift (n_chars disagreeing with text), JSON props with
  missing/null/non-numeric keys, zero-norm and duplicate embeddings.

Values are hand-written constants — the generator is bit-deterministic
with no RNG and no clock. Floats are chosen exactly representable in
binary (halves/quarters/1024ths) so the decimal-exact parity discipline
is preserved end-to-end.

Usage:  python tools/edge_data.py [--out DIR]     (default .edgedata/)
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

SCHEMAS: dict[str, pa.Schema] = {
    "region": pa.schema(
        [("r_regionkey", pa.int32()), ("r_name", pa.string())]
    ),
    "nation": pa.schema(
        [
            ("n_nationkey", pa.int32()),
            ("n_name", pa.string()),
            ("n_regionkey", pa.int32()),
        ]
    ),
    "customer": pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("c_nationkey", pa.int32()),
            ("c_acctbal", pa.float64()),
            ("c_mktsegment", pa.string()),
        ]
    ),
    "supplier": pa.schema(
        [
            ("s_suppkey", pa.int64()),
            ("s_name", pa.string()),
            ("s_nationkey", pa.int32()),
            ("s_acctbal", pa.float64()),
        ]
    ),
    "part": pa.schema(
        [
            ("p_partkey", pa.int64()),
            ("p_name", pa.string()),
            ("p_brand", pa.string()),
            ("p_type", pa.string()),
            ("p_size", pa.int32()),
            ("p_retailprice", pa.float64()),
        ]
    ),
    "orders": pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    ),
    "lineitem": pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("l_partkey", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("l_linenumber", pa.int32()),
            ("l_quantity", pa.float64()),
            ("l_extendedprice", pa.float64()),
            ("l_discount", pa.float64()),
            ("l_tax", pa.float64()),
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("l_shipdate", pa.timestamp("us")),
        ]
    ),
    "events": pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    ),
    "documents": pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    ),
    "embeddings": pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    ),
}


def _ts(s: str | None):
    return None if s is None else datetime.fromisoformat(s)


def _vec(fill: float, dim: int = 64, **spikes: float) -> list[float]:
    """A 64-dim float32-exact vector: ``fill`` everywhere, with positional
    overrides given as p<idx>=value (e.g. p0=1.0)."""
    v = [fill] * dim
    for k, val in spikes.items():
        v[int(k[1:])] = val
    return v


# --- weird rows ------------------------------------------------------------
# Column order matches SCHEMAS. Every nullable column is NULL in at least
# one row; every table carries a duplicate primary key and a full-row
# duplicate; FK columns include at least one dangling value (9_999).

WEIRD: dict[str, list[tuple]] = {
    "region": [
        (0, "AMERICA"),
        (1, ""),                      # empty name
        (2, None),                    # NULL name
        (3, " EUROPE "),              # untrimmed
        (4, "АЗИЯ 🌏"),               # unicode
        (0, "AMERICA"),               # full-row duplicate (dup PK too)
    ],
    "nation": [
        (0, "NATION_0", 0),
        (1, "NATIÓN_1", 0),
        (2, None, 1),                 # NULL name
        (3, "NATION_3", None),        # NULL FK
        (4, "NATION_4", 9_999),       # dangling FK
        (5, "N", 2),
        (0, "NATION_0", 0),           # full-row duplicate
        (6, "NATION_6", 4),
    ],
    "customer": [
        (1, "Customer#1", 0, 100.25, "BUILDING"),
        (2, "Customer#2", 1, None, "MACHINERY"),          # NULL acctbal
        (3, "Customer#3", 2, -999.5, "AUTOMOBILE"),       # negative
        (4, "Customer#4", 3, 0.0, "FURNITURE"),           # zero tie …
        (5, "Customer#5", 3, 0.0, "FURNITURE"),           # … same balance
        (6, "Customer#6", None, 50.5, "HOUSEHOLD"),       # NULL FK
        (7, "Customer#7", 9_999, 10.0, "HOUSEHOLD"),      # dangling FK
        (8, "Customer#8a", 4, 1.0, "BUILDING"),           # dup PK,
        (8, "Customer#8b", 4, 2.0, "BUILDING"),           #   two payloads
        (9, "", 5, 5.0, "MACHINERY"),                     # empty name
        (10, "顧客#10 🚀", 0, 3.25, "BUILDING"),          # unicode
        (11, None, 1, 7.5, None),                         # NULL name+segment
        (1, "Customer#1", 0, 100.25, "BUILDING"),         # full-row dup
    ],
    "supplier": [
        (1, "Supplier#1", 0, 0.0),
        (2, None, None, None),        # all-NULL payload
        (3, "Supplier#3", 1, -5.5),
        (4, "Supplier#4", 9_999, 2.25),                   # dangling FK
        (1, "Supplier#1", 0, 0.0),    # full-row duplicate
    ],
    "part": [
        (1, "spring green plate", "Brand#1", "STANDARD BRASS", 5, 10.0),
        (2, "", "Brand#2", "SMALL COPPER", None, 0.0),    # empty name, NULL size
        (3, None, "Brand#1", "PROMO STEEL", 0, None),     # NULL name+price
        (4, "part four 🔩", "Brand#3", None, 50, 1_000_000.25),
        (5, "spring green plates", "Brand#1", "STANDARD BRASS", 5, 10.0),  # near-dup name
        (1, "misty rose bolt", "Brand#9", "ECONOMY TIN", 1, 1.5),          # dup PK
        (6, "spring green plate", "Brand#1", "STANDARD BRASS", 5, 10.0),   # dup name
        (1, "spring green plate", "Brand#1", "STANDARD BRASS", 5, 10.0),   # full-row dup
    ],
    "orders": [
        (1, 1, "O", 100.5, _ts("2024-01-05 10:00:00"), "1-URGENT"),
        (2, 1, "F", 100.5, _ts("2024-01-05 10:00:00"), "2-HIGH"),      # price+date tie
        (3, 2, "P", None, _ts("2024-01-06 00:00:00"), "3-MEDIUM"),     # NULL price
        (4, 9_999, "O", 7.25, _ts("2024-01-07 12:30:00"), "4-NOT SPECIFIED"),  # dangling cust
        (5, None, "F", 0.0, _ts("2024-01-08 23:59:59.999999"), "5-LOW"),       # NULL cust
        (6, 3, "X", -1.5, None, "1-URGENT"),                           # odd status, NULL date
        (7, 8, "O", 2.5, _ts("1995-01-01 00:00:00"), "2-HIGH"),        # ancient, dup-PK cust
        (7, 8, "O", 2.5, _ts("1995-01-01 00:00:00"), "2-HIGH"),        # dup PK, full dup
        (8, 4, "O", 3.75, _ts("2024-01-05 10:00:00"), None),           # NULL priority
        (9, 5, "F", 100.5, _ts("2024-01-05 10:00:00"), "5-LOW"),       # 3-way tie
    ],
    "lineitem": [
        (1, 1, 1, 1, 2.0, 100.0, 0.25, 0.0, "N", "O", _ts("2024-01-06 00:00:00")),
        (1, 2, 1, 2, 0.0, 0.0, 0.0, 0.0, "N", "O", _ts("2024-01-06 00:00:00")),   # zero qty/price
        (1, 3, 3, 3, 1.0, 50.0, 1.0, 0.25, "R", "F", _ts("2024-01-07 00:00:00")), # 100% discount
        (2, 1, 1, 1, None, None, None, None, "A", "F", None),                      # NULL measures+date
        (3, 9_999, 9_999, 1, 5.0, 25.5, 0.5, 0.5, "N", "F", _ts("2024-01-08 00:00:00")),  # dangling FKs
        (4, 4, 4, 1, 3.0, 12.75, 0.25, 0.0, "Z", "Q", _ts("2024-01-09 00:00:00")),        # odd flags
        (5, 5, 1, 1, 2.5, 7.5, 0.0, 0.0, None, None, _ts("2024-01-09 00:00:00")),         # NULL flags
        (6, 1, 1, 1, 2.0, 100.0, 0.25, 0.0, "N", "O", _ts("2024-01-06 00:00:00")),        # measure ties
        (6, 1, 1, 1, 2.0, 100.0, 0.25, 0.0, "N", "O", _ts("2024-01-06 00:00:00")),        # dup (ok,ln), full dup
        (9_999, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _ts("2024-01-10 00:00:00")),       # dangling order
    ],
    "events": [
        (1, _ts("2024-01-01 00:00:00"), 42, "view", 1.5, '{"k": 87}'),
        (2, _ts("2024-01-01 00:00:00"), 42, "click", 1.5, '{"k": 0}'),       # same-instant tie
        (3, _ts("2024-01-01 00:00:00"), 7, "view", 1.5, '{"k": 12}'),        # 3-way tie, other user
        # extreme (25× the real generator's max) but inside every quantize
        # domain INCLUDING the squared-quantity ones (autocovariance /
        # variance pipelines quantize y², so |y| must stay ≲ 3e3)
        (4, _ts("2024-01-02 06:00:00"), 42, "purchase", 2500.25, '{"k": 1}'),
        (5, _ts("2024-01-02 06:00:00"), 42, "error", -2500.25, '{"k": 2}'),
        (6, _ts("2024-01-03 12:00:00"), None, "view", 0.0, '{"k": 3}'),      # NULL user
        (7, None, 42, "signup", 2.25, '{"k": 4}'),                           # NULL ts
        (8, _ts("2024-01-04 18:00:00"), 42, None, None, None),               # NULL type/value/props
        (9, _ts("2024-01-05 00:00:00"), 42, "", 5.0, "{}"),                  # empty type, no k
        (10, _ts("2024-01-05 00:00:00"), 42, "unknown", 5.0, '{"k": null}'), # JSON null k
        (11, _ts("2024-01-06 09:00:00"), 42, "view", 5.0, '{"k": "x"}'),     # non-numeric k
        (12, _ts("2024-01-06 09:00:00"), 42, "view", 5.0, '{"j": 1}'),       # missing k
        (13, _ts("2024-01-30 23:59:59.999999"), 8, "click", 0.25, '{"k": 9}'),  # range edge
        (8, _ts("2024-01-04 18:00:00"), 42, None, None, None),               # dup PK, full dup
        (14, _ts("2024-01-07 00:00:00"), 42, "view", 1.5, '{"k": 87}'),      # value tie
    ],
    "documents": [
        (1, "the fast key order sort table scan", "en", "src1", 34),
        (2, "", "en", "src1", 0),                                   # empty text
        (3, " \n\t  ", "en", "src2", 5),                            # whitespace only
        (4, "spark", "en", "src2", 5),                              # single token
        (5, "dup " * 200, "en", "src3", 800),                       # one token ×200
        (6, "数据 处理 引擎 🚀 数据", "zh", "src3", 13),             # unicode
        (7, None, "en", "src4", None),                              # NULL text+n_chars
        (8, "the fast key order sort table scan", "en", "src5", 34),   # exact dup text
        (9, "the fast key order sort table scans", "en", "src5", 35),  # near-dup
        (10, "short", None, None, 999),                             # NULL lang/src, n_chars drift
        (11, "mixed English 数据 text étude", "xx", "src6", 28),    # unknown lang tag
        (12, "a a a a a a a a b", "en", "", 17),                    # empty source
        (8, "the fast key order sort table scan", "en", "src5", 34),   # dup PK, full dup
    ],
    "embeddings": [
        (1, _vec(0.125), 0),
        (2, _vec(0.0), 1),                       # zero-norm
        (3, _vec(0.0, p0=1.0), 2),               # one-hot
        (4, _vec(0.0, p1=1.0), 2),               # orthogonal one-hot
        (5, _vec(-0.25), 0),                     # negative
        (6, _vec(0.125), 3),                     # exact dup of 1 (cosine tie)
        (7, _vec(0.5, p63=-0.5), None),          # NULL label
        (8, None, 4),                            # NULL embedding
        (9, _vec(0.25, p0=0.5, p1=0.75), 5),
        (1, _vec(0.125), 0),                     # dup PK, full dup
    ],
}


def nullts_rows() -> dict[str, list[tuple]]:
    """NULL-ordering adversary (round 9): events rows that pin the
    engines' OPPOSITE NULL-placement defaults (Spark ASC = NULLS FIRST /
    DESC = NULLS LAST; DuckDB the reverse) at exactly the adjacencies
    where they change answers — a NULL-ts row ADJACENT to a same-type
    timed run (run stitching / run_start), NULL ts BETWEEN two sessions,
    a (ts) tie broken by a NULL event_id (fold order, SCD2 chains), and
    an all-NULL-ts user. Found 4 oracle divergences on first run
    (udtf_event_runs run_start + rn order, ewma/holt fold tie-break,
    scd2 valid_to chain). Non-events tables reuse WEIRD's."""
    rows = dict(WEIRD)
    rows["events"] = [
        # user 1: NULL-ts rows adjacent to a same-type timed stream
        (1, None, 1, "click", 1.0, '{"k": 1}'),
        (2, None, 1, "click", 2.0, '{"k": 1}'),
        (3, _ts("2024-01-01 10:00:00"), 1, "click", 3.0, '{"k": 2}'),
        (4, _ts("2024-01-01 10:00:30"), 1, "view", 4.0, '{"k": 2}'),
        (5, _ts("2024-01-01 11:00:00"), 1, "click", 5.0, None),
        (6, _ts("2024-01-01 11:00:10"), 1, "purchase", 6.0, '{"k": 3}'),
        # user 2: ONLY null-ts rows
        (7, None, 2, "view", 1.5, "{}"),
        (8, None, 2, "view", 2.5, None),
        # user 3: null ts BETWEEN two sessions
        (9, _ts("2024-01-02 09:00:00"), 3, "click", 1.0, '{"k": 9}'),
        (10, None, 3, "click", 1.0, '{"k": 9}'),
        (11, _ts("2024-01-02 12:00:00"), 3, "click", 2.0, '{"k": 9}'),
        # user 4: duplicate ts tie broken by a NULL event_id
        (None, _ts("2024-01-03 08:00:00"), 4, "purchase", 7.0, '{"k": 4}'),
        (12, _ts("2024-01-03 08:00:00"), 4, "purchase", 8.0, '{"k": 4}'),
        (13, _ts("2024-01-03 08:10:00"), 4, "view", 9.0, '{"k": 4}'),
        # NULL user
        (14, _ts("2024-01-04 01:00:00"), None, "click", 1.0, "{}"),
    ]
    return rows


def fuzz_rows(seed: int) -> dict[str, list[tuple]]:
    """Seeded random tables: schema-valid, in-domain values, but with the
    hostile traits injected at random — NULLs in any nullable column,
    duplicate primary keys, full-row duplicates, dangling FKs, ordering
    ties, empty/unicode strings. The property under test is stronger
    than the curated `weird` set: Spark ≡ DuckDB on ARBITRARY data of
    this shape, not just on the rows someone thought to write down.
    Deterministic per seed (one `random.Random(seed)`, no clock)."""
    import random

    rng = random.Random(seed)

    def maybe(p, val):
        return None if rng.random() < p else val

    def ts():
        # mostly in the fixture's range, heavy tie mass on round hours
        base = rng.choice([0, 0, 0, 6, 12, 18])
        day = rng.randint(1, 30)
        if rng.random() < 0.5:
            return _ts(f"2024-01-{day:02d} {base:02d}:00:00")
        return _ts(
            f"2024-01-{day:02d} {rng.randint(0, 23):02d}:"
            f"{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}"
        )

    words = ["the", "data", "spark", "merge", "sort", "数据", "étude", "a",
             "row", "batch", "dup", "scan", "join", "key", "value"]

    def text():
        r = rng.random()
        if r < 0.08:
            return ""
        if r < 0.12:
            return " \t "
        n = rng.randint(1, 25)
        return " ".join(rng.choice(words) for _ in range(n))

    def value():
        # in the quantize domain incl. squared pipelines; exact binary
        # fractions keep the decimal-exact discipline honest
        return rng.choice(
            [0.0, 0.25, 1.5, -2.5, 87.125, 450.5, 2500.25, -2500.25,
             rng.randint(0, 400) / 4.0]
        )

    types = ["view", "click", "purchase", "signup", "error", "unknown", ""]
    langs = ["en", "de", "zh", "fr", "es", "xx"]
    out: dict[str, list[tuple]] = {}
    out["region"] = [
        (i, maybe(0.1, rng.choice(["AMERICA", "EUROPE", "ASIA", "", "АЗИЯ"])))
        for i in range(rng.randint(0, 5))
    ]
    out["nation"] = [
        (i, maybe(0.1, f"NATION_{i}"), maybe(0.15, rng.choice([0, 1, 2, 9999])))
        for i in range(rng.randint(0, 8))
    ]
    out["customer"] = [
        (rng.randint(1, 8), maybe(0.1, f"Customer#{i}"),
         maybe(0.15, rng.choice([0, 1, 2, 9999])),
         maybe(0.15, value()), maybe(0.1, rng.choice(
             ["BUILDING", "MACHINERY", "AUTOMOBILE", ""])))
        for i in range(rng.randint(0, 12))
    ]
    out["supplier"] = [
        (rng.randint(1, 4), maybe(0.1, f"Supplier#{i}"),
         maybe(0.15, rng.choice([0, 1, 9999])), maybe(0.15, value()))
        for i in range(rng.randint(0, 5))
    ]
    out["part"] = [
        (rng.randint(1, 8), maybe(0.1, " ".join(
            rng.choice(words) for _ in range(3))),
         f"Brand#{rng.randint(1, 3)}",
         maybe(0.1, rng.choice(["STANDARD BRASS", "ECONOMY TIN", "PROMO"])),
         maybe(0.15, rng.randint(0, 50)), maybe(0.15, value()))
        for i in range(rng.randint(0, 10))
    ]
    out["orders"] = [
        (rng.randint(1, 12), maybe(0.1, rng.choice([1, 2, 3, 8, 9999])),
         rng.choice(["O", "F", "P", "X"]), maybe(0.15, value()),
         maybe(0.1, ts()),
         maybe(0.1, rng.choice(["1-URGENT", "2-HIGH", "5-LOW"])))
        for i in range(rng.randint(0, 15))
    ]
    out["lineitem"] = [
        (rng.randint(1, 12), rng.randint(1, 8), rng.randint(1, 4),
         rng.randint(1, 4), maybe(0.1, abs(value())),
         maybe(0.1, abs(value())), maybe(0.1, rng.randint(0, 4) / 4.0),
         maybe(0.1, rng.randint(0, 2) / 4.0),
         maybe(0.1, rng.choice(["N", "R", "A", "Z"])),
         maybe(0.1, rng.choice(["O", "F"])), maybe(0.1, ts()))
        for i in range(rng.randint(0, 20))
    ]
    out["events"] = [
        (rng.randint(1, 15), maybe(0.08, ts()),
         maybe(0.08, rng.choice([7, 8, 42])), maybe(0.08, rng.choice(types)),
         maybe(0.08, value()),
         maybe(0.08, rng.choice(
             ['{"k": %d}' % rng.randint(0, 99), "{}", '{"k": null}',
              '{"k": "x"}', '{"j": 1}'])))
        for i in range(rng.randint(0, 20))
    ]
    out["documents"] = [
        (rng.randint(1, 12), maybe(0.08, text()),
         maybe(0.1, rng.choice(langs)),
         maybe(0.1, f"src{rng.randint(0, 5)}"),
         maybe(0.1, rng.randint(0, 900)))
        for i in range(rng.randint(0, 14))
    ]
    def vec():
        r = rng.random()
        if r < 0.1:
            return _vec(0.0)
        if r < 0.2:
            return _vec(0.125)
        return [rng.randint(-8, 8) / 8.0 for _ in range(64)]
    # embeddings: duplicate ids are FULL-ROW duplicates only — an
    # ID-keyed vector index has no union semantics for conflicting
    # payloads (the operators resolve trainer samples to the
    # lexicographically-least vector and document the id-unique
    # contract); text documents DO fuzz conflicting duplicates above,
    # where token-set union is the defined resolution
    emb_payload = {
        i: (maybe(0.08, vec()), maybe(0.1, rng.randint(0, 5)))
        for i in range(1, 11)
    }
    out["embeddings"] = []
    for _ in range(rng.randint(0, 12)):
        i = rng.randint(1, 10)
        out["embeddings"].append((i, *emb_payload[i]))
    # full-row duplicates: re-append a random sample of each table
    for name, rows in out.items():
        for r in rng.sample(rows, k=min(2, len(rows))):
            if rng.random() < 0.5:
                rows.append(r)
    return out


def fuzz_rows_v2(seed: int) -> dict[str, list[tuple]]:
    """Scale-and-skew fuzz (seeds >= 6; v1 seeds stay bit-stable): the v1
    hostile traits PLUS the shapes that only appear past toy size —

    - hundreds of rows per fact table (longer series, real group sizes)
    - hot-key skew: one user owns ~60% of events, one customer ~50% of
      orders (the 100 TB skew shape, shrunk)
    - extreme int64 keys: negative, zero, and 2**40-scale ids — any
      operator doing key arithmetic (id*C+offset packing, label-propagation
      min over ids, id-shifted replication) overflows or mis-orders here
    - multi-decade timestamps incl. pre-epoch (1969: negative unix micros)
      and far-future (2030), with exact microsecond ties
    - document prefix families and long repeated-token texts (shingle /
      minhash / chunking stress), sharing one vocabulary so near-dup
      candidates actually collide

    Same exact-binary-float and |value| <= ~3e3 quantize-domain discipline
    as v1; embeddings keep the id-unique full-row-dup-only contract."""
    import random

    rng = random.Random(seed)

    def maybe(p, val):
        return None if rng.random() < p else val

    YEARS = [1969, 1970, 1999, 2000, 2024, 2030]

    def ts():
        y = rng.choice(YEARS)
        mo, d = rng.randint(1, 12), rng.randint(1, 28)
        if rng.random() < 0.3:  # heavy tie mass on round hours
            return _ts(f"{y}-{mo:02d}-{d:02d} {rng.choice([0, 6, 12]):02d}:00:00")
        return _ts(
            f"{y}-{mo:02d}-{d:02d} {rng.randint(0, 23):02d}:"
            f"{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}."
            f"{rng.choice([0, 1, 999999]):06d}"
        )

    def value():
        return rng.choice(
            [0.0, 0.25, 1.5, -2.5, 87.125, 450.5, 2500.25, -2500.25,
             rng.randint(0, 400) / 4.0]
        )

    BIG = 2**40
    cust_pool = [-3, 0, 1, 2, 5, 17, BIG, BIG + 1] + list(range(20, 60))
    user_pool = [-7, 0, 42, 8, BIG] + list(range(100, 130))
    hot_user, hot_cust = 42, 1
    words = ["the", "data", "spark", "merge", "sort", "数据", "étude", "a",
             "row", "batch", "dup", "scan", "join", "key", "value"]

    def text(long=False):
        r = rng.random()
        if r < 0.05:
            return ""
        if r < 0.08:
            return " \t "
        if long and r < 0.15:
            return ("dup " * rng.randint(100, 500)).strip()
        n = rng.randint(1, 300 if long else 25)
        return " ".join(rng.choice(words) for _ in range(n))

    types = ["view", "click", "purchase", "signup", "error", "unknown", ""]
    langs = ["en", "de", "zh", "fr", "es", "xx"]
    props = lambda: rng.choice(  # noqa: E731
        ['{"k": %d}' % rng.randint(0, 99), "{}", '{"k": null}', '{"k": "x"}',
         '{"j": 1}', '{"k": {"a": 1}}', '{"k": [1, 2]}',
         '{"k": 87, "extra": "長い値"}'])

    out: dict[str, list[tuple]] = {}
    out["region"] = [(i, maybe(0.1, rng.choice(
        ["AMERICA", "EUROPE", "ASIA", "", "АЗИЯ"]))) for i in (-1, 0, 1, 2, 3)]
    out["nation"] = [
        (i, maybe(0.1, f"NATION_{i}"), maybe(0.15, rng.choice([-1, 0, 1, 2, 9999])))
        for i in range(rng.randint(4, 10))
    ]
    out["customer"] = [
        (rng.choice(cust_pool), maybe(0.08, f"Customer#{i}"),
         maybe(0.12, rng.choice([0, 1, 2, 9999])),
         maybe(0.12, value()), maybe(0.08, rng.choice(
             ["BUILDING", "MACHINERY", "AUTOMOBILE", ""])))
        for i in range(rng.randint(40, 80))
    ]
    out["supplier"] = [
        (rng.choice([-2, 0, 1, 2, 3, 4, BIG]), maybe(0.1, f"Supplier#{i}"),
         maybe(0.15, rng.choice([0, 1, 9999])), maybe(0.15, value()))
        for i in range(rng.randint(4, 10))
    ]
    out["part"] = [
        (rng.choice([-1, 0] + list(range(1, 25)) + [BIG]),
         maybe(0.08, " ".join(rng.choice(words) for _ in range(3))),
         f"Brand#{rng.randint(1, 3)}",
         maybe(0.1, rng.choice(["STANDARD BRASS", "ECONOMY TIN", "PROMO"])),
         maybe(0.12, rng.randint(0, 50)), maybe(0.12, value()))
        for i in range(rng.randint(15, 40))
    ]
    n_orders = rng.randint(100, 200)
    order_keys = [-5, 0, BIG] + list(range(1, n_orders + 1))
    out["orders"] = [
        (rng.choice(order_keys),
         maybe(0.08, hot_cust if rng.random() < 0.5 else rng.choice(cust_pool + [9999])),
         rng.choice(["O", "F", "P", "X"]), maybe(0.12, value()),
         maybe(0.08, ts()),
         maybe(0.08, rng.choice(["1-URGENT", "2-HIGH", "5-LOW"])))
        for _ in range(n_orders)
    ]
    out["lineitem"] = [
        (rng.choice(order_keys), rng.choice([-1, 0, BIG] + list(range(1, 25))),
         rng.choice([-2, 0, 1, 2, 3, 4, BIG]),
         rng.randint(1, 7), maybe(0.08, abs(value())),
         maybe(0.08, abs(value())), maybe(0.08, rng.randint(0, 4) / 4.0),
         maybe(0.08, rng.randint(0, 2) / 4.0),
         maybe(0.08, rng.choice(["N", "R", "A", "Z"])),
         maybe(0.08, rng.choice(["O", "F"])), maybe(0.08, ts()))
        for _ in range(rng.randint(150, 300))
    ]
    out["events"] = [
        (rng.choice([-9, 0, BIG] + list(range(1, 400))),
         maybe(0.06, ts()),
         maybe(0.06, hot_user if rng.random() < 0.6 else rng.choice(user_pool)),
         maybe(0.06, rng.choice(types)), maybe(0.06, value()),
         maybe(0.06, props()))
        for _ in range(rng.randint(200, 350))
    ]
    # prefix families: bursts of documents sharing long common prefixes
    doc_rows: list[tuple] = []
    doc_ids = [-4, 0, BIG] + list(range(1, 80))
    for _ in range(rng.randint(60, 120)):
        t = text(long=True)
        if rng.random() < 0.3 and t:
            t = t + " " + rng.choice(words)  # near-dup of a likely earlier draw
        doc_rows.append(
            (rng.choice(doc_ids), maybe(0.06, t), maybe(0.08, rng.choice(langs)),
             maybe(0.08, f"src{rng.randint(0, 5)}"),
             maybe(0.08, rng.randint(0, 900)))
        )
    out["documents"] = doc_rows

    def vec():
        r = rng.random()
        if r < 0.08:
            return _vec(0.0)
        if r < 0.16:
            return _vec(0.125)
        return [rng.randint(-8, 8) / 8.0 for _ in range(64)]

    emb_ids = [-6, 0, BIG] + list(range(1, 40))
    emb_payload = {
        i: (maybe(0.06, vec()), maybe(0.08, rng.randint(0, 5))) for i in emb_ids
    }
    out["embeddings"] = []
    for _ in range(rng.randint(30, 60)):
        i = rng.choice(emb_ids)
        out["embeddings"].append((i, *emb_payload[i]))
    for name, rows in out.items():
        for r in rng.sample(rows, k=min(3, len(rows))):
            if rng.random() < 0.5:
                rows.append(r)
    return out


def write_dataset(out_dir: str, rows: dict[str, list[tuple]]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, schema in SCHEMAS.items():
        data = rows.get(name, [])
        cols = [[r[i] for r in data] for i in range(len(schema))]
        table = pa.table(
            {f.name: pa.array(cols[i], type=f.type) for i, f in enumerate(schema)},
            schema=schema,
        )
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(os.path.dirname(__file__), "..", ".edgedata")
    )
    ap.add_argument(
        "--fuzz-seeds",
        default="",
        help="comma-separated seeds; each writes a fuzz<seed>/ dataset",
    )
    args = ap.parse_args()
    base = os.path.abspath(args.out)
    write_dataset(os.path.join(base, "empty"), {})
    write_dataset(os.path.join(base, "weird"), WEIRD)
    write_dataset(os.path.join(base, "nullts"), nullts_rows())
    made = ["empty", "weird", "nullts"]
    for seed in filter(None, args.fuzz_seeds.split(",")):
        name = f"fuzz{int(seed)}"
        gen = fuzz_rows_v2 if int(seed) >= 6 else fuzz_rows
        write_dataset(os.path.join(base, name), gen(int(seed)))
        made.append(name)
    for mode in made:
        print(os.path.join(base, mode))


if __name__ == "__main__":
    main()
