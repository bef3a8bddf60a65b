"""Bloom-filter join pre-filtering: prune the big side of a join before
its shuffle with a compact bitmap of the small side's keys.

This is the explicit, user-controllable form of Spark's internal runtime
bloom filters (`spark.sql.optimizer.runtime.bloomFilter.enabled` injects
one only under cost heuristics on shuffle-join plans). The operator covers
the cases the optimizer won't: a dimension too big to broadcast as rows
but whose *key bloom* is tiny (10⁸ keys ≈ 120 MB at 1% fpp; 10⁵ keys ≈
2 KB), pre-filtering before an expensive multi-stage pipeline, or reusing
one built filter across several queries.

Semantics: the bloom pass is conservative (no false negatives), so

    fact.filter(might_contain).join(dim, key, "inner"/"semi") == fact.join(dim, ...)

bitwise — false positives survive the prefilter and die in the exact join.
The win is WHERE rows die: at 100 TB the prefilter runs map-side inside
the fact scan (whole-stage codegen: 2 xxhash64 calls + 2 array probes per
row), so non-matching rows never enter the exchange. With a 1%-selective
dim, the join shuffle shrinks ~100×.

Build is distributed: each fact-side executor needs the bitmap, so the
filter is built as ONE grouped aggregation over the dim keys (explode hash
positions → per-WORD ``bit_or`` hash-agg, map-side combinable, collecting
only the populated word rows) and shipped as a literal array of
longs — never a per-key collect. No DataFrame.stat.bloomFilter is used
(PySpark doesn't expose it); the hash family is xxhash64(key, seed), the
same primitive Spark's internal BloomFilterAggregate uses.

Reference parity: the reference library delegates predicate pushdown of
this kind to its warehouse engine; this module is the Spark-native
equivalent for engine-side join pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD = 64


def _positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """Array of ``num_hashes`` bit positions for ``key`` in [0, num_bits).

    xxhash64 seeded per hash function; pmod keeps positions non-negative.
    ``num_bits`` must be a power of two is NOT required — pmod is exact for
    any modulus.
    """
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(num_bits))
            for seed in range(num_hashes)
        ]
    )


def build_key_bloom(
    dim: DataFrame,
    key_col: str,
    num_bits: int = 1 << 14,
    num_hashes: int = 2,
    max_bits: int = 1 << 27,
) -> list[int]:
    """Build the bloom bitmap of ``dim[key_col]`` as ``num_bits/64`` longs.

    One distributed pass: explode each key's hash positions, OR each
    position's bit into its 64-bit WORD with a hash aggregate on the word
    index (map-side combinable — no aggregation buffer ever holds more
    than the populated word count), then collect only the ≤ num_bits/64
    non-zero word rows. The driver never sees keys, and no single
    buffer/row ever holds the full position multiset — the failure mode
    of a collect_set formulation at large num_bits.

    Sizing: fpp ≈ (1 - e^(-kn/m))^k. The 16 Kib / 2-hash default gives
    fpp < 1% up to ~860 keys (m·ln(1/0.9) with k=2; at n=1 500 the fpp
    is already ~2.8%); callers at larger dim cardinality pass
    num_bits ≈ 10·n for ~1.2% fpp at k=2. Driver cost is one row per
    populated word: the bitmap itself is num_bits/8 bytes but the
    collect()ed rows cost ~10× that transiently, so ``max_bits``
    (default 2²⁷ = 128 Mib → a 16 MB bitmap, ~13 M keys at 10 bits/key)
    refuses sizes that would OOM the driver instead of letting the
    collect discover it; raise it explicitly only with driver memory to
    match, or switch to the engine-native
    ``spark.sql.optimizer.runtime.bloomFilter`` / a semi-join, which
    never materialize the bitmap on the driver.
    """
    if num_bits % _WORD:
        raise ValueError(f"num_bits must be a multiple of {_WORD}")
    if num_bits > max_bits:
        raise ValueError(
            f"num_bits={num_bits} exceeds max_bits={max_bits}: the driver "
            f"would collect up to {num_bits // _WORD} word rows "
            f"(~{num_bits // _WORD * 160 // 2**20} MB transient). Pass a "
            "larger max_bits only with driver memory to match, or use a "
            "semi-join / Spark's runtime bloom filter instead"
        )
    rows = (
        dim.select(
            F.explode(
                _positions(F.col(key_col), num_bits, num_hashes)
            ).alias("pos")
        )
        .select(
            F.expr(f"CAST(pos DIV {_WORD} AS INT)").alias("w"),
            F.expr(f"SHIFTLEFT(CAST(1 AS BIGINT), CAST(pos % {_WORD} AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    # JVM longs are already signed 64-bit — safe as Spark literals as-is
    words = [0] * (num_bits // _WORD)
    for r in rows:
        words[r["w"]] = r["word"]
    return words


def might_contain(
    key: Column, words: list[int], num_hashes: int = 2
) -> Column:
    """Boolean bloom probe of ``key`` against a bitmap from
    :func:`build_key_bloom` — pure codegen-able expressions (2 hashes,
    2 element_at, bit_get), no UDF, runs inside the scan stage.
    """
    from etl_manager_spark.functions.exact import lit_long_array

    num_bits = len(words) * _WORD
    # one parsed literal, not num_bits/64 py4j round-trips
    bitmap = lit_long_array(words)
    probes = [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(num_bits))
        for seed in range(num_hashes)
    ]
    def bit(pos: Column) -> Column:
        word = F.element_at(bitmap, (pos / _WORD).cast("int") + 1)
        return F.getbit(word, (pos % _WORD).cast("int"))

    cond = bit(probes[0]) == 1
    for p in probes[1:]:
        cond = cond & (bit(p) == 1)
    return cond


_INTEGRAL = ("tinyint", "smallint", "int", "bigint")
_FRACTIONAL = ("float", "double")


def _common_hash_type(
    f_type: str, d_type: str, fact_key: str, dim_key: str
) -> str:
    """The type both join keys are hashed AS, mirroring the widening the
    join's own analysis applies: equal types pass through, integral pairs
    widen to bigint, fractional pairs to double. Anything else (decimal
    vs integral, string vs numeric, ...) is refused — Spark's coercion
    there is subtle enough that a silent wrong guess would reintroduce
    the false-negative bug this exists to prevent."""
    if f_type == d_type:
        return f_type
    if f_type in _INTEGRAL and d_type in _INTEGRAL:
        return "bigint"
    if f_type in _FRACTIONAL and d_type in _FRACTIONAL:
        return "double"
    raise ValueError(
        f"bloom_prefiltered_join: key types differ ({fact_key}: {f_type} "
        f"vs {dim_key}: {d_type}) beyond integral/fractional widening — "
        "cast one side explicitly so the hash domain is unambiguous"
    )


def bloom_prefiltered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "semi",
    num_bits: int = 1 << 14,
    num_hashes: int = 2,
    max_bits: int = 1 << 27,
) -> DataFrame:
    """``fact ⋈ dim`` with the fact side bloom-pruned before its shuffle.

    Exact: identical rows to the plain join for ``semi``/``inner`` (no
    false negatives; false positives are removed by the join itself).
    Outer joins are refused — pre-filtering the probe side would drop
    unmatched rows an outer join must keep. ``max_bits`` forwards to
    :func:`build_key_bloom`'s driver-memory ceiling, so the advertised
    large-cardinality sizing (num_bits ≈ 10·n) stays reachable through
    this wrapper when the driver is provisioned for it.
    """
    if how not in ("semi", "leftsemi", "left_semi", "inner"):
        raise ValueError(
            f"bloom_prefiltered_join: how={how!r} — the prefilter drops "
            "fact rows without a dim match, which only semi/inner allow"
        )
    # xxhash64 hashes each physical type through its own byte path, so a
    # BIGINT fact key and an INT dim key hash DIFFERENTLY even for equal
    # values — the probe would miss and silently drop true matches (a
    # false negative, the one thing the contract forbids). Normalize both
    # sides to the type the join itself coerces to before hashing; the
    # exact join below still runs on the raw columns.
    f_type = dict(fact.dtypes)[fact_key]
    d_type = dict(dim.dtypes)[dim_key]
    hash_type = _common_hash_type(f_type, d_type, fact_key, dim_key)
    dim_hash_side = dim.select(F.col(dim_key).cast(hash_type).alias(dim_key))
    words = build_key_bloom(
        dim_hash_side, dim_key, num_bits, num_hashes, max_bits
    )
    pruned = fact.filter(
        might_contain(F.col(fact_key).cast(hash_type), words, num_hashes)
    )
    if how == "inner":
        return pruned.join(dim, pruned[fact_key] == dim[dim_key], "inner")
    return pruned.join(
        dim, pruned[fact_key] == dim[dim_key], "left_semi"
    )
