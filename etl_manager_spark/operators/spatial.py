"""Spatial join primitives (grid-bucketed distance joins).

The scalable shape for "find pairs within d km": never the cross join —
bucket both sides into 1° grid cells, explode one side to its cell
neighborhood (longitude cells wrap at the antimeridian — found by the
brute-force oracle at sf0.1, where a ±179.9° pair 36 km apart fell out
of an unwrapped neighborhood), equi-join on the cell key (an ordinary
hash shuffle), and verify candidates with the exact haversine.

Completeness: latitude always needs only ±1 cells (1° of latitude is
~111 km ≥ any supported radius). Longitude cells NARROW with latitude
(111.195·cos φ km per degree), so the lon neighborhood is computed PER
ROW: ±⌈max_km / (111.0·cos(|φ|+1°))⌉ cells, capped at the full ring —
±1 (the classic 3×3) through |lat| ≈ 59°, widening smoothly toward the
poles, where every longitude is a neighbor (the ring at 89.9° is only
~70 km around). A fixed 3×3 grid silently DROPS true pairs past ~60°;
the adaptive ring keeps the prefilter complete at every latitude while
costing exactly the old 9 cells for the common mid-latitude case.
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0
# conservative km per degree of longitude at the equator (true value
# 2π·6371/360 = 111.195; the smaller constant widens the neighborhood,
# never narrows it)
_KM_PER_LON_DEG = 111.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km — the textbook haversine, written as
    ONE fixed expression tree so engines evaluating the same text agree
    to the last ulp of their (practically identical) libm."""
    dphi = F.radians(lat2 - lat1)
    dlam = F.radians(lon2 - lon1)
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlam / 2)
        * F.sin(dlam / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def within_distance_join(
    left: DataFrame,
    right: DataFrame,
    max_km: float,
    left_cols=("lat", "lon"),
    right_cols=("lat", "lon"),
) -> DataFrame:
    """All (left, right) pairs within ``max_km`` great-circle km, via the
    grid-prefilter + exact-verify pattern. Requires ``max_km ≤ 55``
    (±1 latitude cells cover Δφ ≤ 0.5°); works at EVERY latitude — the
    longitude neighborhood widens per row with |lat| (full ring at the
    poles), so polar data costs more candidates, never lost pairs.

    Shape: the left side explodes to its cell neighborhood (map-side; ×9
    through |lat| ≈ 59°, wider only near the poles), both sides shuffle
    once on the (cell_lat, cell_lon) key, and the haversine runs on
    candidates only. Returns both rows' columns plus ``distance_km``
    (raw double — callers quantize)."""
    if max_km > 55:
        raise ValueError(
            f"max_km={max_km} exceeds the ±1-latitude-cell bound (55)"
        )
    # the coordinate references are unqualified F.col(...)s evaluated on
    # the joined frame, so any coordinate name present on BOTH sides is
    # ambiguous at analysis (the 'lat'/'lon' defaults fail the moment
    # both inputs use them) — fail fast with the rename guidance instead
    # of surfacing Spark's AMBIGUOUS_REFERENCE later
    clash = ({*left_cols} | {*right_cols}) & (
        set(left.columns) & set(right.columns)
    )
    if clash:
        raise ValueError(
            f"within_distance_join: coordinate column(s) {sorted(clash)} "
            "exist on BOTH sides — rename one side's coordinates "
            "(e.g. a_lat/a_lon vs b_lat/b_lon) before joining"
        )
    reserved = {"_dy", "_dx", "_cell_lat", "_cell_lon", "_lonk"}
    taken = reserved & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(
            f"within_distance_join: input may not contain {sorted(taken)} "
            "(internal cell-grid columns — they would be overwritten and "
            "dropped)"
        )
    llat, llon = (F.col(c) for c in left_cols)
    rlat, rlon = (F.col(c) for c in right_cols)
    lat_offsets = F.array(F.lit(-1), F.lit(0), F.lit(1))

    def lon_reach(lat: Column) -> Column:
        # lon cells to cover each side of the row's own cell: the
        # partner sits within max_km, i.e. within Δλ = max_km /
        # (111·cos φ_worst) degrees, with φ_worst = |φ|+1° covering both
        # the partner's latitude (≤ |φ|+0.5° at max_km ≤ 55) and the
        # cell floor; floor(Δλ)+1 ≥ the worst cell-index distance.
        # Capped at 180: near the poles the whole ring is one
        # neighborhood (and cos → 0 would otherwise blow the reach up)
        cosw = F.cos(F.radians(F.least(F.abs(lat) + 1.0, F.lit(89.9))))
        return F.least(
            (F.floor(F.lit(float(max_km)) / (F.lit(_KM_PER_LON_DEG) * cosw)) + 1)
            .cast("int"),
            F.lit(180),
        )

    def wrap_lon(cell):
        # the longitude cell ring wraps at the antimeridian: cell −180
        # and cell 179 are NEIGHBORS (a pair at ±179.9° is ~20 km apart
        # at the equator). pmod keeps the key canonical in [−180, 179];
        # plain % would keep the dividend's sign. The haversine itself
        # is wrap-safe (sin²(Δλ/2) is symmetric/periodic) — only the
        # equi-join key needs the wrap.
        return (F.pmod(cell + 180, F.lit(360)) - 180).cast("int")

    # build the WRAPPED lon-cell list then array_distinct before the
    # explode: at full-ring reach (k = 180 near the poles) the wrapped
    # offsets collide (−180 and +180 are the same cell) and a duplicate
    # neighborhood cell would emit every candidate pair twice
    lon_cells = F.array_distinct(
        F.transform(
            F.sequence(-lon_reach(llat), lon_reach(llat)),
            lambda d: wrap_lon(F.floor(llon).cast("int") + d),
        )
    )
    l_cells = (
        left.withColumn("_dy", F.explode(lat_offsets))
        .withColumn(
            "_cell_lat", F.floor(llat.cast("double")).cast("int") + F.col("_dy")
        )
        .withColumn("_cell_lon", F.explode(lon_cells))
        .drop("_dy")
    )
    r_cells = right.withColumn(
        "_cell_lat", F.floor(rlat.cast("double")).cast("int")
    ).withColumn("_cell_lon", wrap_lon(F.floor(rlon).cast("int")))
    cand = l_cells.join(r_cells, on=["_cell_lat", "_cell_lon"]).drop(
        "_cell_lat", "_cell_lon"
    )
    dist = haversine_km(llat, llon, rlat, rlon)
    return cand.withColumn("distance_km", dist).filter(
        F.col("distance_km") <= F.lit(float(max_km))
    )
