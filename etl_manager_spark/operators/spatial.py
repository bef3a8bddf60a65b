"""Spatial join primitives (grid-bucketed distance joins).

The scalable shape for "find pairs within d km": never the cross join —
bucket both sides into 1° grid cells, explode one side to its 3×3
neighborhood (longitude cells wrap at the antimeridian — found by the
brute-force oracle at sf0.1, where a ±179.9° pair 36 km apart fell out
of an unwrapped neighborhood), equi-join on the cell key (an ordinary
hash shuffle), and verify candidates with the exact haversine.
Completeness: for |lat| ≤ 60° a 1°-cell neighborhood covers every pair
within ~55 km (great-circle distance ≥ 111.32·cos(max|φ|)·Δλ°, and
cos 60° = ½), so a 50 km threshold can't lose a pair to the prefilter —
which the brute-force oracle would expose as a hash mismatch if it did.
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


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
    grid-prefilter + exact-verify pattern. Requires ``max_km ≤ 55`` and
    latitudes within ±60° (the 1°/3×3 completeness envelope — widen the
    cell size or neighborhood for larger radii/latitudes).

    Shape: the left side explodes ×9 to its cell neighborhood (map-side),
    both sides shuffle once on the (cell_lat, cell_lon) key, and the
    haversine runs on candidates only. Returns both rows' columns plus
    ``distance_km`` (raw double — callers quantize)."""
    if max_km > 55:
        raise ValueError(
            f"max_km={max_km} exceeds the 1°-cell completeness bound (55)"
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
    reserved = {"_dy", "_dx", "_cell_lat", "_cell_lon"}
    taken = reserved & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(
            f"within_distance_join: input may not contain {sorted(taken)} "
            "(internal cell-grid columns — they would be overwritten and "
            "dropped)"
        )
    llat, llon = (F.col(c) for c in left_cols)
    rlat, rlon = (F.col(c) for c in right_cols)
    offsets = F.array(F.lit(-1), F.lit(0), F.lit(1))

    def guard_lat(lat: Column) -> Column:
        # the OTHER half of the completeness envelope: beyond ±60° a
        # 1°-lon cell narrows below 55 km and the 3×3 prefilter silently
        # DROPS true pairs — fail loudly on the offending row instead
        # (in-plan raise_error: distributed, no extra validation scan)
        return F.when(
            F.abs(lat) > F.lit(60.0),
            F.raise_error(
                F.format_string(
                    "within_distance_join: |lat| > 60 breaks the 1°-cell "
                    "3×3 completeness envelope (got lat=%s); widen the "
                    "cell neighborhood for polar data",
                    lat.cast("string"),
                )
            ).cast("double"),
        ).otherwise(lat.cast("double"))

    def wrap_lon(cell):
        # the longitude cell ring wraps at the antimeridian: cell −180
        # and cell 179 are NEIGHBORS (a pair at ±179.9° is ~20 km apart
        # at the equator). pmod keeps the key canonical in [−180, 179];
        # plain % would keep the dividend's sign. The haversine itself
        # is wrap-safe (sin²(Δλ/2) is symmetric/periodic) — only the
        # equi-join key needs the wrap.
        return (F.pmod(cell + 180, F.lit(360)) - 180).cast("int")

    l_cells = (
        left.withColumn("_dy", F.explode(offsets))
        .withColumn("_dx", F.explode(offsets))
        .withColumn(
            "_cell_lat", F.floor(guard_lat(llat)).cast("int") + F.col("_dy")
        )
        .withColumn(
            "_cell_lon",
            wrap_lon(F.floor(llon).cast("int") + F.col("_dx")),
        )
        .drop("_dy", "_dx")
    )
    r_cells = right.withColumn(
        "_cell_lat", F.floor(guard_lat(rlat)).cast("int")
    ).withColumn("_cell_lon", wrap_lon(F.floor(rlon).cast("int")))
    cand = l_cells.join(r_cells, on=["_cell_lat", "_cell_lon"]).drop(
        "_cell_lat", "_cell_lon"
    )
    dist = haversine_km(llat, llon, rlat, rlon)
    return cand.withColumn("distance_km", dist).filter(
        F.col("distance_km") <= F.lit(float(max_km))
    )
