"""Geospatial neighbor join: radius search without the cross join.

The geo flavor of the engine's binned non-equi join family
(``rangejoin.py`` bins time, this bins the sphere): all pairs of
points within ``radius_km`` great-circle distance, found by a grid-cell
equi join — each point advertises its 3×3 neighborhood of lat/lon
cells sized so that any within-radius pair must share an advertised
cell, then the exact haversine verifies. The candidate shuffle is keyed
on cells; fan-out per point is the 9-cell neighborhood times cell
occupancy — never all-pairs.

Cell sizing: 1° latitude ≈ 111.32 km everywhere; 1° longitude ≈
111.32·cos(lat) km, so the longitude cell width uses the worst case at
``max_abs_lat`` (default 60°, giving 2× the equatorial width), then
snaps to an exact divisor of 360° so the cell ring closes cleanly.
Longitude cells are indexed MODULO the ring — pairs across the ±180°
date line share adjacent (mod T) cells, and haversine itself is
wrap-correct through sin(Δλ/2), so date-line neighbors are found
exactly (tested). Points beyond ``max_abs_lat`` fail IN-PLAN via
raise_error — polar meridian convergence needs a different tiling, and
silently mis-binning it would drop neighbor pairs (the same fail-loud
policy as the HDR sketch's negative-input guard).

Everything is built-in trig (haversine = 2·asin(√·) over sin/cos) —
codegen'd, cross-engine reproducible to libm ulp, with distances
rounded to 3 decimals (≈ 1 m) before the radius comparison so the
oracle decides boundary pairs identically.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["haversine_km", "geo_neighbor_pairs"]

_EARTH_KM = 6371.0088  # IUGG mean radius
_KM_PER_DEG_LAT = 111.32


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km between two (degree) coordinates —
    a Column expression, all built-ins."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    return F.lit(2 * _EARTH_KM) * F.asin(F.sqrt(a))


def geo_neighbor_pairs(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """(id_a, id_b, dist_km): unordered pairs (id_a < id_b) within
    ``radius_km``, dist rounded to 3 decimals. Exact within the
    documented |lat| ≤ max_abs_lat domain (guarded in-plan)."""
    if not 0 < max_abs_lat < 85:
        raise ValueError("max_abs_lat must be in (0, 85): flat-grid tiling breaks at the poles")
    lat_cell = radius_km / _KM_PER_DEG_LAT
    min_lon_cell = radius_km / (_KM_PER_DEG_LAT * math.cos(math.radians(max_abs_lat)))
    # snap to an exact divisor of 360 so the modular ring has uniform
    # cells (a narrow seam cell would put near-seam neighbors 2 apart)
    n_lon_cells = max(1, math.floor(360.0 / min_lon_cell))
    lon_cell = 360.0 / n_lon_cells

    guarded_lat = F.when(
        F.abs(F.col(lat_col)) > max_abs_lat,
        F.expr(
            f"raise_error(concat('geo_neighbor_pairs: |lat| > {max_abs_lat} for id ',"
            f" CAST({id_col} AS STRING), ' — outside the flat-grid domain'))"
        ),
    ).otherwise(F.col(lat_col))

    pts = df.select(
        F.col(id_col).alias("_id"),
        guarded_lat.alias("_lat"),
        F.col(lon_col).alias("_lon"),
        F.floor(F.col(lat_col) / lat_cell).alias("_cy"),
        F.expr(
            f"CAST(((floor(({lon_col} + 180.0) / {lon_cell}) % {n_lon_cells})"
            f" + {n_lon_cells}) % {n_lon_cells} AS BIGINT)"
        ).alias("_cx"),
    )
    # one side advertises its 3x3 cell neighborhood (x wrapped mod the
    # ring); the other keeps its own cell, so every within-radius pair
    # meets (cells differ by <=1 per axis, mod T in x) and each
    # candidate pair meets exactly once (T >= 3 keeps the 3 advertised
    # x-cells distinct; with T < 3 duplicates are removed below)
    advertise = pts.select(
        F.col("_id").alias("_ida"),
        F.col("_lat").alias("_lata"),
        F.col("_lon").alias("_lona"),
        F.explode(
            F.expr(
                "array_distinct(flatten(transform(sequence(-1, 1),"
                " dy -> transform(sequence(-1, 1),"
                f" dx -> struct(_cy + dy AS y, ((_cx + dx) % {n_lon_cells} + {n_lon_cells}) % {n_lon_cells} AS x)))))"
            )
        ).alias("_cell"),
    ).select("_ida", "_lata", "_lona", F.col("_cell.y").alias("_cy"), F.col("_cell.x").alias("_cx"))
    probe = pts.select(
        F.col("_id").alias("_idb"),
        F.col("_lat").alias("_latb"),
        F.col("_lon").alias("_lonb"),
        "_cy",
        "_cx",
    )
    return (
        advertise.join(probe, ["_cy", "_cx"])
        .where(F.col("_ida") < F.col("_idb"))
        .withColumn(
            "dist_km",
            F.round(haversine_km(F.col("_lata"), F.col("_lona"), F.col("_latb"), F.col("_lonb")), 3),
        )
        .where(F.col("dist_km") <= radius_km)
        .select(F.col("_ida").alias("id_a"), F.col("_idb").alias("id_b"), "dist_km")
    )
