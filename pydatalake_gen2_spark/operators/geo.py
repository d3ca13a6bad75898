"""Grid-bucketed spatial join (J32) — nearest site within a radius.

The standard distributed geo join: bucket one side into fixed lat/lon grid
cells, probe each point's own cell plus the 8 neighbours, verify candidates
with the exact haversine — candidates meet in a plain EQUI-join on the cell
key, never a cross product (the 2-d analog of J17's interval bins).

Recall guarantee (pigeonhole): with |lat| <= `lat_bound` degrees,
1 degree of latitude is ~111 km and 1 degree of longitude is
>= 111*cos(lat_bound) km, so cell sizes of ceil(r/111) x
ceil(r/(111*cos(lat_bound))) degrees ensure any pair within r km differs
by less than one cell in each axis — it cannot escape the 3x3
neighbourhood. Callers must keep latitudes inside the bound (the fixture
queries synthesize placements in [-60, 60)).

Float discipline: the haversine is ONE shared SQL expression string (both
the operator and the DuckDB oracle evaluate the identical text); the radius
fence and argmin ordering use ROUND(km, 6) so a 1-ulp libm difference
between engines cannot flip a boundary or a tie (repo libm discipline).

Reference parity note: the reference client (client.py) has no spatial
surface; this extends the declared engine layer like the L*/GR* families.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Shared haversine text — binds c_lat/c_lon (point) and s_lat/s_lon (site).
HAVERSINE_KM = (
    "2 * 6371.0 * ASIN(SQRT(POWER(SIN(RADIANS(s_lat - c_lat) / 2), 2) "
    "+ COS(RADIANS(c_lat)) * COS(RADIANS(s_lat)) "
    "* POWER(SIN(RADIANS(s_lon - c_lon) / 2), 2)))"
)


def cell_sizes(radius_km: float, lat_bound: float = 60.0) -> tuple[int, int]:
    """Smallest whole-degree cell sizes with the pigeonhole guarantee.

    The longitude cell is rounded UP to a divisor of 360 so the cell ring
    closes exactly at the antimeridian — the wrap-around probe below is
    only correct when 360 % lon_cell == 0."""
    lat_cell = max(1, math.ceil(radius_km / 111.0))
    lon_need = max(
        1, math.ceil(radius_km / (111.0 * math.cos(math.radians(lat_bound))))
    )
    lon_cell = next(d for d in range(lon_need, 361) if 360 % d == 0)
    return lat_cell, lon_cell


def grid_nearest(
    points: DataFrame,
    sites: DataFrame,
    radius_km: float,
    lat_bound: float = 60.0,
) -> DataFrame:
    """Nearest site within ``radius_km`` of each point.

    ``points``: (p_id, c_lat, c_lon); ``sites``: (s_id, s_lat, s_lon);
    all latitudes must satisfy |lat| <= lat_bound. Output:
    (p_id, s_id, dist_km ROUND 4), one row per point that has a site in
    range; ties break on (ROUND(km,6), s_id). Sites land in one cell each
    (a partial agg away from being a persistable index); points carry the
    9x probe explode — put the smaller/reusable side in ``sites``.
    """
    lat_cell, lon_cell = cell_sizes(radius_km, lat_bound)
    # Longitude cells are numbered 0..n_lon-1 from -180 and the probe
    # offsets wrap MODULO n_lon: a point at lon 179.9 and a site at
    # -179.9 are neighbours across the antimeridian (the haversine's
    # half-angle sines already handle the wrapped distance; only the
    # bucketing needs the ring topology). Latitude has no wrap — the
    # lat_bound cap keeps the poles out entirely.
    n_lon = 360 // lon_cell
    s = sites.withColumn(
        "cell_lat", F.floor(F.col("s_lat") / lat_cell).cast("int")
    ).withColumn(
        "cell_lon", F.floor((F.col("s_lon") + 180.0) / lon_cell).cast("int") % n_lon
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dlat).alias("dlat"), F.lit(dlon).alias("dlon"))
            for dlat in (-1, 0, 1)
            for dlon in (-1, 0, 1)
        ]
    )
    probes = (
        points.withColumn("o", F.explode(offsets))
        .withColumn(
            "cell_lat", (F.floor(F.col("c_lat") / lat_cell) + F.col("o.dlat")).cast("int")
        )
        .withColumn(
            "cell_lon",
            (
                (
                    F.floor((F.col("c_lon") + 180.0) / lon_cell).cast("int")
                    + F.col("o.dlon")
                    + F.lit(n_lon)
                )
                % n_lon
            ),
        )
        .drop("o")
    )
    cand = probes.join(s, ["cell_lat", "cell_lon"]).withColumn(
        "km", F.expr(HAVERSINE_KM)
    )
    w = Window.partitionBy("p_id").orderBy(F.round("km", 6), "s_id")
    return (
        cand.filter(F.round("km", 6) <= radius_km)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_id", "s_id", F.round("km", 4).alias("dist_km"))
    )
