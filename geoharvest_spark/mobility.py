"""Mobility analytics: origin-destination flows over the cell grid.

The OD matrix — "how many trips went from cell A to cell B" — is the
workhorse geospatial-mobility aggregate (transport planning, migration
studies, CDR analysis). Distributed shape:

  assign ghcell -> ONE window shuffle on the entity (lag over
  (t_us, event_id) gives each fix its predecessor cell) -> one hash
  aggregate on (from_cell, to_cell) with map-side combine

The window buffers one entity's fixes (bounded by that entity's track
length — the same bound any trajectory engine carries; a 100-TB run
partitions by entity and entities are millions-cardinality). Cell
assignment and ordering are pure integer arithmetic, so the DuckDB
oracle replays the whole pipeline exactly.

The reference (MITLibraries/geo-harvester) has no trajectory operators;
this extends the beyond-reference geospatial family (tiles, PIP, kNN,
DBSCAN, z-order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .index import ghcell


def od_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = 1,
    id_col: str = "event_id",
    include_self: bool = False,
) -> DataFrame:
    """(from_cell, to_cell, n_trips) over consecutive fixes per entity.

    Fixes are ordered by (event_time_us, id) — the id tie-break makes
    same-instant fixes deterministic on any partitioning. Self-loops
    (consecutive fixes in the same cell) are dropped unless
    include_self: at fix rates >> movement rates they dominate the
    matrix without carrying flow information.
    """
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cells = df.select(
        F.col(user_col).alias("u"),
        t.alias("t"),
        F.col(id_col).alias("eid"),
        ghcell(F.col(lon_col), F.col(lat_col), res).alias("cell"),
    )
    w = Window.partitionBy("u").orderBy("t", "eid")
    flows = cells.select(
        F.lag("cell").over(w).alias("from_cell"),
        F.col("cell").alias("to_cell"),
    ).where(F.col("from_cell").isNotNull())
    if not include_self:
        flows = flows.where(F.col("from_cell") != F.col("to_cell"))
    return flows.groupBy("from_cell", "to_cell").agg(
        F.count(F.lit(1)).alias("n_trips")
    )
