"""SQL-side access to the engine's scalar math (SURVEY.md §4.4).

PySpark can't register pure-SQL temporary functions without a JVM class,
so the engine exposes its tile/zigzag math for SQL strings two ways:

* ``SQL_SNIPPETS`` / ``sql_*`` helpers — canonical SQL fragments, kept in
  lockstep with the Column implementations in functions/tiles.py and the
  DuckDB oracle SQL in plans/queries.py (one source of math, three
  surfaces);
* ``register_views(spark)`` — registers the parquet tables of a scale
  directory as temp views so the snippets are directly usable in
  ``spark.sql`` queries.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Canonical SQL fragments (same float64 math as the Column exprs).
SQL_SNIPPETS = {
    "zigzag": "(CAST({n} AS BIGINT) << 1) ^ (CAST({n} AS BIGINT) >> 63)",
    # UNSIGNED right shift: a sign-extending >> diverges from the Column
    # twin (shiftrightunsigned) whenever bit 63 of the zigzag value is set
    "unzigzag": "CAST(SHIFTRIGHTUNSIGNED(CAST({u} AS BIGINT), 1) ^ -(CAST({u} AS BIGINT) & 1) AS BIGINT)",
    "tile_x": "CAST(LEAST(FLOOR(({lon} + 180.0) / 360.0 * POW(2, {z})), POW(2, {z}) - 1) AS INT)",
    "tile_y": (
        "CAST(GREATEST(0, LEAST(FLOOR((1.0 - ASINH(TAN(RADIANS({lat}))) / PI()) / 2.0 "
        "* POW(2, {z})), POW(2, {z}) - 1)) AS INT)"
    ),
}


def sql_tile_x(lon_expr: str, z: int) -> str:
    return SQL_SNIPPETS["tile_x"].format(lon=lon_expr, z=z)


def sql_tile_y(lat_expr: str, z: int) -> str:
    return SQL_SNIPPETS["tile_y"].format(lat=lat_expr, z=z)


def sql_zigzag(n_expr: str) -> str:
    return SQL_SNIPPETS["zigzag"].format(n=n_expr)


def sql_unzigzag(u_expr: str) -> str:
    return SQL_SNIPPETS["unzigzag"].format(u=u_expr)


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None):
    """Register a scale directory's parquet tables as temp views for
    spark.sql use (same names the DuckDB oracle harness registers)."""
    from ..plans.queries import TABLES

    for t in tables or TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
