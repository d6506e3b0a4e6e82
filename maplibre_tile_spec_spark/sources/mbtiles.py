"""MBTiles (sqlite) source + sink.

Reference behavior: java/mlt-cli/.../Encode.java:489-560 iterates every tile
of an .mbtiles archive (optionally zoom-filtered) and converts per tile;
MBTilesWriter writes the converted archive. Spark mapping: the archive is a
driver-side artifact (sqlite is single-file); reading materializes
(z, x, y, tile_data) rows into a DataFrame whose downstream processing is
fully distributed, and writing streams a sorted collect back into sqlite.
At 100 TB scale the archive format itself is the bottleneck — production
uses the parquet/Iceberg tile sink (operators/tiler.write_tiles); MBTiles
stays for interop with the reference's tooling.

MBTiles spec (public): tiles(zoom_level, tile_column, tile_row, tile_data)
with TMS row order (flipped y), plus a metadata key/value table.
"""

from __future__ import annotations

import os
import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TILES_SCHEMA = "z int, x int, y int, tile binary"


def read_mbtiles(
    spark: SparkSession, path: str, min_zoom: int | None = None, max_zoom: int | None = None
) -> DataFrame:
    """.mbtiles → DataFrame(z, x, y, tile). The zoom filter is applied in
    SQL before materialization (the reference's zoom-range predicate,
    Encode.java:537-545)."""
    con = sqlite3.connect(path)
    try:
        q = "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
        conds = []
        if min_zoom is not None:
            conds.append(f"zoom_level >= {int(min_zoom)}")
        if max_zoom is not None:
            conds.append(f"zoom_level <= {int(max_zoom)}")
        if conds:
            q += " WHERE " + " AND ".join(conds)
        rows = [
            # TMS → XYZ row order
            (z, x, (2**z - 1) - y, bytes(t))
            for z, x, y, t in con.execute(q)
        ]
    finally:
        con.close()
    return spark.createDataFrame(rows, TILES_SCHEMA)


def read_metadata(path: str) -> dict[str, str]:
    con = sqlite3.connect(path)
    try:
        return dict(con.execute("SELECT name, value FROM metadata"))
    finally:
        con.close()


def write_mbtiles(tiles: DataFrame, path: str, metadata: dict[str, str] | None = None) -> int:
    """DataFrame(z, x, y, tile) → .mbtiles archive. Returns tile count."""
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("CREATE TABLE metadata (name text, value text)")
        con.execute(
            "CREATE TABLE tiles (zoom_level integer, tile_column integer, "
            "tile_row integer, tile_data blob)"
        )
        con.execute(
            "CREATE UNIQUE INDEX tile_index ON tiles (zoom_level, tile_column, tile_row)"
        )
        meta = {"name": "maplibre_tile_spec_spark", "format": "mlt", **(metadata or {})}
        con.executemany("INSERT INTO metadata VALUES (?, ?)", sorted(meta.items()))
        n = 0
        it = tiles.select("z", "x", "y", "tile").orderBy("z", "x", "y").toLocalIterator()
        batch = []
        for r in it:
            batch.append((r.z, r.x, (2**r.z - 1) - r.y, bytes(r.tile)))
            if len(batch) >= 1000:
                con.executemany("INSERT INTO tiles VALUES (?, ?, ?, ?)", batch)
                n += len(batch)
                batch = []
        if batch:
            con.executemany("INSERT INTO tiles VALUES (?, ?, ?, ?)", batch)
            n += len(batch)
        con.commit()
        return n
    finally:
        con.close()


def tilejson_metadata(tiles: DataFrame, layer_names: list[str], extent: int = 4096) -> dict:
    """TileJSON-equivalent manifest (MltConverter.createTilesetMetadataJSON
    analog, MltConverter.java:212-253) computed distributively."""
    agg = tiles.agg(
        F.min("z").alias("minzoom"),
        F.max("z").alias("maxzoom"),
        F.count("*").alias("n_tiles"),
        F.sum(F.length("tile")).alias("total_bytes"),
    ).first()
    return {
        "tilejson": "3.0.0",
        "scheme": "xyz",
        "minzoom": int(agg.minzoom),
        "maxzoom": int(agg.maxzoom),
        "n_tiles": int(agg.n_tiles),
        "total_bytes": int(agg.total_bytes),
        "vector_layers": [{"id": name, "extent": extent} for name in layer_names],
    }
