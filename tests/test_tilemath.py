"""Three-way agreement tests: Spark column exprs ≡ numpy kernels ≡ DuckDB SQL.

The driver's correctness gate compares Spark results to DuckDB oracle SQL, so
the tile math must be bit-identical across all three engines.
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from maplibre_tile_spec_spark.functions import kernels as K
from maplibre_tile_spec_spark.functions import tilemath as TM

LONS = [-179.9, -77.035, 0.0, 2.3522, 139.69, 179.9, -0.1275]
LATS = [-84.9, 38.889, 0.0, 48.8566, 35.69, 84.9, 51.5072]
ZOOMS = [0, 1, 4, 9, 14]


@pytest.fixture(scope="module")
def points_df(spark):
    rows = [(i, lon, lat) for i, (lon, lat) in enumerate(zip(LONS, LATS))]
    return spark.createDataFrame(rows, "pid int, lon double, lat double").cache()


class TestTileAssign:
    @pytest.mark.parametrize("z", ZOOMS)
    def test_spark_vs_numpy(self, points_df, z):
        got = (
            points_df.select(
                "pid",
                TM.lon_to_tile_x(F.col("lon"), z).alias("x"),
                TM.lat_to_tile_y(F.col("lat"), z).alias("y"),
            )
            .orderBy("pid")
            .collect()
        )
        ex, ey = TM.np_tile_xy(np.array(LONS), np.array(LATS), z)
        assert [r.x for r in got] == ex.tolist()
        assert [r.y for r in got] == ey.tolist()

    @pytest.mark.parametrize("z", ZOOMS)
    def test_duckdb_sql_matches(self, z):
        sql = f"""
        SELECT {TM.tile_x_sql('lon', z)} AS x, {TM.tile_y_sql('lat', z)} AS y
        FROM (SELECT unnest({LONS}) AS lon, unnest({LATS}) AS lat)
        """
        rows = duckdb.sql(sql).fetchall()
        ex, ey = TM.np_tile_xy(np.array(LONS), np.array(LATS), z)
        assert [r[0] for r in rows] == ex.tolist()
        assert [r[1] for r in rows] == ey.tolist()

    def test_known_tile(self, points_df):
        # Washington DC (-77.035, 38.889) at z=10 → slippy tile (292, 391)
        row = (
            points_df.filter(F.col("pid") == 1)
            .select(
                TM.lon_to_tile_x(F.col("lon"), 10).alias("x"),
                TM.lat_to_tile_y(F.col("lat"), 10).alias("y"),
            )
            .first()
        )
        assert (row.x, row.y) == (292, 391)

    def test_tile_inverse(self, spark):
        # west/north edge of tile maps back into the same tile
        df = spark.range(1).select(
            TM.tile_to_lon(F.lit(292), 10).alias("lon"), TM.tile_to_lat(F.lit(391), 10).alias("lat")
        )
        r = df.first()
        x, y = TM.np_tile_xy(np.array([r.lon + 1e-9]), np.array([r.lat - 1e-9]), 10)
        assert (x[0], y[0]) == (292, 391)


class TestQuantize:
    def test_spark_vs_numpy(self, points_df):
        z = 12
        df = points_df.select(
            "pid",
            TM.lon_to_tile_x(F.col("lon"), z).alias("x"),
            TM.lat_to_tile_y(F.col("lat"), z).alias("y"),
            "lon",
            "lat",
        )
        qx, qy = TM.quantize_to_extent(F.col("lon"), F.col("lat"), F.col("x"), F.col("y"), z)
        got = df.select("pid", qx.alias("qx"), qy.alias("qy")).orderBy("pid").collect()
        tx, ty = TM.np_tile_xy(np.array(LONS), np.array(LATS), z)
        eqx, eqy = TM.np_quantize_to_extent(np.array(LONS), np.array(LATS), tx, ty, z)
        assert [r.qx for r in got] == eqx.tolist()
        assert [r.qy for r in got] == eqy.tolist()
        assert all(0 <= r.qx < 4096 and 0 <= r.qy < 4096 for r in got)


class TestMortonQuadkey:
    def test_morton_spark_vs_numpy(self, spark):
        rng = np.random.RandomState(3)
        xs = rng.randint(0, 2**15, 50)
        ys = rng.randint(0, 2**15, 50)
        df = spark.createDataFrame(
            [(int(a), int(b)) for a, b in zip(xs, ys)], "x long, y long"
        )
        got = df.select(TM.morton_code(F.col("x"), F.col("y")).alias("m")).collect()
        expected = K.morton_encode(xs, ys).astype(np.int64)
        assert sorted(r.m for r in got) == sorted(expected.tolist())

    def test_quadkey_prefix_property(self, spark):
        # child tile's quadkey range nests inside the parent's
        df = spark.createDataFrame([(5, 9, 4)], "x int, y int, z int")
        pmin, pmax = TM.quadkey_range(F.col("x"), F.col("y"), 4)
        cmin, cmax = TM.quadkey_range(F.col("x") * 2 + 1, F.col("y") * 2, 5)
        r = df.select(
            pmin.alias("pmin"), pmax.alias("pmax"), cmin.alias("cmin"), cmax.alias("cmax")
        ).first()
        assert r.pmin <= r.cmin < r.cmax <= r.pmax

    def test_quadkey_str(self, spark):
        # Bing docs example: tile (3,5) z=3 → "213"
        df = spark.createDataFrame([(3, 5)], "x int, y int")
        r = df.select(TM.quadkey_str(F.col("x"), F.col("y"), 3).alias("qk")).first()
        assert r.qk == "213"

    def test_quadkey_num_matches_str_order(self, spark):
        # numeric quadkey sorts identically to the base-4 string
        rng = np.random.RandomState(5)
        rows = [(int(x), int(y)) for x, y in zip(rng.randint(0, 2**6, 40), rng.randint(0, 2**6, 40))]
        df = spark.createDataFrame(rows, "x int, y int")
        got = df.select(
            TM.quadkey_str(F.col("x"), F.col("y"), 6).alias("s"),
            TM.quadkey_num(F.col("x"), F.col("y"), 6).alias("n"),
        ).collect()
        by_s = [r.n for r in sorted(got, key=lambda r: r.s)]
        assert by_s == sorted(r.n for r in got)


class TestZigZagExpr:
    def test_spark_matches_numpy(self, spark):
        vals = [0, -1, 1, -2, 2, 12345, -99999]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = df.select(TM.zigzag_enc(F.col("v")).alias("z"), "v").collect()
        exp = K.zigzag_encode(np.array(vals), bits=64)
        assert {r.v: r.z for r in got} == {v: int(e) for v, e in zip(vals, exp.astype(np.int64))}
        back = df.select(TM.zigzag_dec(TM.zigzag_enc(F.col("v"))).alias("v2"), "v").collect()
        assert all(r.v2 == r.v for r in back)
