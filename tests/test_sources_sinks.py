"""MBTiles source/sink, TileJSON manifest, gzip, decode-side projection."""

import json

import pytest
from pyspark.sql import functions as F

from maplibre_tile_spec_spark.functions import mlt_codec as C
from maplibre_tile_spec_spark.operators import features as FE
from maplibre_tile_spec_spark.operators import tiler
from maplibre_tile_spec_spark.sources import mbtiles, synth


@pytest.fixture(scope="module")
def tiles(spark):
    docs = synth.synthesize_documents(spark, 200, seed=42)
    feats = FE.extract_features(docs)
    return tiler.encode_tiles(feats, zoom=5, include_doc_refs=True).cache()


class TestMbtiles:
    def test_roundtrip(self, spark, tiles, tmp_path):
        path = str(tmp_path / "out.mbtiles")
        n = mbtiles.write_mbtiles(tiles, path, metadata={"minzoom": "5", "maxzoom": "5"})
        assert n == tiles.count()
        back = mbtiles.read_mbtiles(spark, path)
        a = {(r.z, r.x, r.y, bytes(r.tile)) for r in tiles.select("z", "x", "y", "tile").collect()}
        b = {(r.z, r.x, r.y, bytes(r.tile)) for r in back.collect()}
        assert a == b
        meta = mbtiles.read_metadata(path)
        assert meta["format"] == "mlt" and meta["minzoom"] == "5"

    def test_zoom_filter(self, spark, tiles, tmp_path):
        path = str(tmp_path / "zf.mbtiles")
        mbtiles.write_mbtiles(tiles, path)
        assert mbtiles.read_mbtiles(spark, path, min_zoom=6).count() == 0
        assert mbtiles.read_mbtiles(spark, path, max_zoom=5).count() == tiles.count()

    def test_tilejson(self, tiles):
        tj = mbtiles.tilejson_metadata(tiles, ["features"])
        assert tj["minzoom"] == 5 and tj["maxzoom"] == 5
        assert tj["n_tiles"] == tiles.count()
        assert tj["vector_layers"][0]["id"] == "features"
        json.dumps(tj)  # serializable


class TestGzipAndProjection:
    def test_gzip_roundtrip(self, tiles):
        blob = bytes(tiles.first().tile)
        gz = C.gzip_tile(blob)
        assert C.gunzip_tile(gz) == blob
        assert C.gzip_tile(blob) == gz  # deterministic

    def test_layer_projection_skips(self, tiles):
        blob = bytes(tiles.first().tile)
        assert C.decode_tile(blob, layers={"nope"}) == []
        full = C.decode_tile(blob)
        assert [la.name for la in C.decode_tile(blob, layers={"features"})] == [
            la.name for la in full
        ]

    def test_column_projection_prunes_and_preserves(self, tiles):
        blob = bytes(tiles.first().tile)
        full = C.decode_tile(blob)[0]
        pruned = C.decode_tile(blob, columns={"doc"})[0]
        assert set(pruned.props) == {"doc"}
        assert pruned.props["doc"] == full.props["doc"]
        # geometry and ids always decode
        assert pruned.ids.tolist() == full.ids.tolist()
        import numpy as np

        assert np.array_equal(pruned.geometry.vertices, full.geometry.vertices)
