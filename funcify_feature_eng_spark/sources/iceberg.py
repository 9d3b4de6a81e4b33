"""Iceberg catalog integration (BASELINE.json north rule: transcript tables
live in Iceberg).

This sandbox has NO network (Maven Central unresolvable) and no
iceberg-spark-runtime jar anywhere on disk, so the catalog cannot be
instantiated here — tests/test_iceberg_gate.py proves the wiring works up to
the exact jar boundary (Spark attempts to load
``org.apache.iceberg.spark.SparkCatalog`` from our conf and fails with
"cannot find catalog plugin", not with a wiring error), and runs the full
round-trip automatically when a jar IS present (``SPARK_GRAFT_ICEBERG_JAR``
or a provisioned cluster).

Production deployment: ``spark-submit --packages
org.apache.iceberg:iceberg-spark-runtime-4.1_2.13:<version>`` with
``iceberg_session_conf()`` applied; every ``read_table``/``write_table``
call with a ``catalog.db.table`` name then routes through Iceberg
automatically (sources/tables.py keys on name-vs-path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"
ICEBERG_EXTENSIONS = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"


def iceberg_session_conf(catalog: str = "local", warehouse: str = "spark-warehouse/iceberg") -> dict[str, str]:
    """Session confs for a local Hadoop-catalog Iceberg deployment.

    Pass to ``get_spark(extra_conf=...)`` (or set via ``spark.conf.set`` —
    ``spark.sql.catalog.*`` is session-scoped and lazily instantiated).
    """
    return {
        f"spark.sql.catalog.{catalog}": ICEBERG_CATALOG_IMPL,
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def transcript_table_ddl(table: str, n_buckets: int = 64) -> str:
    """DDL for the 100 TB transcript layout: bucket partition transform on
    the entity key + time-ordered write distribution, the Iceberg analog of
    ``ingest_bucketed`` (hidden partitioning replaces Hive-style dirs; the
    bucket transform co-locates each conversation for exchange-free windows).
    """
    return f"""
CREATE TABLE IF NOT EXISTS {table} (
  conv_id string, turn_idx int, role string, text string,
  tool string, ts timestamp
) USING iceberg
PARTITIONED BY (bucket({n_buckets}, conv_id))
TBLPROPERTIES (
  'write.distribution-mode' = 'hash',
  'sort-order' = 'conv_id ASC, turn_idx ASC'
)
""".strip()


def write_transcripts(df: DataFrame, table: str, mode: str = "append") -> None:
    """DataFrameWriterV2 write into an Iceberg table (routes through the
    catalog plugin; snapshot-isolated commit)."""
    w = df.writeTo(table)
    if mode == "append":
        w.append()
    else:
        w.createOrReplace()


def iceberg_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark-runtime jar is on the session classpath."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(ICEBERG_CATALOG_IMPL)
        return True
    except Exception:
        return False
