"""Input-source shim: Iceberg tables when the runtime has the Iceberg
connector, hive-partitioned parquet otherwise (SURVEY.md §2B scans note —
this sandbox ships no iceberg-spark-runtime jar `[verified-here]`, so the
parquet path is the tested one; the Iceberg path is the same DataFrame
downstream).

The pyarrow-direct build path (scan.py) plans from parquet footers; for an
Iceberg table the equivalent plan comes from the table's file manifest
(`table.files` metadata table) — wired here when the connector exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def has_iceberg(spark: SparkSession) -> bool:
    # NB: attribute access on spark._jvm returns a JavaPackage placeholder for
    # MISSING classes (py4j never raises there) — only an actual classload
    # answers the question. Try Spark's own classloader first: jars added via
    # spark.jars/--packages live in the MutableURLClassLoader, invisible to
    # the system loader that plain Class.forName consults.
    cls = "org.apache.iceberg.spark.SparkCatalog"
    try:
        spark._jvm.org.apache.spark.util.Utils.classForName(cls, False, False)
        return True
    except Exception:
        pass
    try:
        spark._jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def read_input(spark: SparkSession, ident: str) -> DataFrame:
    """`iceberg:<catalog.db.table>` → Iceberg table; anything else → parquet dir."""
    if ident.startswith("iceberg:"):
        if not has_iceberg(spark):
            raise RuntimeError(
                "Iceberg connector not on the classpath; add "
                "iceberg-spark-runtime to spark.jars.packages or pass a parquet path"
            )
        return spark.read.format("iceberg").load(ident.split(":", 1)[1])
    return spark.read.parquet(ident)


def iceberg_data_files(spark: SparkSession, table: str) -> list[str]:
    """Data-file list from an Iceberg table's files metadata table — feeds
    scan.plan_chunks at cluster scale (file manifest instead of dir listing)."""
    rows = spark.read.format("iceberg").load(f"{table}.files").select("file_path").collect()
    return sorted(r["file_path"] for r in rows)
