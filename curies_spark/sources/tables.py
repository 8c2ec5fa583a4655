"""Table-format seam: one write/read surface over partitioned parquet
today, lakehouse table formats (Iceberg/Delta) where their runtimes
exist.

The engine's persisted outputs — the KG triple tables, dedup survivor
sets, ANN index partitions — are all "partitioned columnar table with
partition-pruned reads". This container has no Iceberg/Delta jars, so
partitioned parquet is the documented stand-in (CLAUDE.md); this module
is the seam that keeps that an implementation detail instead of an
assumption baked into every write site:

- :class:`ParquetTables` — the default; byte-identical behavior to the
  direct ``.write.partitionBy(...).parquet(path)`` calls it replaces.
- :class:`IcebergTables` — the same operations through Spark's
  DataSourceV2 ``writeTo`` API against a named catalog. Constructed
  lazily: instantiation verifies the catalog is actually configured and
  fails loud with the spark-submit configuration hint otherwise
  (the same auto-activating pattern as the sqlalchemy/fastapi glue —
  where a runtime provides Iceberg, the round-trip test runs for real).

Identifiers: :class:`ParquetTables` addresses tables by PATH,
:class:`IcebergTables` by catalog-qualified NAME (``catalog.db.table``)
— callers pass one opaque ``table`` string and the format interprets
it.
"""

from __future__ import annotations

from typing import Protocol, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["IcebergTables", "ParquetTables", "TableFormat"]


class TableFormat(Protocol):
    """What the engine needs from a table layout — nothing more."""

    def write(
        self,
        df: DataFrame,
        table: str,
        *,
        mode: str = "overwrite",
        partition_by: "Sequence[str] | None" = None,
    ) -> None: ...

    def read(self, spark: SparkSession, table: str) -> DataFrame: ...


class ParquetTables:
    """Partitioned parquet directories addressed by path — the default
    layout everywhere in this repo, unchanged."""

    def write(
        self,
        df: DataFrame,
        table: str,
        *,
        mode: str = "overwrite",
        partition_by: "Sequence[str] | None" = None,
    ) -> None:
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(table)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(table)


class IcebergTables:
    """The same operations against Iceberg tables in a named Spark
    catalog (``spark.sql.catalog.<name>`` must be configured with the
    Iceberg runtime jar on the classpath).

    ``mode="overwrite"`` maps to ``createOrReplace`` and ``"append"``
    to ``append`` (creating the table on first append); partition
    columns become the table's partition spec at creation. Reads are
    catalog reads, so Iceberg's snapshot isolation, hidden
    partitioning, and metadata-pruned scans all apply without any
    caller change — the point of the seam."""

    def __init__(self, spark: SparkSession, catalog: str) -> None:
        conf_key = f"spark.sql.catalog.{catalog}"
        if spark.conf.get(conf_key, None) is None:
            raise RuntimeError(
                f"Spark catalog {catalog!r} is not configured "
                f"({conf_key} unset). Iceberg needs its runtime on the "
                "classpath and a catalog, e.g. spark-submit --packages "
                "org.apache.iceberg:iceberg-spark-runtime-<ver> --conf "
                f"{conf_key}=org.apache.iceberg.spark.SparkCatalog; in "
                "this container partitioned parquet (ParquetTables) is "
                "the documented stand-in"
            )
        self._catalog = catalog

    def _qualify(self, table: str) -> str:
        return table if table.startswith(f"{self._catalog}.") else (
            f"{self._catalog}.{table}"
        )

    def write(
        self,
        df: DataFrame,
        table: str,
        *,
        mode: str = "overwrite",
        partition_by: "Sequence[str] | None" = None,
    ) -> None:
        from pyspark.sql import functions as F

        name = self._qualify(table)
        writer = df.writeTo(name).using("iceberg")
        if partition_by:
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        elif mode == "append":
            # probe existence explicitly — a bare try/append-except-create
            # would misread a real append failure (schema mismatch,
            # commit conflict) as "table missing" and mask the root cause
            if df.sparkSession.catalog.tableExists(name):
                writer.append()
            else:
                writer.create()
        else:
            raise ValueError(f"unsupported mode {mode!r}: overwrite|append")

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.table(self._qualify(table))
