"""Catalog sync: register converted tables into a catalog so engines can
query them by name.

Reference parity (surface): CatalogSyncClient
(spi/sync/CatalogSyncClient.java:35-82 — hasDatabase/createDatabase/
getTable/createTable/refreshTable/createOrReplaceTable/dropTable),
orchestrated per target format by CatalogSync.syncTable.

Spark-first implementation: the catalog IS Spark's session catalog
(spark_catalog, HMS-backed when configured). Tables over our Delta-log
dirs register as named views backed by the log-replay reader; plain
parquet dirs register as external tables. A Glue/HMS client would slot in
behind the same protocol with boto3/thrift calls.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Protocol

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class CatalogTableIdentifier:
    """catalog.database.table (ThreePartHierarchicalTableIdentifier)."""

    database: str
    table: str
    catalog: Optional[str] = None

    @property
    def qualified(self) -> str:
        parts = [p for p in (self.catalog, self.database, self.table) if p]
        return ".".join(parts)


class CatalogSyncClient(Protocol):
    def has_database(self, database: str) -> bool: ...

    def create_database(self, database: str) -> None: ...

    def get_table(self, ident: CatalogTableIdentifier) -> Optional[dict]: ...

    def create_table(self, ident: CatalogTableIdentifier, base_path: str, table_format: str) -> None: ...

    def refresh_table(self, ident: CatalogTableIdentifier, base_path: str, table_format: str) -> None: ...

    def create_or_replace_table(self, ident: CatalogTableIdentifier, base_path: str, table_format: str) -> None: ...

    def drop_table(self, ident: CatalogTableIdentifier) -> None: ...


class SparkCatalogSyncClient:
    """CatalogSyncClient against the active Spark session catalog."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    def has_database(self, database: str) -> bool:
        return self.spark.catalog.databaseExists(database)

    def create_database(self, database: str) -> None:
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")

    def get_table(self, ident: CatalogTableIdentifier) -> Optional[dict]:
        if not self.spark.catalog.tableExists(ident.qualified):
            return None
        t = self.spark.catalog.getTable(ident.qualified)
        return {"name": t.name, "database": t.database, "tableType": t.tableType}

    def create_table(self, ident: CatalogTableIdentifier, base_path: str, table_format: str) -> None:
        if table_format == "PARQUET":
            self.spark.sql(
                f"CREATE TABLE IF NOT EXISTS {ident.qualified} USING parquet LOCATION '{base_path}'"
            )
        elif table_format == "DELTA":
            # no delta catalog support in this runtime: register the
            # log-replay read as a (session-scoped) view — same rows,
            # queryable by name
            from incubator_xtable_spark.sources.delta_source import read_delta_as_df

            read_delta_as_df(self.spark, base_path).createOrReplaceTempView(ident.table)
        else:
            raise ValueError(f"unsupported catalog table format: {table_format}")

    def refresh_table(self, ident: CatalogTableIdentifier, base_path: str, table_format: str) -> None:
        if table_format == "PARQUET":
            self.spark.sql(f"REFRESH TABLE {ident.qualified}")
        else:
            self.create_table(ident, base_path, table_format)

    def create_or_replace_table(self, ident: CatalogTableIdentifier, base_path: str, table_format: str) -> None:
        self.drop_table(ident)
        self.create_table(ident, base_path, table_format)

    def drop_table(self, ident: CatalogTableIdentifier) -> None:
        if self.spark.catalog.tableExists(ident.qualified):
            self.spark.sql(f"DROP TABLE IF EXISTS {ident.qualified}")
        self.spark.catalog.dropTempView(ident.table)


def sync_table_to_catalog(
    client: CatalogSyncClient,
    ident: CatalogTableIdentifier,
    base_path: str,
    table_format: str,
) -> None:
    """CatalogSync.syncTable orchestration: ensure database, then create or
    refresh (spi/sync/CatalogSync.java)."""
    if ident.database and not client.has_database(ident.database):
        client.create_database(ident.database)
    if client.get_table(ident) is None:
        client.create_table(ident, base_path, table_format)
    else:
        client.refresh_table(ident, base_path, table_format)
