"""User-facing connection API — desdb ``Connection`` parity (SURVEY.md §2A
A1-A4, §3 EP2).

Reference parity: desdb users wrote::

    conn = desdb.Connection()
    rows = conn.quick("SELECT ...")            # list of dicts
    arr  = conn.quick("SELECT ...", array=True)  # NumPy recarray
    conn.quickWrite("SELECT ...", fmt="csv")   # formatted stdout
    conn.describe("mytable")

[desdb:desdb.py Connection.quick/quickWrite/describe — reconstructed,
SURVEY.md §0]. The engine keeps that ergonomic surface but swaps the Oracle
session for a SparkSession over a table catalog, removing the
client-memory ceiling: ``quick`` still materializes (it is the explicit
"give me rows" call, sized by the query), while ``query()`` returns the
lazy DataFrame for anything big.

Scale notes: ``quick``/``quick_numpy`` pull through Arrow (`toPandas`);
``quickWrite`` streams partition-at-a-time; ``query`` never materializes.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from desdb_spark.session import get_spark, load_tables


class Connection:
    """A desdb-shaped handle over a Spark catalog of parquet tables."""

    def __init__(self, sf_dir: str, spark: SparkSession | None = None) -> None:
        self.spark = spark or get_spark("desdb-connection")
        self.sf_dir = sf_dir
        self.tables = load_tables(self.spark, sf_dir)

    def query(self, sql: str) -> DataFrame:
        """Lazy arbitrary-SQL passthrough (the A1 surface, un-materialized)."""
        return self.spark.sql(sql)

    def quick(self, sql: str, lists: bool = False) -> list[Any]:
        """Execute SQL, return list of dicts (default) or list of lists —
        desdb's two row shapes."""
        rows = self.query(sql).collect()
        if lists:
            return [list(r) for r in rows]
        return [r.asDict() for r in rows]

    def quick_numpy(self, sql: str):
        """Execute SQL, return a NumPy recarray (desdb's array=True shape,
        via Arrow instead of a Python conversion loop)."""
        return self.query(sql).toPandas().to_records(index=False)

    def quickWrite(self, sql: str, fmt: str = "csv", out=None) -> int:
        """Execute SQL, stream formatted rows (csv/tsv/space/json) to
        ``out``/stdout with a header; returns the row count."""
        from desdb_spark.sources.sinks import write_stream_stdout

        return write_stream_stdout(self.query(sql), fmt, out=out)

    def describe(self, table: str) -> list[dict[str, Any]]:
        """Column name/type/nullable listing (desdb's describe, A4)."""
        df = self.tables[table] if table in self.tables else self.spark.table(table)
        return [
            {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
            for f in df.schema.fields
        ]

    def list_tables(self) -> list[str]:
        return sorted(self.tables)
