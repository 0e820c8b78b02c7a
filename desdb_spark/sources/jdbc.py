"""JDBC source — the literal desdb capability (SURVEY.md §2B
``source_jdbc_oracle``; capability only, no Oracle reachable offline).

Reference parity: desdb's whole purpose was shipping SQL to an Oracle
server over cx_Oracle [desdb:desdb.py Connection — SURVEY.md §0]. The
Spark-native equivalent is ``spark.read.jdbc`` with *partitioned* reads:
instead of one cursor streaming all rows to one client (desdb's
scalability ceiling, SURVEY.md §3 EP2), N executors each open a connection
for one key-range slice.

Scale notes: ``partition_column/num_partitions`` turns the read into N
parallel range scans; ``predicates`` pushes desdb's canned WHERE clauses
(A6) to the server; ``fetchsize`` is the arraysize knob desdb tuned in
``quickWrite``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_oracle_table(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 16,
    predicates: list[str] | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Partitioned JDBC read of an Oracle catalog table.

    Untestable offline (no Oracle listener, no JDBC jar in the container);
    the builder logic is kept total so a cluster user can call it directly.
    """
    props = {
        "user": user,
        "password": password,
        "driver": "oracle.jdbc.OracleDriver",
        "fetchsize": str(fetchsize),
    }
    if predicates:
        # One partition per predicate — desdb's canned IN-list queries (A6)
        # become server-side parallel slices.
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in props.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()
