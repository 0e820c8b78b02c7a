"""Round-7: custom Python DataSource WRITER — the write half of Spark
4's Python DataSource API (the read half is sources/filecatalog.py).
A user-defined format gets full ``df.write.format(...)`` integration:
Spark plans the job, fans partitions out to executors, calls
``DataSourceWriter.write`` once per task (returning a commit message),
and ``commit`` runs once on the driver with every task's message — the
two-phase commit shape every table format builds on.

The demo format ("kvtext") is deliberately trivial — one
``key=value;…`` line per row — because the op under test is the
PROTOCOL: task-parallel writes, per-task commit messages, driver-side
commit manifest, and a reader that restores typed rows from the
written files. The registered op round-trips an orders projection and
hash-checks the re-read aggregate against DuckDB on the source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from desdb_spark.registry import register
from desdb_spark.session import load_table

FORMAT_NAME = "kvtext"
_SCHEMA_DDL = "o_orderkey bigint, o_orderstatus string, o_total_cents bigint"


class _KvCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int) -> None:
        self.path = path
        self.rows = rows


class KvTextWriter(DataSourceWriter):
    def __init__(self, options: dict) -> None:
        self.root = options["path"]

    def write(self, iterator) -> _KvCommit:
        """Runs ONCE PER TASK on the executor: stream the partition's
        rows to a task-private file (no coordination until commit)."""
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.root, exist_ok=True)
        path = os.path.join(self.root, f"part-{pid:05d}.kvtext")
        n = 0
        with open(path, "w") as fh:
            for row in iterator:
                fh.write(
                    f"o_orderkey={row.o_orderkey};"
                    f"o_orderstatus={row.o_orderstatus};"
                    f"o_total_cents={row.o_total_cents}\n"
                )
                n += 1
        return _KvCommit(path, n)

    def commit(self, messages) -> None:
        """Driver-side: publish the manifest — the atomic-visibility
        point a real format (Delta/Iceberg commit) builds on."""
        with open(os.path.join(self.root, "_MANIFEST"), "w") as fh:
            for m in messages:
                fh.write(f"{os.path.basename(m.path)}\t{m.rows}\n")

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


class KvTextReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.root = options["path"]

    def partitions(self):
        with open(os.path.join(self.root, "_MANIFEST")) as fh:
            files = [ln.split("\t")[0] for ln in fh if ln.strip()]
        return [InputPartition(f) for f in sorted(files)]

    def read(self, partition: InputPartition):
        with open(os.path.join(self.root, partition.value)) as fh:
            for line in fh:
                kv = dict(p.split("=", 1) for p in line.rstrip("\n").split(";"))
                yield (
                    int(kv["o_orderkey"]),
                    kv["o_orderstatus"],
                    int(kv["o_total_cents"]),
                )


class KvTextDataSource(DataSource):
    """df.write.format("kvtext") / spark.read.format("kvtext")."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return _SCHEMA_DDL

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return KvTextWriter(dict(self.options))

    def reader(self, schema: StructType) -> DataSourceReader:
        return KvTextReader(dict(self.options))


def register_kvtext(spark: SparkSession) -> None:
    try:
        spark.dataSource.register(KvTextDataSource)
    except Exception:  # noqa: BLE001  (already registered in this session)
        pass


@register(
    "sink_python_datasource",
    # Round-trip proof, the sink discipline: the re-read aggregate must
    # equal DuckDB's aggregate over the source table — a lossy custom
    # writer, a dropped task file, or a bad manifest fails the hash.
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
        FROM orders
    """,
    group="pyds_sink",
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write an orders projection through the custom Python DataSource
    writer (task-parallel files + driver commit manifest), read it back
    through the matching reader, and return the content aggregate.

    Scale shape: the writer is the PROTOCOL demo — each task streams
    its partition to its own file and coordination happens only at the
    driver commit, exactly how distributed table formats write. The
    toy line format swaps for Arrow/parquet encoding without touching
    the protocol. Money rides as exact integer cents through the text
    roundtrip, so the hash needs no float tolerance.
    """
    import tempfile

    register_kvtext(spark)
    out = os.path.join(
        tempfile.gettempdir(),
        f"desdb_kvtext_{spark.sparkContext.applicationId}",
    )
    proj = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("o_total_cents"),
    )
    proj.write.format(FORMAT_NAME).mode("append").option("path", out).save()
    back = spark.read.format(FORMAT_NAME).option("path", out).load()
    return back.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("o_orderkey").cast("bigint").alias("n_orders"),
        F.sum("o_total_cents").cast("bigint").alias("sum_cents"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("n_statuses"),
    )
