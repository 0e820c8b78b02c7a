"""Custom Python DataSource: a DES-style *file catalog* table
(SURVEY.md §2A A8/A10 — the file-location half of desdb).

Reference parity: desdb resolved catalog rows to files under ``$DESDATA``
and its sync scripts worked from directory listings [desdb:files.py,
bin/des-sync-* — reconstructed, SURVEY.md §0]. The engine exposes the
*filesystem itself* as a queryable table via Spark 4's Python DataSource
API::

    spark.dataSource.register(FileCatalogDataSource)
    df = (spark.read.format("filecatalog")
          .option("path", "/data/des")
          .option("template", "des/red/${run}/red/${expname}_${ccd}.fits.fz")
          .load())
    # columns: path, size_bytes, mtime, depth [, run, expname, ccd]

so release-run scans, sync planning (joins against the archive manifest),
and orphan detection become plain DataFrame queries.

Scale notes: the listing is *partitioned* — each top-level subdirectory
becomes an InputPartition, so a 10 M-file tree lists in parallel across
executors instead of on the driver; template keys are parsed per-row with
the same regex the path compiler emits (functions/paths.py), keeping
catalog↔path logic in one place.
"""

from __future__ import annotations

import os
import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from desdb_spark.functions.paths import _VAR_RE

BASE_FIELDS = [
    StructField("path", StringType()),
    StructField("size_bytes", LongType()),
    StructField("mtime", LongType()),
    StructField("depth", IntegerType()),
]


def _template_regex(template: str) -> tuple[re.Pattern, list[str]]:
    pattern, groups, pos = "", [], 0
    for m in _VAR_RE.finditer(template):
        pattern += re.escape(template[pos : m.start()]) + "([^/]+?)"
        groups.append(m.group(1) or m.group(2))
        pos = m.end()
    pattern += re.escape(template[pos:]) + "$"
    return re.compile(pattern), groups


class FileCatalogReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.root = options["path"]
        self.template = options.get("template")

    def partitions(self):
        # One partition per top-level entry → executor-parallel listing.
        try:
            entries = sorted(os.listdir(self.root))
        except FileNotFoundError:
            return [InputPartition("")]
        subdirs = [e for e in entries if os.path.isdir(os.path.join(self.root, e))]
        parts = [InputPartition(d) for d in subdirs]
        parts.append(InputPartition(""))  # files directly under root
        return parts

    def read(self, partition: InputPartition):
        base = os.path.join(self.root, partition.value) if partition.value else self.root
        rex_groups = _template_regex(self.template) if self.template else None
        recurse = bool(partition.value)
        for dirpath, _dirnames, filenames in os.walk(base):
            for fn in sorted(filenames):
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, self.root)
                try:
                    st = os.stat(full)
                except OSError:
                    continue
                row = [rel, st.st_size, int(st.st_mtime), rel.count(os.sep)]
                if rex_groups is not None:
                    m = rex_groups[0].search(rel)
                    row += [m.group(i + 1) if m else None for i in range(len(rex_groups[1]))]
                yield tuple(row)
            if not recurse:
                break  # root partition covers only its immediate files


class FileCatalogDataSource(DataSource):
    """spark.read.format("filecatalog").option("path", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "filecatalog"

    def schema(self) -> StructType:
        fields = list(BASE_FIELDS)
        template = self.options.get("template")
        if template:
            _, groups = _template_regex(template)
            fields += [StructField(g, StringType()) for g in groups]
        return StructType(fields)

    def reader(self, schema: StructType) -> DataSourceReader:
        return FileCatalogReader(dict(self.options))


def register_filecatalog(spark) -> None:
    """Idempotently register the DataSource with a session."""
    try:
        spark.dataSource.register(FileCatalogDataSource)
    except Exception:  # noqa: BLE001 — already registered in this session
        pass


def _register_op() -> None:
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    from desdb_spark.registry import register

    @register("source_filecatalog_scan", group="sources")  # rows-only: fs metadata
    def source_filecatalog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Query the fixture directory itself through the custom DataSource:
        the A8/A10 archive-scan shape (release listing / sync planning) as a
        plain DataFrame query. Sizes/mtimes are environment metadata, so the
        driver check is rows-only; listing semantics are pytest-covered in
        tests/test_filecatalog.py."""
        register_filecatalog(spark)
        df = spark.read.format("filecatalog").option("path", sf_dir).load()
        return (
            df.select(
                "path", "depth", (F.col("size_bytes") > 0).alias("non_empty")
            ).orderBy("path")
        )


_register_op()
