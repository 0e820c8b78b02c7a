"""Offline coverage for the JDBC source's options assembly (SURVEY.md §2B
`source_jdbc_oracle`; VERDICT r2 item 7 / r3 missing item 1).

No Oracle listener or JDBC jar exists in the container, so the *live* read
is untestable — but every line of builder logic is: `build_jdbc_read` takes
any object with the DataFrameReader fluent surface, and these tests inject
a stub that records what the reader would ship to the JVM."""

from __future__ import annotations

import pytest

from desdb_spark.sources.jdbc import build_jdbc_read, jdbc_connection_properties

URL = "jdbc:oracle:thin:@//dbhost:1521/svc"


class StubReader:
    """Records the exact option/jdbc surface Spark's DataFrameReader has."""

    def __init__(self):
        self.fmt = None
        self.opts: dict[str, str] = {}
        self.jdbc_call = None
        self.loaded = False

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        self.loaded = True
        return self

    def jdbc(self, url, table, predicates=None, properties=None):
        self.jdbc_call = {
            "url": url,
            "table": table,
            "predicates": predicates,
            "properties": properties,
        }
        return self


def test_connection_properties():
    props = jdbc_connection_properties("scott", "tiger", fetchsize=5000)
    assert props == {
        "user": "scott",
        "password": "tiger",
        "driver": "oracle.jdbc.OracleDriver",
        "fetchsize": "5000",
    }


def test_partitioned_range_read_options():
    r = StubReader()
    out = build_jdbc_read(
        r,
        URL,
        "des_admin.catalog",
        "scott",
        "tiger",
        partition_column="object_id",
        lower_bound=0,
        upper_bound=10_000_000,
        num_partitions=64,
        fetchsize=20_000,
    )
    assert out is r and r.loaded and r.fmt == "jdbc"
    assert r.opts == {
        "url": URL,
        "dbtable": "des_admin.catalog",
        "user": "scott",
        "password": "tiger",
        "driver": "oracle.jdbc.OracleDriver",
        "fetchsize": "20000",
        "partitionColumn": "object_id",
        "lowerBound": "0",
        "upperBound": "10000000",
        "numPartitions": "64",
    }


def test_unpartitioned_read_omits_partition_options():
    r = StubReader()
    build_jdbc_read(r, URL, "t", "u", "p")
    assert "partitionColumn" not in r.opts
    assert r.opts["dbtable"] == "t"
    assert r.jdbc_call is None


def test_predicate_read_uses_one_partition_per_predicate():
    r = StubReader()
    preds = ["run = 'r1'", "run = 'r2'", "run = 'r3'"]
    build_jdbc_read(r, URL, "exposures", "u", "p", predicates=preds)
    assert r.jdbc_call == {
        "url": URL,
        "table": "exposures",
        "predicates": preds,
        "properties": jdbc_connection_properties("u", "p"),
    }
    assert not r.loaded  # the predicates path never goes through load()


def test_partition_column_requires_bounds():
    with pytest.raises(ValueError, match="lower_bound"):
        build_jdbc_read(StubReader(), URL, "t", "u", "p", partition_column="id")
