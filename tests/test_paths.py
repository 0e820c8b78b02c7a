"""Path-template round-trip property (SURVEY.md §5.2.4): compile(keys) then
parse(path) must recover the keys — the invariant desdb's DESFiles logic
relied on operationally."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from desdb_spark.functions import paths


@pytest.fixture(scope="module")
def spark_m(spark):
    return spark


KEY = st.text(alphabet="abcdefghij0123456789", min_size=1, max_size=8)


@settings(max_examples=25, deadline=None)
@given(run=KEY, expname=KEY, ccd=KEY)
def test_template_roundtrip(spark_m, run, expname, ccd):
    from pyspark.sql import functions as F

    df = spark_m.createDataFrame([(run, expname, ccd)], "run string, expname string, ccd string")
    tpl = paths.TEMPLATES["red_image"]
    built = df.withColumn(
        "path",
        paths.compile_template(
            tpl, {"run": F.col("run"), "expname": F.col("expname"), "ccd": F.col("ccd")}
        ),
    )
    parsed = paths.parse_path(built, tpl).collect()[0]
    assert parsed.run_parsed == run
    assert parsed.expname_parsed == expname
    assert parsed.ccd_parsed == ccd


def test_unknown_variable_raises():
    with pytest.raises(KeyError):
        paths.compile_template("a/${nope}/b", {})


def test_literal_only_template(spark_m):
    from pyspark.sql import functions as F  # noqa: F401

    df = spark_m.range(1).withColumn("p", paths.compile_template("static/path", {}))
    assert df.collect()[0].p == "static/path"
