"""Z-order layout: Morton-key unit properties and the claim that matters
— a z-ordered file layout narrows per-file min/max rectangles in BOTH
dimensions, where a single-column sort narrows only its own."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from desdb_spark.session import load_table
from desdb_spark.sources.layout_ext import morton_key, zorder_layout
from tests.conftest import SF_DIR


def _py_spread(x: int) -> int:
    x &= 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _py_morton(a: int, b: int) -> int:
    return _py_spread(a) | (_py_spread(b) << 1)


def test_morton_key_matches_reference_interleave(spark):
    vals = [(0, 0), (1, 0), (0, 1), (1, 1), (255, 7), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame([(int(a), int(b)) for a, b in vals], ["a", "b"])
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", morton_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    for a, b in vals:
        assert got[(a, b)] == _py_morton(a, b), (a, b)


def test_morton_locality_adjacent_cells():
    # Z-order's defining property: the 2x2 block (2i, 2j).. maps to 4
    # consecutive codes.
    base = _py_morton(4, 6)
    assert {
        _py_morton(4, 6),
        _py_morton(5, 6),
        _py_morton(4, 7),
        _py_morton(5, 7),
    } == {base, base + 1, base + 2, base + 3}


def _file_rect_widths(spark, path: str, a: str, b: str):
    """Per-parquet-file (max-min) widths of columns a and b."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    rows = (
        df.groupBy("_f")
        .agg(
            (F.max(a) - F.min(a)).alias("wa"),
            (F.max(b) - F.min(b)).alias("wb"),
        )
        .collect()
    )
    return [(r.wa, r.wb) for r in rows]


def test_zorder_write_narrows_both_dimensions(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_partkey", "l_suppkey")
    full_a = li.agg(F.max("l_partkey") - F.min("l_partkey")).first()[0]
    full_b = li.agg(F.max("l_suppkey") - F.min("l_suppkey")).first()[0]
    base = tempfile.mkdtemp(prefix="desdb_zorder_test_")
    try:
        z_path = os.path.join(base, "zorder")
        s_path = os.path.join(base, "sorted_a")
        zorder_layout(li, "l_partkey", "l_suppkey", 16).write.parquet(z_path)
        (
            li.repartitionByRange(16, "l_partkey")
            .sortWithinPartitions("l_partkey")
            .write.parquet(s_path)
        )
        z_rects = _file_rect_widths(spark, z_path, "l_partkey", "l_suppkey")
        s_rects = _file_rect_widths(spark, s_path, "l_partkey", "l_suppkey")
        # Single-column sort: near-full width in the OTHER dimension.
        avg_s_wb = sum(wb for _, wb in s_rects) / len(s_rects)
        assert avg_s_wb > 0.9 * full_b
        # Z-order: both dimensions materially narrowed on average.
        avg_z_wa = sum(wa for wa, _ in z_rects) / len(z_rects)
        avg_z_wb = sum(wb for _, wb in z_rects) / len(z_rects)
        assert avg_z_wa < 0.6 * full_a, (avg_z_wa, full_a)
        assert avg_z_wb < 0.6 * full_b, (avg_z_wb, full_b)
    finally:
        shutil.rmtree(base, ignore_errors=True)
