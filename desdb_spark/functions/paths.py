"""Path templating — the signature desdb capability (SURVEY.md §2A A8).

Reference parity: desdb's ``DESFiles`` maps (filetype, run, exposure, ccd,
band, tilename, …) to ``$DESDATA``-rooted paths / archive URLs via
``$VAR``-expansion templates [desdb:files.py DESFiles/get_url/expand_desvars
— reconstructed, SURVEY.md §0]. The engine re-expresses a template as a
*column expression*: ``$var`` placeholders compile to ``format_string``
over columns, so a billion paths are generated JVM-side inside whole-stage
codegen — no Python, no driver loop.

Scale notes: a path column derived from key columns is embarrassingly
parallel; the generated expression is codegen'd and costs ~nothing next to
the scan. This is the 100 TB replacement for desdb's per-row Python string
interpolation.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table

_VAR_RE = re.compile(r"\$\{(\w+)\}|\$(\w+)")

#: Engine analogues of desdb's filetype→template table
#: [desdb:files.py — SURVEY.md §2A A8]. Keys are synthetic-fixture columns
#: standing in for DES run/exposure/ccd keys.
TEMPLATES = {
    "red_image": "des/red/${run}/red/${expname}_${ccd}.fits.fz",
    "red_cat": "des/red/${run}/red/${expname}_${ccd}_cat.fits",
    "coadd_image": "des/coadd/${run}/coadd/${tilename}_${band}.fits.fz",
}


def compile_template(template: str, columns: dict[str, Column]) -> Column:
    """Compile a ``$var`` / ``${var}`` template into one Column expression.

    Literal chunks become ``lit``s; variables substitute the given columns
    (cast to string). The result is a single ``concat`` that Catalyst
    constant-folds and codegens.
    """
    parts: list[Column] = []
    pos = 0
    for m in _VAR_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        var = m.group(1) or m.group(2)
        if var not in columns:
            raise KeyError(f"template variable ${var} has no column binding")
        parts.append(columns[var].cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts) if parts else F.lit("")


def parse_path(df: DataFrame, template: str, path_col: str = "path") -> DataFrame:
    """Inverse of :func:`compile_template` for round-trip property tests:
    extract each ``$var`` back out of ``path_col`` via one regexp."""
    pattern, groups, pos = "^", [], 0
    for m in _VAR_RE.finditer(template):
        pattern += re.escape(template[pos : m.start()]) + "([^/_.]+)"
        groups.append(m.group(1) or m.group(2))
        pos = m.end()
    pattern += re.escape(template[pos:]) + "$"
    out = df
    for i, g in enumerate(groups, start=1):
        out = out.withColumn(g + "_parsed", F.regexp_extract(path_col, pattern, i))
    return out


@register(
    "project_path_template",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               'des/red/r' || lpad(CAST(l_suppkey AS VARCHAR), 4, '0')
                 || '/red/exp' || lpad(CAST(l_orderkey AS VARCHAR), 8, '0')
                 || '_' || lpad(CAST(l_linenumber AS VARCHAR), 2, '0')
                 || '.fits.fz' AS path
        FROM lineitem
    """,
    group="paths",
)
def project_path_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESFiles-style path column from catalog keys (emulated over lineitem)."""
    li = load_table(spark, sf_dir, "lineitem")
    path = compile_template(
        TEMPLATES["red_image"],
        {
            "run": F.concat(F.lit("r"), F.lpad(F.col("l_suppkey").cast("string"), 4, "0")),
            "expname": F.concat(
                F.lit("exp"), F.lpad(F.col("l_orderkey").cast("string"), 8, "0")
            ),
            "ccd": F.lpad(F.col("l_linenumber").cast("string"), 2, "0"),
        },
    )
    return li.select("l_orderkey", "l_linenumber", path.alias("path"))
