"""des-query-style CLI (SURVEY.md §2A A11).

Reference parity: desdb shipped ``des-query`` — SQL from stdin or ``-q``,
``-f`` picks csv/tab/space/json output, results stream to stdout
[desdb:bin/des-query — reconstructed, SURVEY.md §0]. The engine maps it to
``spark.sql`` over the registered fixture views plus the A2 formatted
writers.

Usage:
    python -m desdb_spark.cli -q "SELECT count(*) AS n FROM lineitem" -f csv
    echo "SELECT * FROM region" | python -m desdb_spark.cli --sf /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="des-query", description=__doc__)
    ap.add_argument("-q", "--query", help="SQL string (default: read stdin)")
    ap.add_argument(
        "-f", "--format", default="csv", choices=["csv", "tsv", "space", "json"]
    )
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="fixture dir")
    ap.add_argument("--explain", action="store_true", help="print the physical plan")
    args = ap.parse_args(argv)

    sql = args.query or sys.stdin.read()
    if not sql.strip():
        print("error: empty query", file=sys.stderr)
        return 2

    from desdb_spark.session import get_spark, load_tables
    from desdb_spark.sources.sinks import write_stream_stdout

    spark = get_spark("des-query", shuffle_partitions=8)
    load_tables(spark, args.sf)
    try:
        df = spark.sql(sql)
    except Exception as e:  # noqa: BLE001 — surface a clean one-line error
        lines = [ln for ln in str(e).splitlines() if ln.strip()]
        msg = lines[0].strip() if lines else type(e).__name__
        print(f"error: {msg}", file=sys.stderr)
        return 1
    if args.explain:
        df.explain("formatted")
        return 0
    write_stream_stdout(df, args.format)
    return 0


if __name__ == "__main__":
    sys.exit(main())
