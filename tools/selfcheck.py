"""Local replica of the driver's correctness gate (SURVEY.md §5.2.2).

Runs every registered operator's Spark DataFrame and its DuckDB oracle SQL
on the same parquet fixtures, then compares row count + column names +
order-insensitive value hash. Usage:

    python tools/selfcheck.py [--sf /root/testdata/sf0.01] [names...]

Exit code 0 iff every checked operator matches. Operators without an oracle
get a rows-only check (runs + row count printed).
"""

from __future__ import annotations

import argparse
import datetime as _dt
import hashlib
import math
import os
import sys
import time

import duckdb
import pandas as pd

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from desdb_spark.registry import all_operators  # noqa: E402
from desdb_spark.session import TABLES, get_spark, load_tables  # noqa: E402


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        # Strict bitwise compare: declared queries are responsible for
        # rounding order-dependent aggregates (SURVEY.md §5.3).
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        # Spark hands DATE as datetime.date; DuckDB hands it as
        # datetime64 midnight — canonicalize both to the same string.
        return v.isoformat() + "T00:00:00"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ in ("ndarray", "MaskedArray"):
        # tolist() maps numpy scalars to Python and masked entries (DuckDB
        # NULL-in-list) to None, matching Spark's None-in-list.
        items = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon_cell(x) for x in items) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _kind(dtype, series: pd.Series) -> str:
    k = dtype.kind
    if k in "iu":
        return f"int{dtype.itemsize * 8}"
    if k == "f":
        return "float"
    if k == "M":
        return "ts"
    if k == "b":
        return "bool"
    if k == "O":
        sample = next((v for v in series if v is not None), None)
        if isinstance(sample, (int,)):
            return "int64"
        if isinstance(sample, float):
            return "float"
        if isinstance(sample, _dt.date):  # date or datetime objects
            return "ts"
        return "obj"
    return "obj"


def driver_shape_gate(df: pd.DataFrame) -> None:
    """Replicate the external driver's canonicalization entry point
    (VERDICT r6 item 3): the driver sorts the result frame with pandas
    ``sort_values`` over ALL columns before hashing, and that call
    raises ``TypeError: unhashable type`` on array/map/struct cells
    (pandas factorizes the sort keys through a hash table). The r6
    driver ERR on agg_collect_sorted_list was exactly this — correct
    values, un-canonicalizable shape — and it was invisible locally
    because our own ``canonicalize`` handles list cells per-cell. Run
    the same ``sort_values`` here so the next shape incompatibility
    fails in selfcheck before it burns a driver window slot.
    """
    cols = sorted(df.columns.astype(str))
    if cols and len(df):
        df[cols].sort_values(by=cols)


def canonicalize(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns.astype(str))
    body = df[cols]
    typed = [f"{c}:{_kind(body[c].dtype, body[c])}" for c in cols]
    rows = sorted(
        "|".join(_canon_cell(v) for v in row) for row in body.itertuples(index=False)
    )
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(df), typed, h


def run(sf_dir: str, names: list[str] | None, driver_config: bool = False) -> int:
    ops = all_operators()
    selected = names or sorted(ops)
    unknown = [n for n in selected if n not in ops]
    if unknown:
        print(f"unknown operators: {unknown}")
        return 2

    if driver_config:
        # Mirror the external driver's session shape instead of the
        # sweep-speed config (VERDICT r9 item 2): Spark DEFAULT shuffle
        # partitioning (200) and no pinned parallelism, so float
        # summation-order sensitivity surfaces HERE instead of burning a
        # driver window slot. The r9 docs_dsir_importance_weights red
        # row was exactly this class: 4/4 PASS at shuffle_partitions=8,
        # hash-red under the driver's own config. Run the full sweep
        # once in each mode before declaring a round green.
        print("session: driver-config (Spark default 200 shuffle partitions)")
        spark = get_spark(
            "selfcheck-driverconf",
            shuffle_partitions=200,
            extra_conf={"spark.driver.memory": "4g"},
        )
        # get_spark goes through getOrCreate(): a pre-existing session in
        # this process (programmatic use, pytest) would silently keep ITS
        # shuffle config while the banner above claims driver-config —
        # the mode would then not surface summation-order sensitivity at
        # all (ADVICE r10). Fail loudly instead.
        actual = spark.conf.get("spark.sql.shuffle.partitions")
        if actual != "200":
            raise RuntimeError(
                "--driver-config requested but the session runs at "
                f"shuffle_partitions={actual} (a pre-existing SparkSession "
                "won the getOrCreate race); stop it first"
            )
    else:
        # 4g heap: local[32] runs up to 32 concurrent tasks in ONE JVM,
        # and the r11 full-width verify probes (PPJoin family) legally
        # use all of them — at the default 1g the sf0.1 sweep died with
        # GCLocker allocation thrash in the fan stage. Spill-aware
        # session sizing, not an engine knob; the external driver's own
        # gate runs at sf0.01 where the default heap is ample.
        spark = get_spark(
            "selfcheck",
            shuffle_partitions=8,
            extra_conf={"spark.driver.memory": "4g"},
        )
    # spark.driver.memory is a LAUNCH-TIME conf: getOrCreate() silently
    # ignores it when a SparkSession already exists in this process, and
    # unlike shuffle_partitions nothing downstream would visibly differ —
    # the GCLocker-thrash fix would just silently not be in effect and the
    # sweep would die mid-fan (ADVICE r11). Mirror the loud guard above.
    actual_mem = spark.sparkContext.getConf().get("spark.driver.memory", "1g")
    if actual_mem != "4g":
        raise RuntimeError(
            f"selfcheck requested spark.driver.memory=4g but the session "
            f"runs at {actual_mem} (a pre-existing SparkSession won the "
            "getOrCreate race); stop it first"
        )
    load_tables(spark, sf_dir)

    import re as _re

    m = _re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf_value = float(m.group(1)) if m else None

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name in selected:
        op = ops[name]
        t0 = time.time()
        try:
            sdf = op.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if op.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows ({dt:.1f}s) [rows-only]")
            continue
        if (
            op.oracle_max_sf is not None
            and sf_value is not None
            and sf_value > op.oracle_max_sf
        ):
            # Oracle intractable for single-node SQL past this scale
            # (documented per-op); the driver's sf0.01 gate still runs it.
            print(
                f"rows  {name}: {len(sdf)} rows ({dt:.1f}s) "
                f"[oracle capped at sf{op.oracle_max_sf}]"
            )
            continue
        try:
            odf = con.execute(op.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        try:
            driver_shape_gate(sdf)
            sn, sc, sh = canonicalize(sdf)
            on, oc, oh = canonicalize(odf)
        except Exception as e:  # noqa: BLE001
            print(
                f"FAIL  {name}: canonicalize error (driver-shape): "
                f"{type(e).__name__}: {str(e)[:200]}"
            )
            failures.append(name)
            continue
        if sn != on:
            print(f"FAIL  {name}: rows spark={sn} duckdb={on}")
            failures.append(name)
        elif sc != oc:
            print(f"FAIL  {name}: cols spark={sc} duckdb={oc}")
            failures.append(name)
        elif sh != oh:
            print(f"FAIL  {name}: value-hash mismatch ({sn} rows)")
            _diff_sample(sdf, odf)
            failures.append(name)
        else:
            print(f"PASS  {name}: {sn} rows ({dt:.1f}s)")

    print(f"\n{len(selected) - len(failures)}/{len(selected)} ok; failures: {failures}")
    return 1 if failures else 0


def _diff_sample(sdf: pd.DataFrame, odf: pd.DataFrame, k: int = 3) -> None:
    cols = sorted(sdf.columns.astype(str))
    srows = {
        "|".join(_canon_cell(v) for v in r)
        for r in sdf[cols].itertuples(index=False)
    }
    orows = {
        "|".join(_canon_cell(v) for v in r)
        for r in odf[cols].itertuples(index=False)
    }
    for label, diff in (("spark-only", srows - orows), ("duckdb-only", orows - srows)):
        for row in list(diff)[:k]:
            print(f"      {label}: {row[:200]}")


def _names_changed_since(ref: str) -> list[str]:
    """Operators whose defining module changed in `git diff ref..HEAD`
    (plus uncommitted changes) — the cheap CI sweep: re-check exactly the
    ops whose code moved since the last committed selfcheck log."""
    import subprocess

    out = subprocess.run(
        ["git", "diff", "--name-only", ref, "--", "desdb_spark/"],
        capture_output=True, text=True, cwd=_REPO_ROOT, check=True,
    ).stdout
    changed_files = {ln.strip() for ln in out.splitlines() if ln.strip()}
    names = []
    for name, op in all_operators().items():
        mod_path = op.fn.__module__.replace(".", "/") + ".py"
        if mod_path in changed_files:
            names.append(name)
    return sorted(names)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--names-from-file",
        help="newline-separated operator names (lines starting # ignored)",
    )
    ap.add_argument(
        "--changed-since",
        metavar="GIT_REF",
        help="check only ops whose defining module differs from GIT_REF",
    )
    ap.add_argument(
        "--driver-config",
        action="store_true",
        help="run under the driver's session shape (Spark default 200 "
        "shuffle partitions, no pinned parallelism) so float-order "
        "sensitivity surfaces locally",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = list(args.names)
    if args.names_from_file:
        with open(args.names_from_file) as fh:
            names += [
                ln.strip()
                for ln in fh
                if ln.strip() and not ln.lstrip().startswith("#")
            ]
    if args.changed_since:
        names += _names_changed_since(args.changed_since)
        if not names:
            print(f"no operator modules changed since {args.changed_since}; nothing to check")
            sys.exit(0)
    sys.exit(run(args.sf, sorted(set(names)) or None, args.driver_config))
