"""SparkSession + table-loading substrate (SURVEY.md §7.1 M0).

Reference parity: desdb's ``Connection`` managed an Oracle session and the
set of server-side tables [desdb:desdb.py Connection — reconstructed, see
SURVEY.md §0]. Here the "connection" is a SparkSession and the "schema" is
the fixture parquet directory: ``load_tables`` registers every table as a
temp view so both the DataFrame API (EP2) and ``spark.sql`` passthrough
(EP1, desdb's ``quick()``) work against the same catalog.

Scale notes (100 TB): everything here is declarative — the reader never
materializes on the driver. The only session-level tuning baked in is AQE
(runtime shuffle-partition coalescing + skew-join splitting), which is the
correct default for unknown data volumes; per-table layout decisions
(partitioning, bucketing) belong to the writers in sources/sinks.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: All fixture tables, in FK-dependency order (TESTDATA.md / FIXTURES.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "desdb-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine session.

    The events fixture stores ``timestamp[ns]``; how the parquet reader
    surfaces it has drifted across PySpark 4.1.2 builds (``nanosAsLong`` →
    bigint in older builds; the conf is silently ignored in the current one,
    which reads TIMESTAMP(NANOS) as timestamp_ntz). The conf is still set
    as best-effort for older builds; the dtype-conditional
    ``normalize_events_ts`` is the real shim — never rely on the conf.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


#: DataFrame cache keyed by (spark application id, sf_dir, table name,
#: file fingerprint). DataFrames are immutable logical plans, so reuse is
#: safe while the underlying files are unchanged; the win is skipping
#: repeated file-listing + schema inference + analysis for every operator
#: invocation in one session (~100 ms of py4j/Catalyst fixed cost per read
#: at fixture scale — the dominant term vs the DuckDB baseline). The
#: fingerprint (ADVICE r3) makes a rewritten table produce a fresh read —
#: the cached DataFrame's InMemoryFileIndex snapshots the file listing, so
#: without it a rewrite within one session would serve stale data.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def scoped_export_dir(name: str) -> str:
    """Static-per-checkout path for a differential-oracle export sink
    (r14 — ADVICE r13: fixed world-readable paths let a stale export,
    another user, or a concurrent harness feed the DuckDB oracle data
    the op never produced). r15 (ADVICE r14): rooted under the repo
    checkout's gitignored ``_scratch/exports/`` instead of /tmp — the
    path stays a STATIC string at import time (the oracle SQL embeds
    it, preserving the static-oracle contract), cross-checkout
    collisions are impossible by construction (each checkout owns its
    own tree), and the /tmp squatting window is gone: under /tmp an
    adversary could pre-create the predictable path as world-writable,
    let Spark's overwrite succeed, and inject rows copying the visible
    run_token — a silent wrong-pass. Repo-directory permissions now
    gate every write. The user suffix stays so two users sharing one
    checkout (sudo workflows) keep distinct dirs; the remaining
    same-checkout concurrent-harness window is still closed by the
    run_token column each export carries (the hashed report includes
    n_runs = count(distinct run_token), so a torn/mixed read reds
    deterministically)."""
    import getpass

    try:
        user = getpass.getuser()
    except Exception:  # no USER/LOGNAME and no passwd entry (bare container)
        user = f"uid{os.getuid()}" if hasattr(os, "getuid") else "nouser"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(repo, "_scratch", "exports", f"{name}_{user}")


def table_fingerprint(sf_dir: str, name: str) -> tuple:
    """Cheap identity of a table's files: (path, mtime_ns, size) per file.

    Local-filesystem stat only; non-local paths (or stat failures) degrade
    to a constant path-only key — i.e. the pre-r4 no-invalidation behavior
    — rather than raising. Object-store users should call
    ``clear_table_cache`` explicitly after rewrites.
    """
    root = os.path.join(sf_dir.rstrip("/"), f"{name}.parquet")
    try:
        if os.path.isfile(root):
            st = os.stat(root)
            return ((root, st.st_mtime_ns, st.st_size),)
        out = []
        for dirpath, _, files in os.walk(root):
            for f in sorted(files):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out.append((p, st.st_mtime_ns, st.st_size))
        return tuple(out) or ((root, None, None),)
    except OSError:
        return ((root, None, None),)


def clear_table_cache() -> None:
    _TABLE_CACHE.clear()


#: Broadcast-gate cap (r17 — the ADVICE r16 forced-broadcast class): a
#: forced ``F.broadcast`` hint removes the planner's shuffle-join
#: fallback, so any hint whose build side GROWS with the corpus must be
#: gated on a measured scale statistic — beyond the cap the hint is
#: dropped and the planner chooses, which degrades to a shuffle join
#: instead of an 8 GB-relation-cap error or a driver OOM. 256 MiB of
#: on-disk build-side bytes keeps the in-memory relation in the
#: guide-§3.1 "few hundred MB" band with the hard cap far away.
#: Env-overridable so production can retune it and so the fallback path
#: is probe-testable at fixture scale (DESDB_MAX_BROADCAST_BYTES=0).
MAX_BROADCAST_EST_BYTES = int(
    os.environ.get("DESDB_MAX_BROADCAST_BYTES", str(256 * 1024 * 1024))
)


def table_bytes(sf_dir: str, name: str) -> int | None:
    """On-disk bytes of one fixture table's parquet files — a free
    (driver-side stat, no Spark job) monotone scale statistic for
    broadcast gates. ``None`` when the size is unknowable (non-local
    path / stat failure), which gates must treat as over-cap: at real
    scale the data lives where stat fails, and the safe degradation is
    the planner's join choice, never a forced broadcast."""
    sizes = [sz for _, _, sz in table_fingerprint(sf_dir, name)]
    if any(sz is None for sz in sizes):
        return None
    return sum(sizes)


def dir_bytes(path: str) -> int | None:
    """``table_bytes`` for an arbitrary local file/directory (engine-
    written side tables: deletion vectors, staged batches)."""
    try:
        if os.path.isfile(path):
            return os.stat(path).st_size
        total = 0
        seen = False
        for dirpath, _, files in os.walk(path):
            for f in files:
                total += os.stat(os.path.join(dirpath, f)).st_size
                seen = True
        return total if seen else None
    except OSError:
        return None


def maybe_broadcast(df: DataFrame, est_bytes: int | None) -> DataFrame:
    """``F.broadcast(df)`` while the measured/estimated build side is
    provably small; the bare frame (planner's choice) when it is big or
    unknowable. The hint is a pure planner directive, so gating it can
    never change results — only the join strategy."""
    if est_bytes is not None and 0 <= est_bytes <= MAX_BROADCAST_EST_BYTES:
        return F.broadcast(df)
    return df


def pin_session_confs(spark: SparkSession) -> None:
    """Pin runtime-settable confs any fixture read depends on: the driver
    may hand us a session built without UTC timezone / AQE. The UTC pin is
    load-bearing for events: ``normalize_events_ts`` casts timestamp_ntz →
    timestamp, which is wall-clock-exact only under UTC. ``nanosAsLong``
    stays as best-effort for older builds that reject TIMESTAMP(NANOS)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # A stock session means nobody tuned parallelism: 200 shuffle tasks per
    # op is pure scheduling overhead at fixture scale. Respect any
    # non-default setting (bench pins 4, selfcheck 8).
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        spark.conf.set("spark.sql.shuffle.partitions", "32")


def values_frame(spark: SparkSession, rows: list[tuple], ddl: str) -> DataFrame:
    """Tiny literal result frame via an inline SQL ``VALUES`` scan.

    r17: ``spark.createDataFrame(list, ddl)`` routes small fitted-scalar
    results through RDD ``parallelize`` + per-row schema verification and
    costs 1.4-3 s of job/py4j overhead PER CALL even for 5 rows (measured
    at the bench session confs; an ``orderBy`` on the parallelized frame
    adds another ~1.3 s). The same rows as an inline ``VALUES`` string
    plan as a ``LocalRelation`` — zero jobs, ~0.2 s to materialize, and a
    later ``orderBy`` stays floor-bound. Driver-scale safe by contract:
    callers only emit bounded fitted-scalar grids (a handful of rows).

    Supported cell types: int, bool, str, None, float. Floats embed as
    ``CAST('<repr>' AS DOUBLE)`` — repr() is the shortest round-trip
    decimal and Spark's string→double parse is correctly rounded, so the
    exact IEEE bits survive (a bare decimal literal would instead parse
    as DECIMAL and change semantics; same discipline as the r15
    selectExpr builds). Non-finite doubles use Spark's named literals.
    """
    if not rows:
        return spark.createDataFrame([], ddl)
    cols = [c.strip().split(None, 1) for c in ddl.split(",")]

    def lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, int):
            return repr(v)
        if isinstance(v, float):
            if v != v:
                return "CAST('NaN' AS DOUBLE)"
            if v in (float("inf"), float("-inf")):
                return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
            return f"CAST('{v!r}' AS DOUBLE)"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        raise TypeError(f"values_frame: unsupported literal {type(v).__name__}")

    vals = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    names = ", ".join(n for n, _ in cols)
    sel = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
    return spark.sql(f"SELECT {sel} FROM (VALUES {vals}) AS t({names})")


def normalize_events_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp column to a session-TZ ``timestamp``,
    whatever the parquet reader surfaced it as.

    The fixture stores ``timestamp[ns]``, which different PySpark builds
    surface differently (observed drift within this project's lifetime):

    - ``bigint`` — when ``spark.sql.legacy.parquet.nanosAsLong`` is honored:
      nanos→micros via integer division (exact, no double round-trip).
    - ``timestamp_ntz`` — current PySpark 4.1.2 ignores the legacy conf and
      reads TIMESTAMP(NANOS) as NTZ truncated to micros. Cast to ``timestamp``
      under the pinned UTC session TZ — wall-clock identical, µs-exact with
      the DuckDB oracle (verified: 2024-01-01 00:09:58.778549 both paths).
    - ``timestamp`` — already normalized; pass through.

    Works on both batch and streaming DataFrames (pure column expression).
    Every code path that reads events parquet — batch ``load_table`` or a
    ``readStream`` source — MUST route through this instead of hand-rolling
    the conversion, or environment drift breaks it silently (VERDICT r4).
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif dt == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with schema normalization applied (memoized)."""
    pin_session_confs(spark)
    key = (
        spark.sparkContext.applicationId,
        sf_dir.rstrip("/"),
        name,
        table_fingerprint(sf_dir, name),
    )
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all fixture tables and register them as temp views.

    Views make ``spark.sql(...)`` passthrough work — the engine analogue of
    desdb's arbitrary-SQL ``Connection.quick()`` (SURVEY.md §2A A1).
    """
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
