"""Spark 4 ``transformWithStateInPandas`` — the successor API to
``applyInPandasWithState`` (streaming/stateful.py): typed value/list/map
state handles, timers, and TTL on the RocksDB store.

CAPABILITY MODULE, not a registered operator: the API's Python STREAMING
RUNNER requires a working ``google.protobuf`` at runtime, which this
container lacks (verified: the runner crashes with ``ImportError: cannot
import name 'descriptor' from 'google.protobuf'`` before any user code
runs). The ``StatefulProcessor`` CLASS itself imports fine without
protobuf, so r15 (VERDICT r14 item 6) splits the surface in two:

- the live-runner arm (``transform_with_state_profile``) stays gated by
  ``is_available()`` — on a normally-provisioned cluster it runs as-is;
- ``emulate_transform_with_state`` drives the IDENTICAL processor class
  through its init/handleInputRows/close lifecycle with a local
  value-state shim, so the processor's semantics (state threading across
  micro-batches, fixed-point accumulation, per-key isolation) are
  testable in any environment — tests/test_streaming_stateful.py now
  RUNS this arm here instead of skipping, and still runs the live arm
  where protobuf exists.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

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


def make_profile_processor():
    """The ``StatefulProcessor`` for the per-user running (count, sum)
    profile — the transformWithState twin of stateful_user_profile.
    Built by a factory so BOTH arms (the live streaming runner and the
    protobuf-free local emulator) drive the same class.
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

    return _Profile()


class _LocalValueState:
    """Minimal ValueState twin: exists/get/update against a Python slot.
    Mirrors pyspark.sql.streaming.value_state's surface that processors
    touch; clear() included for completeness."""

    def __init__(self) -> None:
        self._value = None
        # Existence is a separate flag, NOT inferred from the value being
        # non-None (r16 ADVICE): the real ValueState reports exists()==True
        # after update(None) until clear() — inferring from the value would
        # let the emulator validate semantics the live runner rejects.
        self._set = False

    def exists(self) -> bool:
        return self._set

    def get(self):
        return self._value

    def update(self, value) -> None:
        self._value = value
        self._set = True

    def clear(self) -> None:
        self._value = None
        self._set = False


class _LocalHandle:
    """StatefulProcessorHandle twin handing out named local value states."""

    def __init__(self) -> None:
        self._states: dict[str, _LocalValueState] = {}

    def getValueState(self, name: str, schema, ttl_duration_ms=None):
        return self._states.setdefault(name, _LocalValueState())


def emulate_transform_with_state(
    processor_factory: Callable[[], object],
    keyed_batches: Iterable[tuple[tuple, object]],
):
    """Drive a ``StatefulProcessor`` through the transformWithState
    lifecycle locally: one processor instance per grouping key (init'd
    with a local handle), ``handleInputRows`` per micro-batch in arrival
    order, ``close`` at the end. Returns every emitted pandas frame in
    emission order — the update-mode output stream.

    This is the protobuf-free test harness for environments where the
    streaming Python runner cannot start (module docstring); it
    exercises the processor's OWN semantics — state threading across
    micro-batches, per-key isolation — not Spark's shuffle/store
    plumbing, which the live arm covers where available.
    """
    processors: dict[tuple, object] = {}
    out = []
    for key, pdf in keyed_batches:
        proc = processors.get(key)
        if proc is None:
            proc = processor_factory()
            proc.init(_LocalHandle())
            processors[key] = proc
        out.extend(proc.handleInputRows(key, iter([pdf]), None))
    for proc in processors.values():
        proc.close()
    return out


def transform_with_state_profile(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) via the profile ``StatefulProcessor``
    with a typed ValueState handle. Requires the RocksDB state store
    provider (transformWithState's only supported store) — set
    ``spark.sql.streaming.stateStore.providerClass`` to
    streaming.stateful.ROCKSDB_PROVIDER before starting the query.
    """
    from pyspark.sql import functions as F

    events_stream = events_stream.select(
        "user_id", F.round(F.col("value") * 10_000, 0).cast("long").alias("value_q")
    )
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        make_profile_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
