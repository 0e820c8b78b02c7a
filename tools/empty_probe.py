"""Empty-input census (r15): run EVERY registered operator against a
zero-row copy of the fixtures and classify the outcome.

Two contract classes (tests/test_empty_inputs.py):

- PIPELINE ops must complete and return a well-formed (usually empty)
  result — a crash here is an engine defect (the r15 probe found and
  fixed two: bm25's NULL avgdl arithmetic, the shared embedding-index
  ``np.stack([])``).
- FIT / DML / STAGE ops may raise — an empty corpus is a degenerate
  fit, like sklearn's ``fit([])``.

The committed census log (EMPTYPROBE_r*.log) is the full-coverage
evidence; the pytest module executes a flagship sample each run and
pins the contract lists. Run after adding operators:

    python tools/empty_probe.py --out EMPTYPROBE_r15.log
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from desdb_spark.registry import all_operators  # noqa: E402
from desdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = open(args.out, "w") if args.out else sys.stdout

    def emit(line: str) -> None:
        print(line)
        if args.out:
            out.write(line + "\n")
            out.flush()

    spark = get_spark("empty_probe", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    ops = all_operators()
    # The contract list AND the fixture builder live next to the sampled
    # tests; importing both keeps tool and test pinned to the same
    # census over the same inputs (r15 review).
    from tests.test_empty_inputs import (
        REQUIRES_NONEMPTY_INPUT,
        build_empty_fixture,
    )

    dst = build_empty_fixture(
        spark, tempfile.mkdtemp(prefix="desdb_empty_fixture_")
    )

    emit(f"# empty-input census over {len(ops)} registered operators "
         "(zero-row fixtures; see tools/empty_probe.py)")
    unexpected_crash, unexpected_ok = [], []
    for name, op in ops.items():
        try:
            n = op.fn(spark, dst).count()
            status = f"ok    {name}: {n} rows"
            if name in REQUIRES_NONEMPTY_INPUT:
                # Not a defect — the contract permits raising, it does
                # not require it — but surface drift so the list stays
                # minimal.
                unexpected_ok.append(name)
                status += "  [listed requires-nonempty but succeeded]"
        except Exception as exc:  # noqa: BLE001 — census, not assertion
            status = (f"raise {name}: {type(exc).__name__}: "
                      f"{str(exc)[:90]}")
            if name not in REQUIRES_NONEMPTY_INPUT:
                unexpected_crash.append(name)
                status += "  [UNEXPECTED — pipeline-class op crashed]"
        emit(status)
    emit(f"summary: {len(ops) - len(unexpected_crash)} within contract; "
         f"unexpected crashes: {unexpected_crash or 'none'}; "
         f"listed-but-succeeded: {unexpected_ok or 'none'}")
    if args.out:
        out.close()
    sys.exit(1 if unexpected_crash else 0)


if __name__ == "__main__":
    main()
