"""Driver-window rotation planner (r14 — SURVEY §2C keeps the rotation
auditable; this tool automates the arithmetic that was previously done
by hand each round).

The external driver hash-checks only the FIRST 50 registered operators
(registration order = ``_OP_MODULES`` in desdb_spark/registry.py), so
each round's window must be rebuilt under the standing priority
    changed-since-checked > never-checked > oldest-green
at MODULE granularity (a module's ops register together). This tool:

1. computes each op's newest driver-green round from every committed
   CORRECTNESS_r*.json (green = hash_match, or the rows-only contract:
   err == "no_oracle" with spark_rows recorded);
2. aggregates to per-module vintage (min over the module's ops);
3. proposes a window: the caller's changed modules lead (use
   ``--changed-since GIT_REF`` to detect them from the working tree, or
   pass names), then never-checked modules, then oldest-vintage fills,
   greedily packed to exactly 50 with an exact-fit completion pass.

The proposal is ADVISORY — the committed window is whatever
``_OP_MODULES`` orders and ``tests/test_registry.py::test_r*_window_pinned``
pins; this tool exists so the next round's plan starts from computed
facts instead of hand-recounted JSON.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

WINDOW = 50


def newest_green_rounds(
    root: str = _REPO_ROOT, assume_current_window_round: int | None = None
) -> dict[str, int]:
    """op name -> newest round with a green driver row (0 = never).

    ``assume_current_window_round`` previews the NEXT round: the current
    first-WINDOW registered ops are treated as holding round-N rows, as
    if the driver had already written the CORRECTNESS file for the
    currently-committed window. Threaded as an explicit parameter
    (ADVICE r14 — the previous globals() patch silently decayed under
    refactoring and ignored 0; the comparison is now against None)."""
    newest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        rows = json.load(open(f))
        for name, row in rows.items():
            green = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if green:
                newest[name] = max(newest.get(name, 0), rnd)
    if assume_current_window_round is not None:
        from desdb_spark.registry import all_operators

        for n in list(all_operators())[:WINDOW]:
            newest[n] = max(newest.get(n, 0), assume_current_window_round)
    return newest


def module_vintages(assume_current_window_round: int | None = None) -> list[dict]:
    """Per-module summary in canonical registry order."""
    from desdb_spark.registry import all_operators

    ops = all_operators()
    greens = newest_green_rounds(
        assume_current_window_round=assume_current_window_round
    )
    mods: dict[str, dict] = {}
    for name, op in ops.items():
        m = op.fn.__module__
        d = mods.setdefault(
            m, {"module": m, "ops": [], "rows_only": [], "vintage": 10**9}
        )
        d["ops"].append(name)
        if op.oracle is None:
            d["rows_only"].append(name)
        d["vintage"] = min(d["vintage"], greens.get(name, 0))
    return list(mods.values())


def _exact_fill(remaining: list[dict], gap: int) -> list[dict] | None:
    """Subset of ``remaining`` whose op counts sum to exactly ``gap``
    (ADVICE r14: a single same-size module is not always available when
    a multi-module combination fits). Subset-sum over the (small) module
    sizes, scanning oldest-first so the chosen combination is biased
    toward the oldest vintages; None when no exact combination exists."""
    reach: dict[int, list[dict]] = {0: []}
    for d in remaining:
        n = len(d["ops"])
        for s in sorted(reach, reverse=True):
            t = s + n
            if t <= gap and t not in reach:
                reach[t] = reach[s] + [d]
        if gap in reach:
            return reach[gap]
    return None


def propose(
    changed: list[str], assume_current_window_round: int | None = None
) -> dict:
    """Window proposal: changed modules first (caller-ordered), then
    never-checked (vintage 0), then oldest-vintage fills, completed to
    exactly WINDOW slots by an exact-fit subset when one exists; a
    still-short window is reported via ``short_by`` instead of being
    silently assumed complete (ADVICE r14)."""
    mods = module_vintages(assume_current_window_round)
    by_name = {d["module"]: d for d in mods}
    short = {d["module"].rsplit(".", 1)[-1]: d["module"] for d in mods}
    picked: list[dict] = []
    used: set[str] = set()
    for c in changed:
        full = by_name.get(c) or by_name.get(short.get(c, ""))
        if full is None:
            raise SystemExit(f"unknown module: {c}")
        picked.append(full)
        used.add(full["module"])
    total = sum(len(d["ops"]) for d in picked)
    if total > WINDOW:
        raise SystemExit(
            f"changed modules alone hold {total} ops > {WINDOW} — the "
            "window cannot cover them all; document the overflow as "
            "exceptions in SURVEY §2C"
        )
    fills = sorted(
        (d for d in mods if d["module"] not in used),
        key=lambda d: d["vintage"],
    )
    deferred: list[str] = []
    for d in fills:
        n = len(d["ops"])
        if total + n <= WINDOW:
            picked.append(d)
            used.add(d["module"])
            total += n
        else:
            deferred.append(d["module"])
    if total < WINDOW:
        # exact-fit completion: the oldest-biased not-yet-picked subset
        # summing to exactly the remaining gap (single module or a
        # combination — ADVICE r14).
        combo = _exact_fill(
            [d for d in fills if d["module"] not in used], WINDOW - total
        )
        for d in combo or ():
            picked.append(d)
            used.add(d["module"])
            total += len(d["ops"])
    return {
        "total": total,
        "short_by": WINDOW - total,
        "window": picked,
        "first_deferred": deferred[:10],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--changed-since",
        metavar="GIT_REF",
        help="modules whose source differs from GIT_REF lead the window",
    )
    ap.add_argument(
        "--assume-current-window-round",
        type=int,
        metavar="N",
        help="preview the NEXT round: treat the current first-50 ops as "
        "holding round-N driver rows (simulates the CORRECTNESS file the "
        "driver has not written yet)",
    )
    ap.add_argument("changed", nargs="*", help="explicit changed modules")
    args = ap.parse_args()
    changed = list(args.changed)
    if args.changed_since:
        from tools.selfcheck import _names_changed_since

        from desdb_spark.registry import all_operators

        ops = all_operators()
        changed += sorted(
            {ops[n].fn.__module__ for n in _names_changed_since(args.changed_since)}
        )
    prop = propose(changed, args.assume_current_window_round)
    print(f"proposed window: {prop['total']}/{WINDOW} ops")
    if prop["short_by"]:
        print(
            f"WARNING: window is short by {prop['short_by']} slots — no "
            "not-yet-picked module combination fits the gap exactly; "
            "hand-finish before pinning"
        )
    for d in prop["window"]:
        tag = f" rows-only: {d['rows_only']}" if d["rows_only"] else ""
        print(
            f"    \"{d['module']}\",  # {len(d['ops'])} ops — newest row "
            f"r{d['vintage']}{tag}"
        )
    if prop["first_deferred"]:
        print("next-oldest deferred:", ", ".join(prop["first_deferred"]))


if __name__ == "__main__":
    main()
