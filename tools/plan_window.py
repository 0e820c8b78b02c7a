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
   pass names), then the maximal fill of never-checked / oldest-vintage
   modules — a 0/1 knapsack over module sizes, oldest-preferred among
   equally-full solutions (it may pass over an oldest module whose size
   blocks a fuller combination), with an explicit short-by-N warning
   when no subset reaches 50.

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


def _pack_fills(fills: list[dict], budget: int) -> list[dict]:
    """Subset of ``fills`` maximizing filled slots within ``budget``,
    preferring the OLDEST modules among equally-full solutions (r15,
    post-review fix of the ADVICE r14 item: the previous shape greedily
    packed oldest-first and then ran subset-sum over the leftovers —
    dead code, since everything the greedy loop deferred is strictly
    larger than the final gap; sizes [4,3,2] into 5 slots returned 4/5
    when 3+2 fit exactly). 0/1 knapsack with value = size over the
    (small: ~150 modules × ≤50 slots) instance; reconstruction walks
    oldest-first and includes a module whenever an optimal completion
    exists with it, so the result is the vintage-ordered subset a
    hand-planner would pick."""
    sizes = [len(d["ops"]) for d in fills]
    n = len(fills)
    # dp[i][b] = max slots fillable from fills[i:] with budget b.
    dp = [[0] * (budget + 1) for _ in range(n + 1)]
    for i in range(n - 1, -1, -1):
        w = sizes[i]
        row, nxt = dp[i], dp[i + 1]
        for b in range(budget + 1):
            best = nxt[b]
            if w <= b:
                cand = w + nxt[b - w]
                if cand > best:
                    best = cand
            row[b] = best
    out: list[dict] = []
    b = budget
    for i in range(n):
        w = sizes[i]
        if w <= b and w + dp[i + 1][b - w] == dp[i][b]:
            out.append(fills[i])
            b -= w
    return out


def propose(
    changed: list[str], assume_current_window_round: int | None = None
) -> dict:
    """Window proposal: changed modules first (caller-ordered), then the
    MAXIMAL knapsack fill over the remaining modules (never-checked sort
    as vintage 0, so they lead the fill preference; _pack_fills may skip
    an older module whose size blocks a fuller combination); a window no
    subset can complete is reported via ``short_by`` instead of being
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
    chosen = _pack_fills(fills, WINDOW - total)
    chosen_names = {d["module"] for d in chosen}
    picked.extend(chosen)
    total += sum(len(d["ops"]) for d in chosen)
    deferred = [d["module"] for d in fills if d["module"] not in chosen_names]
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
    # Rows-only window slots carry weaker driver evidence by construction
    # (spark_rows > 0, no hash); VERDICT r15 item 3: the window artifact
    # must name each such slot's property-pin pytest so the correlation
    # is auditable in one hop, not via SURVEY §2C.
    from tools.gen_survey_status import ROWS_ONLY_EVIDENCE

    for d in prop["window"]:
        tag = f" rows-only: {d['rows_only']}" if d["rows_only"] else ""
        print(
            f"    \"{d['module']}\",  # {len(d['ops'])} ops — newest row "
            f"r{d['vintage']}{tag}"
        )
        for ro in d["rows_only"]:
            pin = ROWS_ONLY_EVIDENCE.get(ro, "MISSING — add to ROWS_ONLY_EVIDENCE")
            print(f"        # rows-only evidence: {ro} -> {pin}")
    if prop["first_deferred"]:
        print("next-oldest deferred:", ", ".join(prop["first_deferred"]))


if __name__ == "__main__":
    main()
