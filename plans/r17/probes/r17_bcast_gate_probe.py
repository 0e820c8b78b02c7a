"""r17 broadcast-gate probe (session 4, the ADVICE r16 forced-broadcast
class): run a representative subset of the newly gated ops under the
default cap (hint kept at fixture scale) and under
DESDB_MAX_BROADCAST_BYTES=0 (hint dropped -> planner's choice), and show
(a) the result rows are IDENTICAL either way (the gate is a pure planner
directive) and (b) the join strategy actually moves (BroadcastHashJoin
count drops when the hint is gone).

Usage:  python r17_bcast_gate_probe.py            # default cap
        DESDB_MAX_BROADCAST_BYTES=0 python r17_bcast_gate_probe.py
Diff the two outputs: PLAN lines may differ, RESULT lines must not.
"""
import hashlib
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from desdb_spark.session import get_spark  # noqa: E402
from desdb_spark.registry import all_operators  # noqa: E402

OPS = [
    "join_multiway_star",
    "join_broadcast_dim",
    "join_lineage_walk",
    "agg_supplier_cnt_q16",
    "quality_constraint_audit",
    "events_funnel_ordered",
    "text_bigram_interp_logprob",
    "text_collocation_lift_topk",
    "emb_bitext_mine_margin",
    "source_merge_upsert",
    "source_delete_vectors_read",
    "source_wap_publish",
    "stream_static_enrich",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    # At fixture scale the planner AUTO-broadcasts the tiny build sides
    # even without the hint, so the gate's fallback is invisible in the
    # plan. DESDB_PROBE_NO_AUTOBC=1 disables auto-broadcast: gated sites
    # then show the planner's shuffle join while still-forced hints
    # (nation/region) stay BroadcastHashJoin — the at-scale shape.
    extra = (
        {"spark.sql.autoBroadcastJoinThreshold": "-1"}
        if os.environ.get("DESDB_PROBE_NO_AUTOBC")
        else None
    )
    spark = get_spark("bcast-gate-probe", shuffle_partitions=8, extra_conf=extra)
    if extra:
        for k, v in extra.items():
            spark.conf.set(k, v)
    cap = os.environ.get("DESDB_MAX_BROADCAST_BYTES", "<default>")
    print(f"cap={cap} sf={SF_DIR} no_autobc={bool(extra)}")
    for name in OPS:
        fn = all_operators()[name].fn
        df = fn(spark, SF_DIR)
        rows = sorted(repr(r) for r in df.collect())
        digest = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        shj = plan.count("ShuffledHashJoin")
        bnl = plan.count("BroadcastNestedLoopJoin")
        print(f"RESULT {name}: n={len(rows)} sha={digest}")
        print(f"PLAN   {name}: bhj={bhj} smj={smj} shj={shj} bnl={bnl}")
    spark.stop()


if __name__ == "__main__":
    main()
