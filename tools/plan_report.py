"""Sweep every registry query: wall time + physical-plan statistics.

Usage:
    python tools/plan_report.py [sf_dir] [query ...]

Prints one line per query:
    name  sec  rows  exchanges  bhj  smj  cartesian  python  (flags)

Flags highlight scale smells: CARTESIAN (unbounded pair explosion outside
the sanctioned brute-force oracles), PY (Python eval in the path — expected
only for mapInPandas multimodal ops), SMJ>BHJ (a join that lost its
broadcast).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_to_redshift_with_airflow_spark.plans import REGISTRY  # noqa: E402
from s3_to_redshift_with_airflow_spark.session import build_session  # noqa: E402


def plan_stats(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": plan.count("Exchange hashpartitioning"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "cartesian": plan.count("CartesianProduct") + plan.count("BroadcastNestedLoopJoin"),
        "python": plan.count("EvalPython") + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] if len(args) > 1 else list(REGISTRY)
    spark = build_session(app_name="plan_report")

    print(f"{'query':28s} {'sec':>7s} {'rows':>8s}  exch bhj smj cart py  flags")
    for name in names:
        fn = REGISTRY[name].fn
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        sec = time.time() - t0
        s = plan_stats(df)
        flags = []
        if s["cartesian"]:
            flags.append("CARTESIAN")
        if s["python"]:
            flags.append("PY")
        if s["smj"] > s["bhj"]:
            flags.append("SMJ>BHJ")
        print(
            f"{name:28s} {sec:7.2f} {n:8d}  {s['exchanges']:4d} {s['bhj']:3d} "
            f"{s['smj']:3d} {s['cartesian']:4d} {s['python']:2d}  {' '.join(flags)}"
        )


if __name__ == "__main__":
    main()
