"""Measured parquet data-skipping from the Z-order layout (the write-side
half of "push down and prune"): write the SAME lineitem rows three ways —
as-loaded, linearly sorted on ONE key, and Z-ordered on TWO keys — then run
selective point/range filters on BOTH keys against each layout and read the
scan's actual `numOutputRows` from the executed plan's metrics (rows
surviving parquet row-group/page pruning + the filter, i.e. what the
executor really materialized).

The expected physics this report verifies with numbers:
  * linear sort on l_partkey skips near-perfectly for l_partkey predicates
    and NOT AT ALL for l_suppkey predicates (the second key is random
    within every file);
  * the Z-order layout skips well on BOTH keys — the whole point of
    interleaving — at a modest cost vs the single-key sort on its own key.

Rows-materialized is layout- and engine-version-dependent (row-group sizes,
page indexes), so this stays a measurement TOOL + PERF.md note, not an
oracle; the zorder_layout key itself is exact-oracled (zorder_layout).

Usage: python tools/zorder_skipping_report.py [sf_dir]
Emits one JSON line per (layout, predicate).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from s3_to_redshift_with_airflow_spark.operators.layout import (  # noqa: E402
    zorder_layout,
)
from s3_to_redshift_with_airflow_spark.session import build_session  # noqa: E402

ZCOLS = ["l_partkey", "l_suppkey"]


def scan_rows(df) -> int:
    """numOutputRows of the leaf scan after full execution — the rows the
    executor actually materialized post row-group/page pruning."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()

    def walk(node):
        name = node.nodeName()
        if "Scan" in name:
            m = node.metrics()
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    return kv._2().value()
        for i in range(node.children().size()):
            got = walk(node.children().apply(i))
            if got is not None:
                return got
        return None

    return walk(plan)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="zorder_skipping")
    # page/column indexes need vectorized reader + filter pushdown (defaults,
    # pinned here so the measurement is explicit)
    spark.conf.set("spark.sql.parquet.filterPushdown", "true")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    total = li.count()
    pk = li.agg(F.max("l_partkey")).collect()[0][0]
    sk = li.agg(F.max("l_suppkey")).collect()[0][0]
    # selective predicates on each Z column: a narrow range (~1% of the
    # key space) — the shape a point lookup / small dimension probe has
    preds = {
        "partkey_range": F.col("l_partkey") <= int(pk * 0.01),
        "suppkey_range": F.col("l_suppkey") <= int(sk * 0.01),
    }
    base = tempfile.mkdtemp(prefix="zorder_skip_")
    layouts = {}
    li.repartition(16).write.parquet(f"{base}/unsorted")
    layouts["unsorted"] = f"{base}/unsorted"
    li.repartitionByRange(16, F.col("l_partkey")).sortWithinPartitions(
        "l_partkey"
    ).write.parquet(f"{base}/linear_partkey")
    layouts["linear_partkey"] = f"{base}/linear_partkey"
    zorder_layout(li, ZCOLS, num_files=16).drop("zkey").write.parquet(
        f"{base}/zorder"
    )
    layouts["zorder"] = f"{base}/zorder"

    for layout, path in layouts.items():
        for pname, pred in preds.items():
            df = spark.read.parquet(path).filter(pred)
            n_sel = df.count()
            materialized = scan_rows(spark.read.parquet(path).filter(pred))
            print(
                json.dumps(
                    {
                        "family": "zorder_skipping",
                        "layout": layout,
                        "predicate": pname,
                        "total_rows": total,
                        "selected_rows": n_sel,
                        "scan_materialized_rows": materialized,
                        "skip_ratio": round(1 - materialized / total, 4)
                        if materialized is not None
                        else None,
                    }
                ),
                flush=True,
            )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
