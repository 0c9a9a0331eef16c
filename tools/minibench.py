"""Re-time a subset of bench.py's headline rows with bench.py's EXACT
methodology (count + collect<=100k, per-query untimed warmup, best of 3)
— for before/after comparison of a targeted optimization without paying
the full 84-query run.

Usage: python tools/minibench.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from s3_to_redshift_with_airflow_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = build_session(app_name="minibench")
    bench._execute_once(spark, "agg_stats", sf_dir)
    out = {}
    for name in names:
        warm, runs = bench.run_query(spark, name, sf_dir)
        out[name] = {"best": min(runs), "runs": runs, "warmup": warm}
        print(f"{name:46s} best={min(runs):7.3f} runs={runs} warm={warm:.3f}",
              flush=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
