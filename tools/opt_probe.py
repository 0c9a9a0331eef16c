"""Round-11 optimization probe: per-query noop-sink timing + formatted plans.

Usage:
    python tools/opt_probe.py explain <out_dir> <suffix> [query ...]
        Write `<out_dir>/<query>_<suffix>.txt` with df.explain("formatted")
        for each named query (default: the bench HEADLINE list).

    python tools/opt_probe.py time <runs> [query ...]
        Time each query with the noop sink (guide §1.4): one untimed warmup
        then `runs` timed executions; prints name, best, all runs. The noop
        write computes every column of every row without the count+collect
        double execution bench.py's contract carries, so it isolates the
        computation being optimized.

Jobs are labelled (guide §1.5) so any UI/eventlog inspection maps to
queries.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_to_redshift_with_airflow_spark.plans import REGISTRY  # noqa: E402
from s3_to_redshift_with_airflow_spark.session import build_session  # noqa: E402


def _headline() -> list[str]:
    import bench

    return [n for n in bench.HEADLINE if n in REGISTRY]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="opt_probe")

    if mode == "explain":
        out_dir, suffix = sys.argv[2], sys.argv[3]
        names = sys.argv[4:] or _headline()
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            df = REGISTRY[name].fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
            print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")
    elif mode == "time":
        runs = int(sys.argv[2])
        names = sys.argv[3:] or _headline()
        # session warmup
        _noop(REGISTRY["agg_stats"].fn(spark, sf_dir))
        print(f"{'query':42s} {'best':>8s}  runs")
        for name in names:
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            t0 = time.time()
            _noop(REGISTRY[name].fn(spark, sf_dir))
            warm = time.time() - t0
            times = []
            for i in range(runs):
                spark.sparkContext.setJobDescription(f"run{i}:{name}")
                t0 = time.time()
                _noop(REGISTRY[name].fn(spark, sf_dir))
                times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            print(
                f"{name:42s} {min(times):8.3f}  {times} warm={warm:.3f}",
                flush=True,
            )
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
