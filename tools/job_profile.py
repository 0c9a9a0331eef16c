"""Round-12 probe: per-JOB breakdown of a registry row via the Spark
event log (guide §1.1/§1.5 — where does the wall-clock go when a row is
dominated by many small jobs rather than one big stage?).

Usage:
    python tools/job_profile.py <query> [<query> ...]

Runs each query ONCE warm (one untimed warmup execution first), with the
event log enabled, then parses the log and prints every job of the timed
execution: start offset, duration, #tasks, #stages, and the job
description/callsite — the fixed per-job overhead (scheduling, commit,
py4j round-trips) is visible as wall-clock not covered by task time.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_to_redshift_with_airflow_spark.plans import REGISTRY  # noqa: E402
from s3_to_redshift_with_airflow_spark.session import build_session  # noqa: E402

EVDIR = "/tmp/r12_eventlog"


def _execute(spark, name, sf_dir):
    fn = REGISTRY[name].fn
    df = fn(spark, sf_dir)
    n = df.count()
    if n <= 100_000:
        df.collect()


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = build_session(
        app_name="job_profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    _execute(spark, "agg_stats", sf_dir)  # session warmup
    marks = {}
    for name in names:
        _execute(spark, name, sf_dir)  # per-query warmup (untimed)
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"TIMED:{name}")
        _execute(spark, name, sf_dir)
        spark.sparkContext.setJobDescription(None)
        marks[name] = (t0 * 1000, time.time() * 1000)
        print(f"{name}: timed execution {(marks[name][1] - marks[name][0]) / 1000:.3f}s")
    spark.stop()

    ev = [os.path.join(EVDIR, f) for f in os.listdir(EVDIR) if not f.startswith(".")][0]
    if os.path.isdir(ev):  # rolling event-log dir (eventlog_v2_*)
        parts = sorted(
            os.path.join(ev, f)
            for f in os.listdir(ev)
            if f.startswith("events_") or f.startswith("eventLog")
        )
    else:
        parts = [ev]
    jobs = {}
    stage_tasks = {}
    lines_iter = (line for p in parts for line in open(p))
    if True:
        for line in lines_iter:
            e = json.loads(line)
            ev = e["Event"]
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                props = e.get("Properties") or {}
                jobs[jid] = {
                    "start": e["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "callsite": props.get("callSite.short", ""),
                    "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                    "ntasks_planned": sum(
                        s["Number of Tasks"] for s in e["Stage Infos"]
                    ),
                }
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["end"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stage_tasks[si["Stage ID"]] = si["Number of Tasks"]

    for name, (t0, t1) in marks.items():
        sel = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if "end" in j and j["start"] >= t0 - 50 and j["start"] <= t1 + 50
        ]
        total_job = sum(j["end"] - j["start"] for _, j in sel)
        print(f"\n=== {name}: {len(sel)} jobs, sum(job wall) "
              f"{total_job / 1000:.3f}s of {(t1 - t0) / 1000:.3f}s elapsed; "
              f"gaps (driver-side) {(t1 - t0 - total_job) / 1000:.3f}s ===")
        prev_end = t0
        for jid, j in sel:
            ntasks = sum(stage_tasks.get(s, 0) for s in j["stages"])
            gap = (j["start"] - prev_end) / 1000
            prev_end = j["end"]
            print(
                f"  job {jid:4d} +{(j['start'] - t0) / 1000:7.3f}s "
                f"dur {(j['end'] - j['start']) / 1000:7.3f}s gapbefore {gap:6.3f}s "
                f"tasks {ntasks:4d} [{j['desc'][:60]}] {j['callsite'][:50]}"
            )


if __name__ == "__main__":
    main()
