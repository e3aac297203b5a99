#!/usr/bin/env python
"""Per-query profiler: wall time, job/stage counts, and task-time budget.

For each named registry entry, runs the plan to the noop sink (guide §1.4)
after one warm-up pass, then reports, from the Spark status API:
  - wall seconds (best of N)
  - number of jobs and stages the query ran
  - sum of task times vs wall*cores (utilization: low => stage-barrier /
    driver-orchestration bound, not compute bound)
  - shuffle read/write bytes
Usage: python scripts/profile_query.py [--sf DIR] [-n 2] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("-n", type=int, default=2, help="timed repetitions")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from exness_data_preprocess_spark import get_spark
    from exness_data_preprocess_spark.plans.registry import QUERIES

    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    import urllib.request

    ui_base = None
    try:
        ui_base = sc.uiWebUrl  # e.g. http://host:4040
        app_id = sc.applicationId
    except Exception:
        pass

    def _rest_stages():
        """stageId -> (executorRunTimeMs, shuffleReadBytes,
        shuffleWriteBytes, numCompleteTasks) from the UI REST API."""
        out = {}
        if not ui_base:
            return out
        url = f"{ui_base}/api/v1/applications/{app_id}/stages?status=complete"
        try:
            with urllib.request.urlopen(url, timeout=10) as fh:
                for s in json.load(fh):
                    out[s["stageId"]] = (
                        s.get("executorRunTime", 0),
                        s.get("shuffleReadBytes", 0),
                        s.get("shuffleWriteBytes", 0),
                        s.get("numCompleteTasks", 0),
                    )
        except Exception:
            pass
        return out
    out = {}
    for name in args.queries:
        spec = QUERIES[name]
        if not args.no_warm:
            spec.spark(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        best = None
        for rep in range(args.n):
            spark.catalog.clearCache()
            # unique group per repetition: getJobIdsForGroup(name)
            # accumulates across reps otherwise, inflating n_jobs /
            # task_time by the rep count
            group = f"{name}#{rep}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            spec.spark(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.time() - t0
            sc.setJobGroup(None, None)
            job_ids = list(tracker.getJobIdsForGroup(group) or [])
            stage_ids = set()
            for j in job_ids:
                ji = tracker.getJobInfo(j)
                if ji:
                    stage_ids.update(ji.stageIds)
            # stage metrics via the UI REST API (statusStore's py4j
            # signature churns across Spark versions)
            task_ms = 0
            shuffle_read = 0
            shuffle_write = 0
            n_tasks = 0
            n_stages = 0
            for sid, (ert, srb, swb, nct) in _rest_stages().items():
                if sid in stage_ids:
                    n_stages += 1
                    n_tasks += nct
                    task_ms += ert
                    shuffle_read += srb
                    shuffle_write += swb
            rec = {
                "wall_s": round(wall, 3),
                "n_jobs": len(job_ids),
                "n_stages": n_stages,
                "n_tasks": n_tasks,
                "task_time_s": round(task_ms / 1000.0, 2),
                "util_of_32": round(task_ms / 1000.0 / max(wall, 1e-9) / 32, 3),
                "shuffle_read_mb": round(shuffle_read / 1e6, 2),
                "shuffle_write_mb": round(shuffle_write / 1e6, 2),
            }
            if best is None or rec["wall_s"] < best["wall_s"]:
                best = rec
        out[name] = best
        print(name, json.dumps(best), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
