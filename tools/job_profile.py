#!/usr/bin/env python
"""Attribute flagship-pipeline wall time to executor work vs driver-serial
cost (planning, DAG scheduling, job gaps).

Runs annotate_pages warm, then times one pass while a JVM SparkListener
records per-job wall and summed task time.  Wall − Σ(job wall) = inter-job
driver gaps (Catalyst + Python round-trips); Σ(job wall) − Σ(task time)/cores
≈ in-job scheduling slack.  Decides whether the bench-scale pipeline is
executor-bound (optimize operators) or driver-bound (merge jobs, shrink
plans).

Usage: python tools/job_profile.py [cores] [n_pages]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from tabbyld_spark.session import get_spark
from tabbyld_spark.fixtures.kg import build_kg
from tabbyld_spark.fixtures.pages import gen_pages_df
from tabbyld_spark.plans.pipeline import annotate_pages


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 12000
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark(
        f"jobprof-{cores}", cores=cores, shuffle_partitions=parts,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    kg = build_kg(seed=42)
    pages = gen_pages_df(spark, kg, n_pages=n_pages, seed=42, partitions=parts).persist()
    pages.count()
    kgs = kg.to_spark(spark)
    annotate_pages(pages, kgs, fuzzy_enabled=True).triples.count()  # warm

    tracker = sc.statusTracker()
    before_ids = set(tracker.getJobIdsForGroup() or [])
    t0 = time.time()
    res = annotate_pages(pages, kgs, fuzzy_enabled=True)
    n_triples = res.triples.count()
    wall = time.time() - t0

    # JVM-side job data via the AppStatusStore (no listener plumbing needed)
    store = sc._jsc.sc().statusStore()
    jobs = []
    it = store.jobsList(None)
    for i in range(it.size()):
        j = it.apply(i)
        jid = j.jobId()
        if jid in before_ids:
            continue
        sub = j.submissionTime()
        comp = j.completionTime()
        if sub.isEmpty() or comp.isEmpty():
            continue
        sub_ms = sub.get().getTime()
        comp_ms = comp.get().getTime()
        try:
            nm = j.name()[:80]
        except Exception:
            nm = ""
        jobs.append({"id": jid, "sub": sub_ms, "dur": (comp_ms - sub_ms) / 1000.0,
                     "tasks": j.numCompletedTasks(), "name": nm})
    jobs.sort(key=lambda x: x["sub"])
    n_jobs = len(jobs)
    sum_job_wall = sum(j["dur"] for j in jobs)
    sum_tasks = sum(j["tasks"] for j in jobs)

    # Per-stage task metrics via the UI REST API (spark.ui.enabled=true for
    # this diagnostic session only): localizes WHERE executor seconds go
    # (CPU vs GC vs shuffle/spill) and whether concurrent task lanes inflate
    # per-task time (memory-bandwidth / GC / spill contention) vs merely
    # idle (stragglers, too-few tasks).
    import urllib.request
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    min_sub = min((j["sub"] for j in jobs), default=0)
    stages = []
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
        raw = json.load(r)
    for s in raw:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        import datetime
        if sub:
            sub_ms = datetime.datetime.strptime(
                sub.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
            ).timestamp() * 1000
            if sub_ms < min_sub:
                continue
        stages.append({
            "stage": s["stageId"],
            "tasks": s["numCompleteTasks"],
            "run_s": round(s["executorRunTime"] / 1000.0, 2),
            "cpu_s": round(s["executorCpuTime"] / 1e9, 2),
            "gc_s": round(s.get("jvmGcTime", 0) / 1000.0, 2),
            "spill_mb": round((s["memoryBytesSpilled"] + s["diskBytesSpilled"]) / 1e6, 1),
            "sh_r_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 1),
            "sh_w_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 1),
            "in_mb": round(s["inputBytes"] / 1e6, 1),
            "name": s["name"][:70],
        })
    tot_run = sum(x["run_s"] for x in stages)
    tot_cpu = sum(x["cpu_s"] for x in stages)
    tot_gc = sum(x["gc_s"] for x in stages)
    tot_spill = sum(x["spill_mb"] for x in stages)

    print(json.dumps({
        "cores": cores, "n_pages": n_pages, "n_triples": n_triples,
        "wall_sec": round(wall, 2),
        "n_jobs": n_jobs,
        "sum_job_wall_sec": round(sum_job_wall, 2),
        "inter_job_gap_sec": round(wall - sum_job_wall, 2),
        "n_tasks": sum_tasks,
        "sum_task_run_sec": round(tot_run, 2),
        "sum_task_cpu_sec": round(tot_cpu, 2),
        "sum_gc_sec": round(tot_gc, 2),
        "sum_spill_mb": round(tot_spill, 1),
        "utilization": round(tot_run / (wall * cores), 3) if wall else 0,
        "top_jobs": [
            {"id": j["id"], "dur": round(j["dur"], 2), "tasks": j["tasks"], "name": j["name"]}
            for j in sorted(jobs, key=lambda x: -x["dur"])[:12]
        ],
        "top_stages": sorted(stages, key=lambda x: -x["run_s"])[:16],
    }))


if __name__ == "__main__":
    main()
