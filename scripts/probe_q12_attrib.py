"""q12 internal-recompute attribution probe (VERDICT r15 directive 1).

Question: across duplicate_clusters' CC rounds, how many times do the
minhash signature/candidate/verify stages actually EXECUTE? The edge
list feeds `connected_components`, which builds
`sym = edges.union(edges.reversed)` — the edge pipeline appears TWICE
in that union's lineage, and only AQE's runtime stage reuse could
dedupe it.

Method: Spark UI REST API (`/api/v1/applications/<id>/stages`) with the
UI enabled; snapshot the stage list around each phase and diff —
COMPLETE stages ran, SKIPPED stages were reused from a prior shuffle.

Phases:
  A. edges: minhash_near_duplicates(...).select(src,dst)
     .localCheckpoint() — ONE full candidate+verify pass, materialized.
  B. cc_on_ckpt: connected_components(checkpointed edges) — the CC
     rounds alone (what bench's _q12_phases times).
  C. full_q12: duplicate_clusters(docs) exactly as the bench runs it —
     fresh lineage, so any recompute of the edge pipeline shows here
     as extra COMPLETE stages / task time vs (A + B).

Usage: python scripts/probe_q12_attrib.py [sf_dir] [out_json]
"""
import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else None


def rest(app_url, path):
    with urllib.request.urlopen(app_url + path, timeout=10) as r:
        return json.loads(r.read())


def stage_snapshot(app_url):
    stages = rest(app_url, "/stages?status=complete&status=skipped")
    return {(s["stageId"], s["attemptId"]): s for s in stages}


def diff(before, after):
    new = [s for k, s in after.items() if k not in before]
    complete = [s for s in new if s["status"] == "COMPLETE"]
    skipped = [s for s in new if s["status"] == "SKIPPED"]
    return {
        "n_stages_complete": len(complete),
        "n_stages_skipped": len(skipped),
        "task_time_sec": round(
            sum(s.get("executorRunTime", 0) for s in complete) / 1000.0, 3),
        "n_tasks": sum(s.get("numCompleteTasks", 0) for s in complete),
        "stage_names": sorted(set(s["name"].split(" at ")[0]
                                  for s in complete)),
    }


def main():
    from pyspark.sql import functions as F

    from aresdb_spark.operators.dedup import (connected_components,
                                              duplicate_clusters,
                                              minhash_near_duplicates)
    from aresdb_spark.session import get_spark

    spark = get_spark(app_name="probe-q12",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    app_url = f"{ui}/api/v1/applications/{app_id}"

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = {"sf_dir": SF_DIR, "phases": {}}

    def phase(name, fn):
        before = stage_snapshot(app_url)
        t0 = time.perf_counter()
        r = fn()
        wall = time.perf_counter() - t0
        after = stage_snapshot(app_url)
        d = diff(before, after)
        d["wall_sec"] = round(wall, 3)
        d["result"] = r
        out["phases"][name] = d
        print(f"[{name}] wall={wall:.3f}s stages="
              f"{d['n_stages_complete']}C/{d['n_stages_skipped']}S "
              f"task_time={d['task_time_sec']}s tasks={d['n_tasks']}",
              flush=True)
        return r

    # warmup: one full candidate pass so JIT/codegen/scan-cache effects
    # don't pollute phase A vs C comparison
    spark.sparkContext.setJobDescription("warmup")
    minhash_near_duplicates(docs, threshold=0.5).count()

    spark.sparkContext.setJobDescription("phase A: edges materialized")
    edges_holder = {}

    def phase_a():
        e = (minhash_near_duplicates(docs, threshold=0.5)
             .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
             .localCheckpoint())
        edges_holder["e"] = e
        return e.count()

    phase("A_edges_ckpt", phase_a)

    spark.sparkContext.setJobDescription("phase B: CC on checkpointed edges")
    phase("B_cc_on_ckpt",
          lambda: connected_components(edges_holder["e"]).count())

    spark.sparkContext.setJobDescription("phase C: full q12 (bench shape)")
    phase("C_full_q12", lambda: duplicate_clusters(docs, threshold=0.5)
          .groupBy().agg(F.count_distinct("cluster_id").alias("n"))
          .collect()[0]["n"])

    # second full pass: steady-state (bench times passes after a warmup)
    phase("C2_full_q12", lambda: duplicate_clusters(docs, threshold=0.5)
          .groupBy().agg(F.count_distinct("cluster_id").alias("n"))
          .collect()[0]["n"])

    a, b, c = (out["phases"]["A_edges_ckpt"], out["phases"]["B_cc_on_ckpt"],
               out["phases"]["C2_full_q12"])
    out["attribution"] = {
        "wall_A_plus_B": round(a["wall_sec"] + b["wall_sec"], 3),
        "wall_C": c["wall_sec"],
        "excess_wall_sec": round(c["wall_sec"] - a["wall_sec"]
                                 - b["wall_sec"], 3),
        "task_time_A_plus_B": round(a["task_time_sec"]
                                    + b["task_time_sec"], 3),
        "task_time_C": c["task_time_sec"],
        "excess_task_time_sec": round(c["task_time_sec"] - a["task_time_sec"]
                                      - b["task_time_sec"], 3),
    }
    print(json.dumps(out["attribution"], indent=2))
    if OUT:
        with open(OUT, "w") as f:
            json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
