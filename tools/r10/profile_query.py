"""Profile one or more queries: job-level wall breakdown via event log.

Usage: python /tmp/profile_query.py <sf_dir> <name> [name...]
Prints per-job wall seconds (with job group/description when set), stage
names, and the total per query (bench-identical materialize, 1 warm at
sf0.001 + N timed runs at sf_dir, min kept).
"""
import sys, os, json, time, glob, shutil

sys.path.insert(0, "/root/repo")
EVDIR = "/tmp/sgraft-eventlog"
shutil.rmtree(EVDIR, ignore_errors=True)
os.makedirs(EVDIR)

from smfg_datawarehouse_spark.session import get_spark
from smfg_datawarehouse_spark import queries as qmod
from pyspark.sql import functions as F
from pyspark.sql.types import MapType


def materialize(df):
    cols = [
        F.col(f.name).cast("string") if isinstance(f.dataType, MapType) else F.col(f.name)
        for f in df.schema.fields
    ]
    df.select(F.bit_xor(F.xxhash64(*cols)).alias("chk")).collect()


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    repeats = int(os.environ.get("PROFILE_REPEATS", "2"))
    spark = get_spark(
        app_name="profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    qs = qmod.all_queries()
    for name in names:
        fn = qs[name]
        try:
            materialize(fn(spark, "/root/testdata/sf0.001"))  # warm
        except Exception as ex:
            print(f"warm fail {name}: {ex}")
        best, best_marks = None, None
        for rep in range(repeats):
            spark.catalog.clearCache()
            marks = []  # (t_rel, label) python-side section marks
            t0 = time.perf_counter()
            spark.sparkContext.setJobGroup(f"prof:{name}:{rep}", name)
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            materialize(df)
            t_total = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None)
            if best is None or t_total < best[0]:
                best = (t_total, t_build, rep)
        print(f"\n=== {name}: total {best[0]:.3f}s (build+actions {best[1]:.3f}s, "
              f"final materialize {best[0]-best[1]:.3f}s) kept rep {best[2]} ===")
    spark.stop()
    time.sleep(1)
    # parse event log: job timings grouped per (jobgroup)
    cands = [p for p in glob.glob(f"{EVDIR}/*") if os.path.isfile(p)] or glob.glob(f"{EVDIR}/*/events_*")
    ev = sorted(cands)[-1]
    jobs = {}
    stage_names = {}
    with open(ev) as fh:
        for line in fh:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = e.get("Event")
            if et == "SparkListenerJobStart":
                props = e.get("Properties") or {}
                grp = props.get("spark.jobGroup.id", "")
                desc = props.get("spark.job.description", "")
                jobs[e["Job ID"]] = {
                    "grp": grp, "desc": desc, "t0": e["Submission Time"],
                    "stages": [s["Stage Name"] for s in e.get("Stage Infos", [])],
                    "ntasks": sum(s.get("Number of Tasks", 0) for s in e.get("Stage Infos", [])),
                }
            elif et == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["t1"] = e["Completion Time"]
    for name in names:
        for rep in range(repeats):
            tag = f"prof:{name}:{rep}"
            sel = {jid: j for jid, j in jobs.items() if j["grp"] == tag and "t1" in j}
            if not sel:
                continue
            tot = sum(j["t1"] - j["t0"] for j in sel.values()) / 1000.0
            print(f"\n--- {name} rep {rep}: {len(sel)} jobs, sum job wall {tot:.3f}s ---")
            for jid, j in sorted(sel.items()):
                dur = (j["t1"] - j["t0"]) / 1000.0
                top = j["stages"][-1] if j["stages"] else "?"
                print(f"  job {jid:>4} {dur:7.3f}s tasks={j['ntasks']:<4} {top[:90]}")


if __name__ == "__main__":
    main()
