"""Capture .explain('formatted') for named queries into plans/r10/.

Usage: python /tmp/capture_plans.py before|after <name> [name...]
Lifecycle queries run their protocol during fn() — the captured plan is
the RETURNED DataFrame's plan (what the driver materializes).
"""
import sys, os, io
sys.path.insert(0, "/root/repo")
from contextlib import redirect_stdout
from smfg_datawarehouse_spark.session import get_spark
from smfg_datawarehouse_spark import queries as qmod

suffix = sys.argv[1]
names = sys.argv[2:]
outdir = "/root/repo/plans/r10"
os.makedirs(outdir, exist_ok=True)
spark = get_spark(app_name="plan-capture")
qs = qmod.all_queries()
for name in names:
    df = qs[name](spark, "/root/testdata/sf0.1")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(f"{outdir}/{name}_{suffix}.txt", "w") as fh:
        fh.write(buf.getvalue())
    print("wrote", f"{outdir}/{name}_{suffix}.txt")
