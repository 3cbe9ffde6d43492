"""Capture explain('formatted') + warm timings for chosen keys.

Usage: python capture_plans.py <suffix> key1 key2 ...   (or 'ALL' for headline set)
Writes /root/repo/plans/r15/<key>_<suffix>.txt and prints warm timings.
"""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from docker_aktin_dwh_spark.registry import build_registry
from docker_aktin_dwh_spark.session import build_session
from pyspark.sql import functions as F
import pandas as pd

suffix = sys.argv[1]
keys = sys.argv[2:]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = build_session(app_name="plancap")
registry = build_registry()
if keys == ["ALL"]:
    import bench
    keys = list(bench.HEADLINE)

registry["jn_01"].fn(spark, sf).count()
@F.pandas_udf("double")
def _warm(x: pd.Series) -> pd.Series:
    return x
spark.range(1000).repartition(32).select(_warm(F.col("id").cast("double"))).count()

os.makedirs("/root/repo/plans/r15", exist_ok=True)
out = {}
for key in keys:
    fn = registry[key].fn
    runs = []
    for i in range(3):
        t0 = time.perf_counter()
        df = fn(spark, sf)
        df.count()
        runs.append(time.perf_counter() - t0)
    # plan of the last build (cheap: _explainString, no execution)
    try:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    except Exception:
        import io, contextlib
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    with open(f"/root/repo/plans/r15/{key}_{suffix}.txt", "w") as f:
        f.write(plan)
    runs.sort()
    out[key] = {"med": round(runs[1], 3), "min": round(runs[0], 3),
                "max": round(runs[2], 3)}
    print(f"{key:16s} med={runs[1]:7.3f} min={runs[0]:7.3f} max={runs[2]:7.3f}",
          flush=True)
print(json.dumps(out))
spark.stop()
