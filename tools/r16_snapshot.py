"""Round-16 optimization evidence tool: per-query formatted plans +
noop-sink timings (guide §1.4 — time the computation, not the sink).

Usage:
  python tools/r16_snapshot.py <sf_dir> <tag> [names]

Writes plans/r16/<name>_<tag>.txt (the .explain("formatted") output) and
prints one timing line per query: median of PASSES noop-sink runs after
one warm-up. `names` is a comma list, or the literals `headline` /
`tier2` / `headline+tier2` (bench.py's sets). The bench itself keeps its
historical .count() action — this tool exists so before/after evidence
for the optimization round measures full-column computation in
isolation, labeled per job (guide §1.5).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qucosa_fcrepo_reportingdb_spark.session import get_spark  # noqa: E402

PASSES = int(os.environ.get("SPARK_GRAFT_SNAPSHOT_PASSES", "3"))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"
    sel = sys.argv[3] if len(sys.argv) > 3 else "headline+tier2"

    import bench
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    if sel in ("headline", "tier2", "headline+tier2"):
        names = []
        if "headline" in sel:
            names += bench.HEADLINE
        if "tier2" in sel:
            names += bench.TIER2
    else:
        names = [n for n in sel.split(",") if n]

    spark = get_spark("r16-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r16")
    os.makedirs(outdir, exist_ok=True)

    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up

    for name in names:
        fn = queries[name]
        df = fn(spark, sf_dir)
        # formatted plan (pre-execution; AQE initial plan)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        spark.sparkContext.setJobDescription(f"r16 {tag}: {name}")
        try:
            t0 = time.time()
            noop(fn(spark, sf_dir))
            warm = time.time() - t0
            ts = []
            for _ in range(PASSES):
                t0 = time.time()
                noop(fn(spark, sf_dir))
                ts.append(time.time() - t0)
            print(f"{name:44s} {statistics.median(ts):7.3f}s "
                  f"median of {[round(x, 3) for x in ts]} "
                  f"(warm {warm:.3f}s)", flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
