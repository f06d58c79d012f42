"""A/B probe: parallelism-floor configs vs current session defaults.

Runs a subset of bench queries twice in separate sessions — (A) current
get_spark() config, (B) same + lowered byte-floors:
  spark.sql.files.openCostInBytes           4MB   -> 256KB  (scan splits)
  spark.sql.adaptive.coalescePartitions.minPartitionSize 1MB -> 64KB
Prints per-query medians (noop sink, 3 passes after 1 warm-up) for each
arm. Order A,B then B,A on a second invocation to control order effects.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from qucosa_fcrepo_reportingdb_spark.memo import clear_session_memo  # noqa: E402

NAMES = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "dedup_embedding_cosine", "dedup_minhash_lsh", "sessionize_events",
    "multimodal_decode_stats", "tfidf_top_terms", "ann_ivf_pq_topk",
]
PASSES = 3


def build_session(floors: bool) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (SparkSession.builder.master(f"local[{cpus}]")
         .appName("r15-conf-ab")
         .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.autoBroadcastJoinThreshold",
                 str(64 * 1024 * 1024)))
    if floors:
        b = (b.config("spark.sql.files.openCostInBytes", str(256 * 1024))
             .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                     str(64 * 1024)))
    return b.getOrCreate()


def run_arm(label: str, floors: bool, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod
    queries = entrymod.queries()
    spark = build_session(floors)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {}
    for name in NAMES:
        fn = queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(PASSES):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        out[name] = statistics.median(ts)
        print(f"[{label}] {name:36s} {out[name]:7.3f}s", flush=True)
    clear_session_memo(spark)
    spark.stop()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    order = sys.argv[2] if len(sys.argv) > 2 else "AB"
    arms = {}
    for tag in order:
        floors = tag == "B"
        arms[tag] = run_arm(tag, floors, sf_dir)
    if len(arms) == 2:
        print("\nname, A(current), B(floors), B/A")
        for n in NAMES:
            a, b = arms["A"][n], arms["B"][n]
            print(f"{n:36s} {a:7.3f} {b:7.3f} {b / a:5.2f}")


if __name__ == "__main__":
    main()
