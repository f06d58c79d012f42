"""Pairs-stage executor-scaling probe (SCALING.md round-8 section).

Question: the 100x curation-chain probe showed the PAIRS stage is the
chain's saturator (81.6% of the 100x wall, growth exponent e=1.0) —
linear in data, so the 100 TB argument needs the other axis measured:
does the stage's wall actually DIVIDE across executors, or is there a
hidden serialization point (driver collect, single hot partition, one
giant bucket)? A stage that is linear in data AND inverse-linear in
cores is cluster-safe; linear in data with flat core-scaling is a wall.

Method, two measurements over the same replicated corpus (the chain
probe's suffix-replica construction — true pairs scale linearly,
replicas share no shingles):

1. CORE SCALING — run the full pairs stage (tokenize -> shingle ->
   df-capped inverted index -> s-keyed self-join -> groupBy pair ->
   jaccard filter; jaccard_pair_table, memo cleared) in a FRESH JVM at
   local[8], local[16], local[32] and compare walls. Fresh subprocess
   per core count: Spark pins shuffle.partitions and the thread pool at
   session build, and a reused JVM's warmed code cache would flatter
   later runs.
2. PARTITION BALANCE — inside each worker, the per-partition row
   histogram of the s-keyed join output (spark_partition_id AFTER the
   exchange, before the pair aggregation): max/mean near 1 means no hot
   partition serializes the stage; AQE's coalescing/skew-split is left
   on, so this is the balance the executed plan actually had.

Interpretation: ideal core scaling halves wall per doubling (ratio
0.5); real local-mode runs share one memory bus and page cache, so
~0.6-0.75 per doubling is healthy — the signal this probe exists to
rule out is a ratio near 1.0 (serialized) or a balance max/mean >> 1
(one bucket owns the stage).

Run: python tools/pairs_scaling_probe.py
(~4-6 min at the default 10x / 8,16,32 cores on a 32-cpu host;
SPARK_GRAFT_PAIRS_REPLICAS / SPARK_GRAFT_PAIRS_CORES override.)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_REPLICAS = int(os.environ.get("SPARK_GRAFT_PAIRS_REPLICAS", "10"))
CORES = [int(c) for c in os.environ.get(
    "SPARK_GRAFT_PAIRS_CORES", "8,16,32").split(",")]


def worker(cores: int, corpus_dir: str) -> None:
    """One fresh-JVM measurement: pairs-stage wall + partition balance."""
    from pyspark.sql import functions as F

    from qucosa_fcrepo_reportingdb_spark.operators.dedup import (
        df_capped_candidate_pairs,
        jaccard_pair_table,
    )
    from qucosa_fcrepo_reportingdb_spark.session import get_spark

    spark = get_spark(f"pairs-probe-{cores}", cpus=cores)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    n_pairs = jaccard_pair_table(spark, corpus_dir).count()
    wall = time.time() - t0
    # Balance of the s-keyed join output as actually executed (reuses
    # the memoized inverted index, so this re-runs ONLY the join).
    hist = (
        df_capped_candidate_pairs(spark, corpus_dir)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count()
        .agg(F.count("pid").alias("parts"),
             F.max("count").alias("max_rows"),
             F.avg("count").alias("mean_rows"))
        .collect()[0]
    )
    print(json.dumps({
        "cores": cores, "wall_s": round(wall, 2), "n_pairs": n_pairs,
        "parts": hist["parts"], "max_rows": int(hist["max_rows"]),
        "mean_rows": round(float(hist["mean_rows"]), 1),
        "balance": round(hist["max_rows"] / hist["mean_rows"], 2),
    }), flush=True)
    spark.stop()


def main() -> None:
    from qucosa_fcrepo_reportingdb_spark.session import get_spark
    from tools.curation_chain_probe import build_corpus

    spark = get_spark("pairs-probe-build")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    root = tempfile.mkdtemp(prefix="pairs_probe_")
    try:
        d = os.path.join(root, f"x{N_REPLICAS}")
        rows = build_corpus(spark, base, N_REPLICAS, d)
        print(f"corpus: {rows} docs ({N_REPLICAS}x {SF_DIR})", flush=True)
        spark.stop()          # free the JVM before the measured workers
        results = []
        for c in CORES:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", str(c), d],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            r = json.loads(line)
            results.append(r)
            print(f"  local[{r['cores']:2d}]: {r['wall_s']:7.2f}s  "
                  f"pairs={r['n_pairs']}  join parts={r['parts']} "
                  f"max/mean={r['balance']}", flush=True)
        pairs = {r["n_pairs"] for r in results}
        assert len(pairs) == 1, f"pair counts diverged across runs: {pairs}"
        print("\ncore-doubling wall ratios (0.5 ideal, ~1.0 = serialized):")
        for lo, hi in zip(results, results[1:]):
            ratio = hi["wall_s"] / lo["wall_s"]
            print(f"  {lo['cores']} -> {hi['cores']} cores: "
                  f"{ratio:.2f}", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
    else:
        main()
