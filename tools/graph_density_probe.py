"""Dup-graph density probe: how do the pair build, connected components,
and pagerank loops behave when the duplicate GRAPH gets ~133x denser at
the same corpus scale-up?

Construction (same as the round-6 ad-hoc probe this makes repeatable):
REPLICAS exact copies of every sf0.1 document under fresh doc_ids —
every doc with shingles becomes a REPLICAS-clique, so pairs grow
quadratically in REPLICAS while docs grow linearly (4 replicas of the
6k-doc sf0.1 corpus: 256 -> ~34k verified pairs, "133x density").
Compares the 1x and Nx walls for the three graph stages, steady-state
(one warm session; each stage timed on its first call, consuming the
session-memoized upstream artifact exactly as a registry sweep does).

Usage: python tools/graph_density_probe.py [sf_dir] [replicas]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from qucosa_fcrepo_reportingdb_spark.session import get_spark  # noqa: E402
from qucosa_fcrepo_reportingdb_spark.operators import corpus  # noqa: E402
from qucosa_fcrepo_reportingdb_spark.operators.dedup import (  # noqa: E402
    jaccard_pair_table,
)

ID_STRIDE = 10_000_000


def build_corpus(spark, src_dir: str, out_dir: str, replicas: int) -> None:
    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    out = None
    for k in range(replicas):
        rep = docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(k * ID_STRIDE)).cast("long"))
        out = rep if out is None else out.unionByName(rep)
    out.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet"))


def probe(spark, sf_dir: str) -> dict:
    """Time each stage on its first call with its upstream artifact
    already memoized — the pair build number is the SHARED handoff
    table (jaccard_pair_table) every graph stage consumes, so the CC and
    pagerank walls measure their own loops, not a lazy pair re-build."""
    timings = {}
    t0 = time.time()
    n_pairs = jaccard_pair_table(spark, sf_dir).count()
    timings["pair_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    n_nodes = corpus.dedup_connected_components(spark, sf_dir).count()
    timings["cc_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    corpus.pagerank_dup_graph(spark, sf_dir).count()
    timings["pagerank_sec"] = round(time.time() - t0, 2)
    timings["verified_pairs"] = n_pairs
    timings["clustered_nodes"] = n_nodes
    return timings


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("graph-density-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()   # session warmup

    base = probe(spark, src)
    print("1x:", json.dumps(base))

    tmp = tempfile.mkdtemp(prefix="graft_density_")
    try:
        build_corpus(spark, src, tmp, replicas)
        dense = probe(spark, tmp)
        print(f"{replicas}x:", json.dumps(dense))
        print(json.dumps({
            "replicas": replicas,
            "pair_growth": round(
                dense["verified_pairs"] / max(base["verified_pairs"], 1), 1),
            "cc_wall_ratio": round(
                dense["cc_sec"] / max(base["cc_sec"], 1e-9), 2),
            "pagerank_wall_ratio": round(
                dense["pagerank_sec"] / max(base["pagerank_sec"], 1e-9), 2),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
