"""Per-batch cost of delta-ingest embedding dedup as the existing corpus
grows (SCALING.md round-10; the semantic-side twin of
incremental_dedup_probe).

Question: with the existing corpus's normed vectors PERSISTED (the
deployment steady state), what does one incoming vector batch cost as
the corpus grows 1x -> 4x -> 16x?

Method: corpus = sf0.1 embeddings replicated with id offsets (vectors
unchanged -> real cosine hits at every scale, and every replica lands in
its original IVF cell so cell DENSITY grows with the corpus); batch = a
fixed 500 vectors with ids above every corpus id, flagged incoming. The
existing side is localCheckpointed once per scale (standing in for the
persisted artifact); each measurement runs the salted label-block join +
cosine verify end-to-end.

Expected shape: per-batch work is O(batch x cell density) — the blocked
join never touches existing x existing, so cost grows with the MATCHED
cell volume (linear in replicas here, since replicas densify cells),
not with corpus^2; wall should grow well below the 16x corpus growth.

Run: python tools/embedding_incremental_probe.py   (~2-4 min, local[32])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from qucosa_fcrepo_reportingdb_spark.operators.dedup import (  # noqa: E402
    COSINE_SALT,
    COSINE_THRESHOLD,
    _DOT,
)
from qucosa_fcrepo_reportingdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH_ROWS = 500
REPLICAS = [1, 4, 16]


def _normed(df):
    return df.selectExpr(
        "vec_id", "label",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS v",
    ).selectExpr(
        "vec_id", "label", "v",
        "sqrt(aggregate(transform(v, x -> x * x), CAST(0 AS DOUBLE), "
        "(acc, x) -> acc + x)) AS nrm",
    ).filter("nrm > 0")


def main():
    spark = get_spark("embedding-incremental-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")) \
        .select("vec_id", "label", "embedding")
    base_n = emb.count()

    batch = (emb.filter(F.col("vec_id") < BATCH_ROWS)
             .select((F.col("vec_id") + 100_000_000).alias("vec_id"),
                     "label", "embedding"))
    batch_n = (_normed(batch.repartition(32, "vec_id"))
               .localCheckpoint())

    print(f"# corpus base={base_n} vectors, batch={BATCH_ROWS} vectors")
    for r in REPLICAS:
        corpus = emb
        for i in range(1, r):
            corpus = corpus.union(emb.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                "label", "embedding"))
        t0 = time.time()
        corpus_n = (_normed(corpus.repartition(32, "vec_id"))
                    .localCheckpoint())
        build_s = time.time() - t0

        times, pairs = [], 0
        for _ in range(3):
            t0 = time.time()
            a = batch_n.withColumn(
                "salt",
                F.pmod(F.hash("vec_id"), F.lit(COSINE_SALT))).alias("a")
            b = (corpus_n.withColumn(
                "salt", F.explode(F.sequence(F.lit(0),
                                             F.lit(COSINE_SALT - 1))))
                 .alias("b"))
            pairs = (
                a.hint("shuffle_hash")
                .join(b, (F.col("a.label") == F.col("b.label"))
                      & (F.col("a.salt") == F.col("b.salt")))
                .select((F.expr(_DOT)
                         / (F.col("a.nrm") * F.col("b.nrm")))
                        .alias("cosine"))
                .filter(F.col("cosine") >= COSINE_THRESHOLD)
                .count())
            times.append(time.time() - t0)
        steady = sorted(times)[1]
        print(f"{r:3d}x ({base_n * r:7d} vectors): corpus build "
              f"{build_s:6.2f}s  batch-dedup steady {steady:5.2f}s  "
              f"hits={pairs}", flush=True)


if __name__ == "__main__":
    main()
