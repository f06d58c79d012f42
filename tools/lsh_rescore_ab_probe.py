"""Rescore-variant A/B at a candidate-volume-dominant shape (SCALING.md
round-14 receipt): the angle-keyed screen's exact-cosine rescore as the
shipped zip_with fold vs the rejected allocation-free index fold,
interleaved order-controlled reps on one session.

The shape matters: at sf0.1 the screen wall is compile/overhead-
dominated (88k scored rows -> the dot costs milliseconds) and the two
variants are indistinguishable-to-misleading; at this synthetic's
0.32-collision-floor candidate volume (~95M scored rows at the default
scale) the fold is >90% of the wall and the variants separate cleanly
(zip_with 1.25-1.6x faster, dim 64 and 32 -- HOF lambdas are
interpreted, so per-element lambda-tree depth beats avoiding one small
array allocation).

Round 15 adds the opt-in Arrow rescore twin (_lsh_rescore_arrow,
bit-identical by order-preserving accumulation) as a third variant:
unlike signing, the candidate seam ships BOTH arrays per candidate
pair across Arrow, so the transfer competes with the fold it
replaces — this probe records which side wins at the dominant shape.

Run: python tools/lsh_rescore_ab_probe.py (~12 min, local[32]);
SPARK_GRAFT_AB_N / _DIM to override (dim 32 reproduces the second
measured point); SPARK_GRAFT_AB_VARIANTS to pick a subset."""
import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from qucosa_fcrepo_reportingdb_spark.session import get_spark
from qucosa_fcrepo_reportingdb_spark.operators.corpus import (
    SEMANTIC_COSINE_THRESHOLD, _lsh_band_frame, _lsh_rescore_arrow,
    _lsh_sign_frame, _NO_CANDIDATE,
)
from qucosa_fcrepo_reportingdb_spark.operators.dedup import (
    normed_embedding_frame,
)

N = int(os.environ.get("SPARK_GRAFT_AB_N", "60000"))
DIM = int(os.environ.get("SPARK_GRAFT_AB_DIM", "64"))
SUITE_N, N_CELLS = 5_000, 64
spark = get_spark("lsh-rescore-ab")
spark.sparkContext.setLogLevel("ERROR")
frame = normed_embedding_frame(spark.range(0, N, 1, 32).selectExpr(
    "id AS vec_id",
    f"transform(sequence(1, {DIM}), d -> "
    f"CAST(CAST(pmod(hash(id * 31 + d), 1000) AS DOUBLE) / 1000.0 "
    f"- 0.5 AS FLOAT)) AS embedding",
    f"CAST(pmod(hash(id), {N_CELLS}) AS INT) AS label")).withColumn(
    "is_suite", F.col("vec_id") < SUITE_N)
signed = _lsh_sign_frame(spark, frame, DIM)
corpus = signed.filter("NOT is_suite").persist()
suite = signed.filter("is_suite")
corpus.count()

DOTS = {
    "allocfree": (f"aggregate(sequence(1, {DIM}), CAST(0 AS DOUBLE), "
                  "(acc, i) -> acc + element_at(v, i) * element_at(sv, i))"),
    "zip_with": ("aggregate(zip_with(v, sv, (x, y) -> x * y), "
                 "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"),
}

def screen(variant):
    sb = (_lsh_band_frame(suite)
          .select(F.col("vec_id").alias("s_vec"), F.col("v").alias("sv"),
                  F.col("nrm").alias("snrm"), "band_id", "band_val"))
    cb = _lsh_band_frame(corpus)
    cand = cb.join(F.broadcast(sb), ["band_id", "band_val"], "left")
    if variant == "arrow":
        scored = _lsh_rescore_arrow(cand)
    else:
        scored = cand.select(
            "vec_id", "s_vec",
            F.when(F.col("snrm").isNotNull(),
                   F.expr(DOTS[variant])
                   / (F.col("nrm") * F.col("snrm")))
            .alias("cosine"))
    hit = F.col("cosine") >= SEMANTIC_COSINE_THRESHOLD
    return (scored.groupBy("vec_id")
            .agg(F.countDistinct(F.when(hit, F.col("s_vec")))
                 .cast("long").alias("n_hits"),
                 F.coalesce(F.max("cosine"), F.lit(_NO_CANDIDATE))
                 .alias("max_cosine"))
            .filter("n_hits >= 1").count())

VARIANTS = tuple(os.environ.get(
    "SPARK_GRAFT_AB_VARIANTS", "allocfree,zip_with,arrow").split(","))
# interleave: A B C A B C (after one warm each) to cancel drift
for d in VARIANTS:
    screen(d)
for rep in range(2):
    for d in VARIANTS:
        t0 = time.time(); nf = screen(d)
        print(f"rep{rep} {d}: {time.time()-t0:7.2f}s flagged={nf}",
              flush=True)
spark.stop()
print("DONE")
