"""Semantic decontamination scaling probe (SCALING.md round 11).

Question: decontaminate_embedding is a broadcast of the suite + ONE
corpus scan + one aggregate — does its wall actually grow linearly in
the corpus at a FIXED benchmark-sized suite (the deployment shape:
eval suites change by release, corpora grow by ingest)?

The registry operator's hash-sample suite stand-in scales WITH the
corpus (fine at test SFs, quadratic-ish within cells at probe scales),
so the probe drives the frame seam (semantic_screen_frame) directly
with a fixed 5k-vector suite — exactly what the streaming twin does
with its accumulated suite-state table.

Corpus: deterministic synthetic embeddings (dim 32, 64 cells) from pure
functions of vec_id. Run: python tools/semantic_scale_probe.py
(~2-4 min, local[32]); SPARK_GRAFT_SEM_SCALES to override.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from qucosa_fcrepo_reportingdb_spark.operators.corpus import (  # noqa: E402
    semantic_screen_frame,
)
from qucosa_fcrepo_reportingdb_spark.operators.dedup import (  # noqa: E402
    normed_embedding_frame,
)
from qucosa_fcrepo_reportingdb_spark.session import get_spark  # noqa: E402

SCALES = [int(s) for s in os.environ.get(
    "SPARK_GRAFT_SEM_SCALES", "100000,1000000,4000000").split(",")]
SUITE_N = 5000      # fixed benchmark size, every scale
DIM = 32
N_CELLS = 64


def synth(spark, n):
    return (spark.range(0, n, 1, 32).selectExpr(
        "id AS vec_id",
        f"transform(sequence(1, {DIM}), d -> "
        f"CAST(CAST(pmod(hash(id * 31 + d), 1000) AS DOUBLE) / 1000.0 "
        f"- 0.5 AS FLOAT)) AS embedding",
        f"CAST(pmod(hash(id), {N_CELLS}) AS INT) AS label"))


def main():
    spark = get_spark("semantic-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in SCALES:
        frame = normed_embedding_frame(synth(spark, n)).withColumn(
            "is_suite", F.col("vec_id") < SUITE_N)
        t0 = time.time()
        out = semantic_screen_frame(frame)
        n_rows = out.count()
        cold = time.time() - t0
        n_flagged = out.filter("contaminated").count()
        steadies = []
        for _ in range(3):
            t0 = time.time()
            semantic_screen_frame(frame).count()
            steadies.append(time.time() - t0)
        steady = sorted(steadies)[1]
        print(f"{n:9d} corpus vecs (suite {SUITE_N}): "
              f"cold {cold:6.2f}s steady {steady:6.2f}s "
              f"screened={n_rows} flagged={n_flagged}", flush=True)


if __name__ == "__main__":
    main()
