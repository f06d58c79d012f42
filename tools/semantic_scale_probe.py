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


def probe_centroids(frame):
    """(label, c, cnrm) cell centroids for the synthetic corpus — plain
    double mean (the probe measures walls and frontiers, not oracle
    parity, so the split-integer exact mean is not needed here)."""
    return (
        frame.select("label",
                     F.posexplode(F.col("v")).alias("dim", "x"))
        .groupBy("label", "dim").agg(F.avg("x").alias("cv"))
        .groupBy("label")
        .agg(F.expr("transform(array_sort(collect_list(struct(dim, cv)))"
                    ", s -> s.cv)").alias("c"))
        .selectExpr("label", "c",
                    "sqrt(aggregate(transform(c, x -> x * x), "
                    "CAST(0 AS DOUBLE), (acc, x) -> acc + x)) AS cnrm"))


def recall_vs_k(spark, n, truth_sample):
    """The recall/cost frontier at probe scale (SCALING.md round 12,
    VERDICT r11 item 8): per probe count k — candidate volume from the
    suite's top-k cell expansion (exact, from cell histograms) and the
    screen's recall measured against an exact brute-force baseline on a
    ``truth_sample``-sized corpus sample (the audit-samples-at-scale
    convention: the full 1M x 5k exact screen is 5B pairs — the thing
    the frontier exists to avoid). Also times the deployable screen at
    k in {1, SEMANTIC_PROBE_K, n_cells} so the frontier carries
    measured walls, not just candidate counts."""
    from qucosa_fcrepo_reportingdb_spark.operators.corpus import (
        SEMANTIC_COSINE_THRESHOLD,
        SEMANTIC_PROBE_K,
        _suite_cell_ranks,
        _suite_probe_expansion,
    )
    frame = normed_embedding_frame(synth(spark, n)).withColumn(
        "is_suite", F.col("vec_id") < SUITE_N).persist()
    suite = frame.filter("is_suite")
    corpus = frame.filter("NOT is_suite")
    cents = probe_centroids(frame).persist()
    ranks = _suite_cell_ranks(suite, cents).persist()
    ranks.count()

    # exact candidate volume per k from cell histograms (no pair space)
    counts = {r["label"]: r["cnt"] for r in
              corpus.groupBy("label").agg(
                  F.count(F.lit(1)).alias("cnt")).collect()}
    rk_rows = ranks.select("s_label", "rk").collect()
    n_corpus = sum(counts.values())
    exact_pairs = n_corpus * SUITE_N

    # truth on a deterministic corpus sample: brute-force vs full suite
    sample = corpus.filter(
        f"pmod(hash(vec_id * 131), {max(1, n // truth_sample)}) = 0")
    n_sample = sample.count()
    suite_b = suite.select(F.col("vec_id").alias("s_vec"),
                           F.col("v").alias("sv"),
                           F.col("nrm").alias("snrm"))
    dot = ("aggregate(zip_with(v, sv, (x, y) -> x * y), "
           "CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
    true_pairs = (
        sample.crossJoin(F.broadcast(suite_b))
        .filter((F.expr(dot) / (F.col("nrm") * F.col("snrm")))
                >= SEMANTIC_COSINE_THRESHOLD)
        .select("vec_id", "label", "s_vec"))
    first_k = (
        true_pairs.join(
            F.broadcast(ranks.select("s_vec", "s_label", "rk")),
            (true_pairs["s_vec"] == ranks["s_vec"])
            & (true_pairs["label"] == ranks["s_label"]))
        .groupBy(true_pairs["vec_id"])
        .agg(F.min("rk").alias("first_k")))
    fk = sorted(r["first_k"] for r in first_k.collect())
    n_true = len(fk)

    print(f"recall-vs-k at {n} corpus vecs (suite {SUITE_N}, "
          f"{N_CELLS} cells; truth on {n_sample}-vec sample, "
          f"n_true={n_true}):", flush=True)
    import bisect
    for k in (1, 2, 4, 8, 16, 32, 48, 64):
        cand = sum(counts.get(r["s_label"], 0) for r in rk_rows
                   if r["rk"] <= k)
        caught = bisect.bisect_right(fk, k)
        print(f"  k={k:2d} recall={caught / max(1, n_true):.3f} "
              f"cand={cand} ({cand / exact_pairs:.3f} of exact)",
              flush=True)

    # Walls must FORCE the verdict columns: a bare count() over the
    # roll-up lets Catalyst prune every cosine (the unreferenced-agg
    # column-pruning rule) and times a hollow plan — measured 0.4 s
    # "wall" vs 10.4 s real at 1M/k=1. filter(contaminated) references
    # n_hits, so the dot products actually run. (The round-11 scale row
    # timed the hollow plan; SCALING.md round 12 records the correction.)
    # k = n_cells (the exact screen) is measured at a 10x-smaller corpus
    # and extrapolated: its candidate volume is the full pair space and
    # the point of the frontier is not to run it at scale.
    for k, tag, kn in ((1, "single", n), (SEMANTIC_PROBE_K, "probe_k", n),
                       (N_CELLS, "all-cells(exact)", n // 10)):
        kframe = frame
        if kn != n:
            kframe = (normed_embedding_frame(synth(spark, kn))
                      .withColumn("is_suite", F.col("vec_id") < SUITE_N))
        exp = _suite_probe_expansion(
            kframe.filter("is_suite") if kn != n else suite,
            cents if kn == n else probe_centroids(kframe), k)
        walls = []
        for _ in range(2):
            t0 = time.time()
            semantic_screen_frame(kframe, suite=exp) \
                .filter("contaminated").count()
            walls.append(time.time() - t0)
        note = "" if kn == n else f" (measured at {kn} vecs)"
        print(f"  screen wall k={k:2d} ({tag}): cold {walls[0]:6.2f}s "
              f"steady {walls[1]:6.2f}s{note}", flush=True)
    frame.unpersist(); cents.unpersist(); ranks.unpersist()


def main():
    spark = get_spark("semantic-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rk_n = int(os.environ.get("SPARK_GRAFT_SEM_RECALLK_N", "1000000"))
    if rk_n:
        recall_vs_k(spark, rk_n,
                    int(os.environ.get("SPARK_GRAFT_SEM_TRUTH", "50000")))
    for n in SCALES:
        frame = normed_embedding_frame(synth(spark, n)).withColumn(
            "is_suite", F.col("vec_id") < SUITE_N)
        # filter(contaminated) forces the cosine work — a bare count()
        # over the roll-up times a hollow column-pruned plan (the
        # round-11 row did; see recall_vs_k's note + SCALING.md r12)
        t0 = time.time()
        n_flagged = semantic_screen_frame(frame) \
            .filter("contaminated").count()
        cold = time.time() - t0
        n_rows = semantic_screen_frame(frame).count()
        steadies = []
        for _ in range(3):
            t0 = time.time()
            semantic_screen_frame(frame).filter("contaminated").count()
            steadies.append(time.time() - t0)
        steady = sorted(steadies)[1]
        print(f"{n:9d} corpus vecs (suite {SUITE_N}): "
              f"cold {cold:6.2f}s steady {steady:6.2f}s "
              f"screened={n_rows} flagged={n_flagged}", flush=True)


if __name__ == "__main__":
    main()
