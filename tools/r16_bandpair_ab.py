"""Round-16 A/B probe (VERDICT r15 item 8): band-pair candidate
enumeration — the two-sided band self-join (shipped r15 form) vs a
one-pass bucket grouping (groupBy band key -> collect_list -> in-bucket
ordered-pair explosion, hamming verify BEFORE the distinct) vs the join
with the verify hoisted above the distinct.

Interleaved round-robin timing (the r16 measurement convention: variants
alternate pass-by-pass so JIT warm-up and external load hit each arm
equally). Signatures are memoized before timing — steady-state, the
bench convention. Prints per-arm noop-sink medians for the image-phash
and simhash64 band-pair shapes.

Run: python tools/r16_bandpair_ab.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from qucosa_fcrepo_reportingdb_spark.functions import hashing as H  # noqa: E402
from qucosa_fcrepo_reportingdb_spark.operators.dedup import (  # noqa: E402
    AFP_HAMMING_MAX,
    HAMMING_MAX,
    PHASH_HAMMING_MAX,
    SIMHASH64_BITS,
    _afp_signatures,
    _c2_pair_exprs,
    _phash_signatures,
    _simhash64_signatures,
)
from qucosa_fcrepo_reportingdb_spark.session import get_spark  # noqa: E402


def _bands(sig: DataFrame, col: str, exprs: list[str]) -> DataFrame:
    return sig.select(
        "doc_id", col,
        F.posexplode(F.array(*[F.expr(e) for e in exprs]))
        .alias("band_idx", "band_val"))


def arm_join(sig: DataFrame, col: str, exprs: list[str],
             hmax: int) -> DataFrame:
    """Shipped r15 form: two-sided self-join, dedup with first() aggs,
    verify after."""
    bands = _bands(sig, col, exprs)
    a = bands.select(F.col("doc_id").alias("d1"),
                     F.col(col).alias("p1"), "band_idx", "band_val")
    b = bands.select(F.col("doc_id").alias("d2"),
                     F.col(col).alias("p2"), "band_idx", "band_val")
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("d1") < F.col("d2"))
        .dropDuplicates(["d1", "d2"])
        .withColumn("hamming", F.expr(H.hamming("p1", "p2", "spark")))
        .filter(F.col("hamming") <= hmax)
        .select("d1", "d2", "hamming")
        .orderBy("d1", "d2")
    )


def arm_join_early_verify(sig: DataFrame, col: str, exprs: list[str],
                          hmax: int) -> DataFrame:
    """Join kept, but hamming verified per candidate BEFORE the distinct
    (hamming is functionally determined by (d1, d2), so distinct over
    (d1, d2, hamming) = distinct over (d1, d2) with first(p) removed and
    only verified rows shuffled)."""
    bands = _bands(sig, col, exprs)
    a = bands.select(F.col("doc_id").alias("d1"),
                     F.col(col).alias("p1"), "band_idx", "band_val")
    b = bands.select(F.col("doc_id").alias("d2"),
                     F.col(col).alias("p2"), "band_idx", "band_val")
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("d1") < F.col("d2"))
        .withColumn("hamming", F.expr(H.hamming("p1", "p2", "spark")))
        .filter(F.col("hamming") <= hmax)
        .select("d1", "d2", "hamming")
        .dropDuplicates()
        .orderBy("d1", "d2")
    )


def arm_onepass(sig: DataFrame, col: str, exprs: list[str],
                hmax: int) -> DataFrame:
    """One-pass bucket grouping: one shuffle of band rows, pairs
    enumerated inside each bucket (doc_ids are unique within a bucket,
    sort_array orders the member structs by doc_id, so i<j gives
    d1<d2), hamming verified before the distinct."""
    bands = _bands(sig, col, exprs).filter(
        F.col("doc_id").isNotNull() & F.col("band_val").isNotNull())
    buckets = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.sort_array(F.collect_list(F.struct(
            F.col("doc_id").alias("d"), F.col(col).alias("s")))).alias("ms"))
        .filter(F.size("ms") > 1))
    pairs = buckets.select(F.explode(F.expr(
        "flatten(transform(ms, (x, i) -> "
        "transform(slice(ms, i + 2, size(ms)), "
        "y -> struct(x.d AS d1, x.s AS p1, y.d AS d2, y.s AS p2))))"
    )).alias("p")).select("p.d1", "p.p1", "p.d2", "p.p2")
    return (
        pairs.withColumn("hamming", F.expr(H.hamming("p1", "p2", "spark")))
        .filter(F.col("hamming") <= hmax)
        .select("d1", "d2", "hamming")
        .dropDuplicates()
        .orderBy("d1", "d2")
    )


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    spark = get_spark("r16-bandpair-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    shapes = {
        "phash_bandpairs": (
            _phash_signatures(spark, sf_dir), "phash",
            _c2_pair_exprs("phash", "spark"), PHASH_HAMMING_MAX),
        "simhash64": (
            _simhash64_signatures(spark, sf_dir), "simhash",
            _c2_pair_exprs("simhash", "spark", SIMHASH64_BITS), HAMMING_MAX),
        "afp_bandpairs": (
            _afp_signatures(spark, sf_dir), "afp",
            _c2_pair_exprs("afp", "spark"), AFP_HAMMING_MAX),
    }
    arms = {"join": arm_join, "early": arm_join_early_verify,
            "onepass": arm_onepass}

    for shape, (sig, col, exprs, hmax) in shapes.items():
        # result-identity check once per shape (cheap at sf: collected
        # rows are the verified pair set)
        rows = {}
        for arm, fn in arms.items():
            rows[arm] = [tuple(r) for r in
                         fn(sig, col, exprs, hmax).collect()]
        assert rows["join"] == rows["early"] == rows["onepass"], \
            f"{shape}: arms disagree"
        print(f"{shape}: arms agree on {len(rows['join'])} pairs",
              flush=True)

        samples: dict[str, list[float]] = {a: [] for a in arms}
        for a, fn in arms.items():   # one untimed warm-up each
            noop(fn(sig, col, exprs, hmax))
        for _ in range(passes):
            for a, fn in arms.items():
                spark.sparkContext.setJobDescription(f"ab {shape}:{a}")
                t0 = time.time()
                noop(fn(sig, col, exprs, hmax))
                samples[a].append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        for a, ts in samples.items():
            print(f"{shape:18s} {a:8s} {statistics.median(ts):7.3f}s "
                  f"median of {[round(x, 3) for x in ts]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
