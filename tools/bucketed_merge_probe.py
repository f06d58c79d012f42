"""Measure the BucketedKeyTable O(touched buckets) merge claim
(operators/bucketed.py:1-27): merge wall-time vs table size at 1x/10x,
with CLUSTERED change keys (all in one bucket — the CDC shape the
docstring promises is a small constant) vs SCATTERED keys (uniform over
buckets — the worst case, which must degrade toward O(table)).

The claim holds if clustered-merge wall time is roughly flat from 1x to
10x while the scattered merge grows with the table.

Run: python tools/bucketed_merge_probe.py   (~2-4 min, local[32])
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from qucosa_fcrepo_reportingdb_spark.operators.bucketed import (  # noqa: E402
    BucketedKeyTable,
)
from qucosa_fcrepo_reportingdb_spark.session import get_spark  # noqa: E402

N_BUCKETS = 64
BASE_ROWS = 200_000
N_CHANGES = 1_000


def _keys_df(spark, n, prefix="k"):
    return (spark.range(n)
            .select(F.concat(F.lit(prefix), F.col("id")).alias("k"),
                    F.sha2(F.concat(F.lit("v"), F.col("id")), 256)
                    .alias("v")))


def _bucket_of(spark, keys_df):
    return keys_df.withColumn(
        "b", F.pmod(F.hash(F.col("k")), F.lit(N_BUCKETS)))


def main():
    spark = get_spark("bucketed-merge-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bmp_")
    results = {}
    try:
        for scale in (1, 10):
            n = BASE_ROWS * scale
            base = _keys_df(spark, n)
            # clustered change set: N_CHANGES existing keys from ONE bucket
            clustered_keys = (_bucket_of(spark, base)
                              .filter(F.col("b") == 0)
                              .limit(N_CHANGES).select("k"))
            clustered = clustered_keys.withColumn("v", F.lit("upd"))
            # scattered: every N/N_CHANGES-th key -> uniform over buckets
            scattered = (base.withColumn(
                "rn", F.monotonically_increasing_id())
                .filter(F.col("rn") % (n // N_CHANGES) == 0)
                .select("k").withColumn("v", F.lit("upd")))
            for shape, changes in (("clustered", clustered),
                                   ("scattered", scattered)):
                changes = changes.localCheckpoint()  # exclude build cost
                times = []
                for rep in range(3):
                    path = os.path.join(root, f"t{scale}_{shape}_{rep}")
                    tab = BucketedKeyTable(spark, path, key="k",
                                           n_buckets=N_BUCKETS)
                    tab.init(base)
                    t0 = time.time()
                    touched = tab.merge(changes)
                    times.append(time.time() - t0)
                    if rep == 0:
                        results[f"{scale}x_{shape}_buckets_touched"] = \
                            len(touched)
                    shutil.rmtree(path, ignore_errors=True)
                results[f"{scale}x_{shape}_merge_sec"] = round(
                    statistics.median(times), 2)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps({"probe": "bucketed_merge_scale", "n_buckets": N_BUCKETS,
                      "base_rows": BASE_ROWS, "n_changes": N_CHANGES,
                      "results": results}))


if __name__ == "__main__":
    main()
