"""Per-batch cost of delta-ingest MinHash dedup as the existing corpus
grows (SCALING.md round-5-late section).

Question: with the existing corpus's band signatures PERSISTED (the
deployment steady state — each doc's signatures were computed at its own
ingest), what does one incoming batch cost as the corpus grows 1x -> 4x
-> 16x?

Expected shape: the incoming side is constant work (shingle + sign +
verify); the join probes the persisted signature table with the SMALL
side broadcast, so the corpus contributes one map-side scan — no corpus
shuffle, no signature recompute. Cost should grow well below linearly in
wall time while the corpus grows 16x (scan-rate-bound, amortized by
parallel splits); the number to watch is batch seconds vs corpus rows.

Method: corpus = sf0.1 documents replicated with id offsets (text
unchanged -> real duplicate hits at every scale); batch = a fixed 500
docs with ids above every corpus id. Existing bands are built once and
localCheckpointed (standing in for the persisted artifact), then each
measurement runs band-join + exact-Jaccard verify end-to-end.

Run: python tools/incremental_dedup_probe.py   (~2-4 min, local[32])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from qucosa_fcrepo_reportingdb_spark.operators.dedup import (  # noqa: E402
    band_signatures,
    join_shingles_onto_pairs,
    shingled_docs,
    verified_jaccard_pairs,
)
from qucosa_fcrepo_reportingdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH_ROWS = 500
REPLICAS = [1, 4, 16]


def main():
    spark = get_spark("incremental-dedup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
        .select("doc_id", "text")
    base_n = docs.count()

    # fixed incoming batch: ids far above every replicated corpus id
    batch = (docs.filter(F.col("doc_id") < BATCH_ROWS)
             .select((F.col("doc_id") + 100_000_000).alias("doc_id"), "text"))
    batch_sh = shingled_docs(batch.repartition(32, "doc_id"),
                             non_empty=True).localCheckpoint()
    batch_bands = band_signatures(batch_sh).localCheckpoint()

    print(f"# corpus base={base_n} rows, batch={BATCH_ROWS} rows")
    for r in REPLICAS:
        corpus = docs
        for i in range(1, r):
            corpus = corpus.union(docs.select(
                (F.col("doc_id") + i * 1_000_000).alias("doc_id"), "text"))
        corpus_sh = shingled_docs(corpus.repartition(32, "doc_id"),
                                  non_empty=True).localCheckpoint()
        t0 = time.time()
        corpus_bands = band_signatures(corpus_sh).localCheckpoint()
        build_s = time.time() - t0

        # steady state: persisted corpus bands, one batch arrives
        times = []
        for _ in range(3):
            t0 = time.time()
            cand = (
                batch_bands.select(F.col("doc_id").alias("d1"),
                                   "band_idx", "signature")
                .join(corpus_bands.select(F.col("doc_id").alias("d2"),
                                          "band_idx", "signature"),
                      ["band_idx", "signature"])
                .select("d1", "d2")
                .dropDuplicates(["d1", "d2"])
            )
            sh_all = batch_sh.union(corpus_sh)
            n_pairs = verified_jaccard_pairs(
                join_shingles_onto_pairs(cand, sh_all)).count()
            times.append(time.time() - t0)
        med = sorted(times)[1]
        print(f"corpus={base_n * r:>7} rows  one-time band build={build_s:5.1f}s"
              f"  per-batch={med:5.2f}s  (passes={[round(x, 2) for x in times]},"
              f" dup pairs={n_pairs})")


if __name__ == "__main__":
    main()
