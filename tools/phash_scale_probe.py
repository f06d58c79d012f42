"""Image-phash dedup scaling probe (SCALING.md round-7 section).

Question: dedup_image_phash is a decode+hash scan (Python, scan-local)
feeding a 14-bit band self-join — how do the cold (signature build) and
steady (join-only, signatures memoized) walls grow with corpus size?

Corpus: doc_id ranges extended 1x -> 10x (the synthetic image generator
is a pure function of doc_id, so a bigger id range IS a bigger corpus;
designed near-dup pairs stay one per 4-doc block — linear). Expected:
cold grows ~linearly (decode is embarrassingly parallel scan work),
steady stays near-flat until the band join's candidate volume
(~3/doc, measured) dominates.

Run: python tools/phash_scale_probe.py   (~2-3 min, local[32])
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qucosa_fcrepo_reportingdb_spark.operators.dedup import (  # noqa: E402
    dedup_image_phash,
)
from qucosa_fcrepo_reportingdb_spark.session import get_spark  # noqa: E402

SCALES = [1, 10]
BASE_DOCS = 5000      # sf0.1-sized


def main():
    spark = get_spark("phash-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="phash_probe_")
    try:
        for s in SCALES:
            d = os.path.join(root, f"x{s}")
            (spark.range(0, BASE_DOCS * s)
             .selectExpr("id AS doc_id", "'x' AS text", "'en' AS lang",
                         "'synth' AS source", "CAST(1 AS BIGINT) AS n_chars")
             .repartition(32)
             .write.mode("overwrite")
             .parquet(os.path.join(d, "documents.parquet")))
            t0 = time.time()
            n = dedup_image_phash(spark, d).count()
            cold = time.time() - t0
            steadies = []
            for _ in range(3):
                t0 = time.time()
                dedup_image_phash(spark, d).count()
                steadies.append(time.time() - t0)
            steady = sorted(steadies)[1]
            print(f"{s:3d}x ({BASE_DOCS * s} docs): cold {cold:6.2f}s  "
                  f"steady {steady:5.2f}s  pairs={n}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
