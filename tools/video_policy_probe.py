"""band_blocking_policy at the measured video crossover (round 11).

tools/phash_scale_probe.py measured the video walls (solo, 64 GB, fresh
session per scale); this probe runs the ACTUATOR on the same synthetic
corpora and prints each family's decision row, so SCALING.md can show
the policy trips to 'band_pairs' on the correct side of the measured
flip — the same closed-loop check r10 ran for image/audio.

Run one scale per process (fresh session, like the wall probe):
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SIG_SCALES=100 \
      python tools/video_policy_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qucosa_fcrepo_reportingdb_spark.operators.dedup import (  # noqa: E402
    band_blocking_policy,
)
from qucosa_fcrepo_reportingdb_spark.session import get_spark  # noqa: E402

SCALES = [int(s) for s in os.environ.get(
    "SPARK_GRAFT_SIG_SCALES", "100").split(",")]
BASE_DOCS = 5000


def main():
    spark = get_spark("video-policy-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="policy_probe_")
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
            rows = band_blocking_policy(spark, d).collect()
            dt = time.time() - t0
            for r in sorted(rows, key=lambda r: r["family"]):
                print(f"{s:3d}x ({BASE_DOCS * s} docs) "
                      f"{r['family']:16s} single_ppu="
                      f"{r['single_pairs_per_unit']:.2f} pairs_ppu="
                      f"{r['pairs_pairs_per_unit']:.2f} "
                      f"action={r['action']} ({dt:.1f}s)", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
