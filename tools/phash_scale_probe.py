"""Banded-signature dedup scaling probe (SCALING.md rounds 7-8).

Question: dedup_image_phash and dedup_audio_fingerprint are one
decode+sign scan (Python, scan-local) feeding a 14-bit band self-join —
how do the cold (signature build) and steady (join-only, signatures
memoized) walls grow with corpus size, per family?

Corpus: doc_id ranges extended 1x -> 10x (both synthetic generators are
pure functions of doc_id, so a bigger id range IS a bigger corpus;
designed near-dup pairs stay one per 4-doc block — linear). Expected:
cold grows ~linearly (decode is embarrassingly parallel scan work),
steady stays near-flat until the band join's candidate volume
(~3/doc measured for phash, ~2.7/doc for afp) dominates.

Run: python tools/phash_scale_probe.py   (~3-5 min, local[32])
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qucosa_fcrepo_reportingdb_spark.operators.dedup import (  # noqa: E402
    dedup_audio_fingerprint,
    dedup_image_phash,
    dedup_video_fingerprint,
)
from qucosa_fcrepo_reportingdb_spark.session import get_spark  # noqa: E402

SCALES = [int(s) for s in os.environ.get(
    "SPARK_GRAFT_SIG_SCALES", "1,10").split(",")]
BASE_DOCS = 5000      # sf0.1-sized
from qucosa_fcrepo_reportingdb_spark.operators.dedup import (  # noqa: E402
    dedup_audio_fingerprint_bandpairs,
    dedup_image_phash_bandpairs,
    dedup_video_fingerprint_bandpairs,
)

_ALL_FAMILIES = {"image_phash": dedup_image_phash,
                 "audio_afp": dedup_audio_fingerprint,
                 "video_vfh": dedup_video_fingerprint,
                 "image_phash_c2": dedup_image_phash_bandpairs,
                 "audio_afp_c2": dedup_audio_fingerprint_bandpairs,
                 "video_vfh_c2": dedup_video_fingerprint_bandpairs}
FAMILIES = [(k, _ALL_FAMILIES[k]) for k in os.environ.get(
    "SPARK_GRAFT_SIG_FAMILIES", "image_phash,audio_afp").split(",")]


def main():
    spark = get_spark("signature-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="sig_probe_")
    try:
        for s in SCALES:
            d = os.path.join(root, f"x{s}")
            (spark.range(0, BASE_DOCS * s)
             .selectExpr("id AS doc_id", "'x' AS text", "'en' AS lang",
                         "'synth' AS source", "CAST(1 AS BIGINT) AS n_chars")
             .repartition(32)
             .write.mode("overwrite")
             .parquet(os.path.join(d, "documents.parquet")))
            for fam, op in FAMILIES:
                t0 = time.time()
                n = op(spark, d).count()
                cold = time.time() - t0
                steadies = []
                for _ in range(3):
                    t0 = time.time()
                    op(spark, d).count()
                    steadies.append(time.time() - t0)
                steady = sorted(steadies)[1]
                print(f"{fam:12s} {s:3d}x ({BASE_DOCS * s} docs): "
                      f"cold {cold:6.2f}s  steady {steady:5.2f}s  "
                      f"pairs={n}", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
