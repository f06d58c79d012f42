"""Measure rewrite amplification of the FULL pipeline cycle against
BucketedTableStore tables of growing size (SCALING.md "Bucketed merge"
section, round-3 e2e variant).

For each table size N (fixed ~1000-row bucket budget, how a deployment
sizes buckets to a byte target): seed oai_header with N pending headers
and reporting_documents with N existing docs, snapshot every file under
the store root, run ONE real pipeline cycle (OAI harvest page -> merge,
enrich batch of 100 -> METS extract -> reporting merge -> conditional
delete), and report bytes in files that were created or changed. The
O(touched buckets) claim holds iff rewritten bytes stay flat while N
grows 40x.

Run: python tools/bucketed_pipeline_probe.py   (~2-5 min, local[32])
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from pyspark.sql import functions as F  # noqa: E402

from qucosa_fcrepo_reportingdb_spark import schemas  # noqa: E402
from qucosa_fcrepo_reportingdb_spark.operators.bucketed import (  # noqa: E402
    pipeline_store,
)
from qucosa_fcrepo_reportingdb_spark.pipeline import ReportingPipeline  # noqa: E402
from qucosa_fcrepo_reportingdb_spark.session import get_spark  # noqa: E402
from qucosa_fcrepo_reportingdb_spark.sources.oai import fixture_fetcher  # noqa: E402
from tests import fixtures_oai as fx  # noqa: E402

SIZES = [100_000, 1_000_000, 4_000_000]
BUCKET_ROWS = 1000          # per-bucket row budget
BATCH = 100                 # enrichment batch size (S4 reference LIMIT)


def seed(spark, store, n_rows: int) -> None:
    base = datetime(2015, 1, 1)
    headers = spark.range(n_rows).select(
        F.concat(F.lit("oai:example.org:qucosa:seed"), F.col("id"))
        .alias("record_identifier"),
        F.lit(base).alias("datestamp"),
        F.lit(None).cast("array<string>").alias("set_spec"),
        F.lit(False).alias("status_is_deleted"),
    )
    store.overwrite("oai_header", headers)
    docs = spark.range(n_rows).select(
        F.concat(F.lit("oai:example.org:qucosa:seed"), F.col("id"))
        .alias("record_identifier"),
        F.lit("SLUB").alias("mandator"),
        F.lit("issue").alias("document_type"),
        F.lit(base).alias("distribution_date"),
        F.lit(base).alias("header_last_modified"),
    )
    store.overwrite("reporting_documents", docs)


def snapshot(root: str) -> dict[str, tuple[int, float]]:
    out = {}
    for d, _, files in os.walk(root):
        for f in files:
            p = os.path.join(d, f)
            out[p] = (os.path.getsize(p), os.path.getmtime(p))
    return out


def main() -> None:
    spark = get_spark("bucketed-probe",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for n_rows in SIZES:
        root = tempfile.mkdtemp(prefix="bucketed_probe_")
        store = pipeline_store(spark, os.path.join(root, "tables"),
                               n_buckets=max(n_rows // BUCKET_ROWS, 1))
        seed(spark, store, n_rows)
        table_bytes = sum(s for s, _ in snapshot(root).values())

        pipe = ReportingPipeline(
            spark, store,
            oai_fetch=fixture_fetcher([fx.LIST_IDENTIFIERS]),
            mets_fetch=lambda rid: fx.mets_document(
                "SLUB", "issue", "2008-08-04"),
            batch_size=BATCH)
        before = snapshot(root)
        t0 = time.time()
        stats = pipe.run_until_idle(max_cycles=1)
        cycle_s = time.time() - t0
        after = snapshot(root)

        changed = {p: sz for p, (sz, mt) in after.items()
                   if before.get(p) != (sz, mt)}
        rewritten = sum(changed.values())
        results.append({
            "table_rows": n_rows,
            "buckets": max(n_rows // BUCKET_ROWS, 1),
            "table_mb": round(table_bytes / 1e6, 2),
            "rewritten_mb": round(rewritten / 1e6, 2),
            "rewritten_pct": round(100 * rewritten / table_bytes, 2),
            "changed_files": len(changed),
            "cycle_s": round(cycle_s, 2),
            "pipeline_stats": stats,
        })
        print(json.dumps(results[-1]), flush=True)
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"probe": "bucketed_pipeline_e2e", "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
