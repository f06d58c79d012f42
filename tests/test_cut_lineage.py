"""cut_lineage: the central materialization primitive — localCheckpoint
on a plain session, reliable checkpoint() when the SparkContext has a
checkpoint directory configured (the one-switch cluster upgrade)."""

import subprocess
import sys


def test_cut_lineage_local_mode_truncates_lineage(spark):
    from pyspark.sql import functions as F

    from qucosa_fcrepo_reportingdb_spark.memo import cut_lineage

    df = spark.range(100).withColumn("x", F.col("id") * 2)
    cut = cut_lineage(df)
    assert cut.count() == 100
    # lineage is gone: the physical plan reads materialized blocks,
    # not the range source
    plan = cut._jdf.queryExecution().executedPlan().toString()
    assert "Range (" not in plan


def test_cut_lineage_upgrades_to_reliable_checkpoint(tmp_path):
    """With setCheckpointDir configured, cut_lineage must write RELIABLE
    checkpoint files under the dir. Isolated in a subprocess: the
    checkpoint dir is SparkContext-global and cannot be unset, so
    setting it on the shared test session would silently flip every
    later test to disk checkpoints."""
    code = f"""
import os, sys
sys.path.insert(0, "/root/repo")
from qucosa_fcrepo_reportingdb_spark.session import get_spark
from qucosa_fcrepo_reportingdb_spark.memo import cut_lineage
spark = get_spark("cut-lineage-reliable", cpus=4)
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.setCheckpointDir({str(tmp_path / "ckpt")!r})
df = cut_lineage(spark.range(50))
assert df.count() == 50
found = []
for root, dirs, files in os.walk({str(tmp_path / "ckpt")!r}):
    found.extend(files)
assert found, "no reliable checkpoint files written"
spark.stop()
print("RELIABLE-OK")
"""
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=300)
    assert "RELIABLE-OK" in out.stdout, out.stderr[-2000:]
