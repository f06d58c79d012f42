"""End-to-end curation-chain scaling probe (SCALING.md round-7 section).

Question: the chain pairs -> connected components -> keep-canonical ->
clean-corpus manifest -> leakage-safe split is probed per-stage elsewhere
(band join 10x, CC 133x density, LSH 100x) — what does the WHOLE chain
cost at 10x the corpus, memoized handoffs included?

Corpus construction: sf0.1 documents replicated with id offsets, with
every token of replica k suffixed 'z{k}z' (still [a-z0-9]+ tokens).
Replicas are "parallel universes": each preserves the original corpus's
internal near-dup structure exactly, while sharing NO shingles across
replicas — so true pairs/clusters scale LINEARLY with corpus size and
the probe isolates the chain's scaling from graph densification (the
133x-density probe covers that axis separately). Replica 0 is the
untouched sf0.1 corpus.

Expected shape: each stage is one-or-two shuffles over corpus- or
pair-sized frames plus the memoized handoff artifacts; with pairs and
clusters growing linearly, wall should grow ~linearly once past the
fixed per-stage overheads (the round-7 10x run was overhead-FLAT at
~15 s — which demonstrated survival but not the data-proportional
regime; the 100x point is where that regime is actually measured).
Per-stage growth exponents are printed between successive scales:
exponent e in wall ~ docs^e, so e ~ 1 is linear scaling, e ~ 0 is
still overhead-dominated, e > 1 is superlinear (the saturation
signal).

Run: python tools/curation_chain_probe.py   (~15-25 min at 1,10,100 on
local[32]; set SPARK_GRAFT_CHAIN_REPLICAS=1,10 for the short form)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from qucosa_fcrepo_reportingdb_spark.operators import corpus  # noqa: E402
from qucosa_fcrepo_reportingdb_spark.operators.dedup import (  # noqa: E402
    jaccard_pair_table,
)
from qucosa_fcrepo_reportingdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = [int(x) for x in os.environ.get(
    "SPARK_GRAFT_CHAIN_REPLICAS", "1,10,100").split(",")]
ID_STRIDE = 10_000_000


def build_corpus(spark, base, n_replicas: int, out_dir: str) -> int:
    parts = []
    for k in range(n_replicas):
        if k == 0:
            rep = base
        else:
            rep = base.select(
                (F.col("doc_id") + k * ID_STRIDE).alias("doc_id"),
                F.expr(f"regexp_replace(lower(text), '([a-z0-9]+)', "
                       f"'$1z{k}z')").alias("text"),
                "lang", "source", "n_chars")
        parts.append(rep)
    full = parts[0]
    for p in parts[1:]:
        full = full.unionByName(p)
    full.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet"))
    return spark.read.parquet(
        os.path.join(out_dir, "documents.parquet")).count()


def main():
    spark = get_spark("curation-chain-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    root = tempfile.mkdtemp(prefix="chain_probe_")
    stages = [
        ("pairs", lambda d: jaccard_pair_table(spark, d)),
        ("cc", lambda d: corpus.dedup_connected_components(spark, d)),
        ("canonical", lambda d: corpus.dedup_keep_canonical(spark, d)),
        ("manifest", lambda d: corpus.clean_corpus_manifest(spark, d)),
        ("split", lambda d: corpus.leakage_safe_split(spark, d)),
    ]
    results = {}
    try:
        for n in REPLICAS:
            d = os.path.join(root, f"x{n}")
            rows = build_corpus(spark, base, n, d)
            walls, counts = {}, {}
            t_all = time.time()
            for name, fn in stages:
                t0 = time.time()
                counts[name] = fn(d).count()
                walls[name] = round(time.time() - t0, 2)
            total = round(time.time() - t_all, 2)
            results[n] = (rows, counts, walls, total)
            print(f"\n=== {n}x corpus: {rows} docs ===", flush=True)
            for name, _ in stages:
                print(f"  {name:10s} {walls[name]:7.2f}s  "
                      f"rows={counts[name]}")
            print(f"  {'TOTAL':10s} {total:7.2f}s", flush=True)
            # the per-scale corpus + its memoized artifacts are no
            # longer needed; free the checkpoint blocks before the next
            # (bigger) scale so 100x never competes with 10x's leftovers
            from qucosa_fcrepo_reportingdb_spark.memo import (
                clear_session_memo,
            )
            clear_session_memo(spark)
            shutil.rmtree(d, ignore_errors=True)
        import math
        print("\nper-stage growth exponents (wall ~ docs^e between "
              "successive scales; e~1 linear, e~0 overhead-bound):")
        names = [name for name, _ in stages] + ["TOTAL"]
        for lo, hi in zip(REPLICAS, REPLICAS[1:]):
            span = math.log10(hi / lo)
            exps = {}
            for name in names:
                wlo = results[lo][2].get(name, results[lo][3]
                                         if name == "TOTAL" else None)
                whi = results[hi][2].get(name, results[hi][3]
                                         if name == "TOTAL" else None)
                if name == "TOTAL":
                    wlo, whi = results[lo][3], results[hi][3]
                exps[name] = round(
                    math.log10(max(whi, 1e-9) / max(wlo, 1e-9)) / span, 2)
            print(f"  {lo}x -> {hi}x: " + "  ".join(
                f"{n}={exps[n]}" for n in names))
        top = REPLICAS[-1]
        shares = {name: round(100 * results[top][2][name]
                              / results[top][3], 1)
                  for name, _ in stages}
        print(f"stage share of the {top}x chain wall: " + "  ".join(
            f"{n}={shares[n]}%" for n, _ in stages), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
