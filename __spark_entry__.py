"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` declare every implemented operator from
SURVEY.md §2 plus the training-data pipeline surface, each verified against
a DuckDB oracle at sf0.01 (column names aligned, exact-arithmetic numeric
policy — see qucosa_fcrepo_reportingdb_spark/plans/common.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qucosa_fcrepo_reportingdb_spark.functions import text  # noqa: E402
from qucosa_fcrepo_reportingdb_spark.operators import (  # noqa: E402
    corpus,
    dedup,
    multimodal,
    similarity,
)
from qucosa_fcrepo_reportingdb_spark.plans import (  # noqa: E402
    advanced,
    events,
    reporting,
    tpch,
)

_MODULES = [tpch, events, reporting, advanced, dedup, similarity, text,
            multimodal, corpus]

# Queries a budget-limited sweep must reach first: in round 1 the driver's
# run stopped partway through the registry (everything after
# text_quality_score got no CORRECTNESS row), so queries with no prior
# CORRECTNESS row — round 1's unchecked four plus the round-2 corpus
# additions — run at the front of the iteration order.
_FRONT = ["text_language_id", "text_fingerprint", "multimodal_decode_stats",
          "multimodal_frame_sample", "decontaminate_ngram_overlap",
          "pack_sequences", "stratified_sample", "ngram_topk",
          "dedup_connected_components", "chunk_documents",
          "repetition_stats", "source_quality_summary", "ann_lsh_topk"]


def _reorder(d: dict) -> dict:
    return {**{k: d[k] for k in _FRONT if k in d},
            **{k: v for k, v in d.items() if k not in _FRONT}}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return _reorder(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return _reorder(out)
