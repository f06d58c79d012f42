"""PySpark-native analytics/ETL engine with the capabilities of
qucosa/qucosa-fcrepo-reportingdb (reference: Java OAI-PMH harvester +
METS enricher + PostgreSQL reporting DB — see SURVEY.md).

Layers (SURVEY.md §0):
- ingestion operators  : sources/ (OAI paginated source, METS point lookups)
                         + functions/ (XPath extraction, timestamp parsing,
                         regex filtering)
- table maintenance    : operators/ (keyed merge upsert, conditional delete,
                         retention pruning) + tables.py (parquet table store)
- query surface        : plans/ (reporting aggregations) and the
                         large-scale training-data operators
                         (dedup, similarity search, text analysis)
- streaming semantics  : streaming/ (harvest checkpoint state machine,
                         structured-streaming wrappers)

Everything is DataFrame-first: logical plans are declared with the
pyspark.sql API and Catalyst/Tungsten choose the physical strategy.
"""

from qucosa_fcrepo_reportingdb_spark.config import ReportingConfig
from qucosa_fcrepo_reportingdb_spark.pipeline import ReportingPipeline
from qucosa_fcrepo_reportingdb_spark.session import get_spark, load_tables
from qucosa_fcrepo_reportingdb_spark.tables import TableStore

__all__ = ["ReportingConfig", "ReportingPipeline", "TableStore",
           "get_spark", "load_tables"]
