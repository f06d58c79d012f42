"""ReportingPipeline: the two-stage C1 topology end-to-end, plus C2
cooperative shutdown."""

from datetime import timedelta

from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark.pipeline import ReportingPipeline
from qucosa_fcrepo_reportingdb_spark.sources.mets import (
    REPORTING_DOCUMENTS_TABLE,
    fixture_mets_fetcher,
)
from qucosa_fcrepo_reportingdb_spark.sources.oai import fixture_fetcher
from tests import fixtures_oai as fx


def _mets_docs():
    return {
        "qucosa:1044": fx.mets_document("SLUB", "article", "2009-06-02"),
        "qucosa:1234": fx.mets_document("TU Dresden", "issue", "2011-03-31"),
        "qucosa:2222": fx.mets_document("slub", "monograph",
                                        "2016-10-10T11:27:33+0200"),
    }


def test_run_until_idle_full_cycle(spark, store):
    pipe = ReportingPipeline(
        spark, store,
        oai_fetch=fixture_fetcher([fx.WITH_TOKEN, fx.WITH_EMPTY_TOKEN]),
        mets_fetch=fixture_mets_fetcher(_mets_docs()))
    stats = pipe.run_until_idle()
    assert stats["pages"] == 2
    assert stats["processed"] == 2      # qucosa:1044 + qucosa:2222
    assert stats["persisted"] == 2
    assert pipe.queue_depth() == 0
    docs = store.read(REPORTING_DOCUMENTS_TABLE)
    mandators = {r.mandator for r in docs.collect()}
    assert mandators == {"SLUB", "slub"}


def test_terminate_stops_before_enrichment(spark, store):
    pipe = ReportingPipeline(
        spark, store,
        oai_fetch=fixture_fetcher([fx.LIST_IDENTIFIERS]),
        mets_fetch=fixture_mets_fetcher(_mets_docs()))
    pipe.terminate()
    assert pipe.running is False
    stats = pipe.run_until_idle()
    # both stages respect the flag: nothing harvested, nothing enriched
    assert stats == {"pages": 0, "processed": 0, "persisted": 0,
                     "rejected": 0}
    assert pipe.queue_depth() == 0


def test_continuous_mode_bounded_iterations(spark, store):
    pipe = ReportingPipeline(
        spark, store,
        oai_fetch=fixture_fetcher([fx.LIST_IDENTIFIERS]),
        mets_fetch=fixture_mets_fetcher(_mets_docs()))
    n = pipe.run_continuous(poll_interval=timedelta(milliseconds=10),
                            max_iterations=2)
    assert n == 2
    assert pipe.queue_depth() == 0


def test_failed_fetch_triggers_backoff_flag(spark, store):
    """A down endpoint (fetch returns None, no exception) must register
    as a FAILED cycle so run_continuous applies the T1 case-4
    full-interval backoff instead of busy-looping at zero wait."""
    from qucosa_fcrepo_reportingdb_spark.sources.oai import (
        OaiHarvestSource,
        fixture_fetcher,
    )

    src = OaiHarvestSource(spark, store, fixture_fetcher([]))
    assert src.last_harvest_failed is False
    src.harvest_available()
    assert src.last_harvest_failed is True
    # a later successful harvest clears the flag
    from tests import fixtures_oai as fx
    src2 = OaiHarvestSource(spark, store, fixture_fetcher([fx.LIST_IDENTIFIERS]))
    src2.harvest_available()
    assert src2.last_harvest_failed is False
