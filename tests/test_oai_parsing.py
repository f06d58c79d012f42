"""X1-X5 OAI page parsing + F1 filter tests against golden tuples
(reference: OaiHarvesterTest.java:91-155)."""

from datetime import datetime

from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark.functions.filters import qucosa_document_filter
from qucosa_fcrepo_reportingdb_spark.functions.oai_xml import (
    explode_headers,
    parse_oai_pages,
)
from tests import fixtures_oai as fx


def parse(spark, xml):
    return parse_oai_pages(spark.createDataFrame([(xml,)], "xml string"))


def test_x1_headers_extracted(spark):
    rows = explode_headers(parse(spark, fx.LIST_IDENTIFIERS)) \
        .orderBy("record_identifier").collect()
    assert [(r.record_identifier, r.datestamp, r.set_spec, r.status_is_deleted)
            for r in rows] == [
        ("oai:example.org:qucosa:1044", datetime(2014, 5, 6, 17, 33, 25), [], False),
        ("oai:example.org:qucosa:1234", datetime(2016, 7, 12, 17, 33, 25),
         ["test:11", "test:22"], True),
    ]


def test_x3_response_date(spark):
    row = parse(spark, fx.LIST_IDENTIFIERS).collect()[0]
    assert row.response_date == datetime(2014, 6, 8, 11, 43, 0)
    assert row.request_verb == "ListIdentifiers"


def test_x4_token_three_valued(spark):
    absent = parse(spark, fx.LIST_IDENTIFIERS).collect()[0]
    assert absent.resumption_token is None
    live = parse(spark, fx.WITH_TOKEN).collect()[0]
    assert live.resumption_token == "111111111111111"  # trimmed
    empty = parse(spark, fx.WITH_EMPTY_TOKEN).collect()[0]
    assert empty.resumption_token == ""


def test_x5_token_expiration(spark):
    live = parse(spark, fx.WITH_TOKEN).collect()[0]
    assert live.resumption_token_expiration == datetime(2014, 6, 9, 18, 34, 15)


def test_x2_errors_map(spark):
    row = parse(spark, fx.ERROR_NO_RECORDS).collect()[0]
    assert dict(row.errors) == {
        "noRecordsMatch": "No records match the given criteria."}
    assert row.headers == []


def test_f1_regex_filter_keeps_6_of_13(spark):
    headers = explode_headers(parse(spark, fx.filter_corpus()))
    assert headers.count() == 13
    kept = qucosa_document_filter(headers)
    assert kept.count() == 6
    assert all("qucosa:" in r.record_identifier for r in kept.collect())


def test_filter_is_pushed_into_scan(spark):
    # F1 must stay a Catalyst Filter (rlike), not a Python UDF barrier
    headers = explode_headers(parse(spark, fx.filter_corpus()))
    plan = qucosa_document_filter(headers)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "RLIKE" in plan or "rlike" in plan.lower()
