"""OAI-PMH 2.0 response parsing (SURVEY.md §2.3 X1-X5).

The reference DOM-parses each ListIdentifiers page and XPath-extracts
headers, errors, responseDate and the resumption token
(OaiHarvester.java:446-564). Here one ``from_xml`` call parses the whole
page into a typed struct and everything downstream is columnar:

- X1 header node-set -> rows     : explode(page.headers)
- X2 errors map                  : map_from_entries over the error array
- X3 responseDate                : parse_xsd_datetime
- X4 resumption token, 3-valued  : struct NULL = absent (-> NULL),
                                   struct present + _VALUE NULL = empty ('' ),
                                   else trimmed value. The distinction is
                                   load-bearing for the checkpoint state
                                   machine (OaiRunResult.java:60-65).
- X5 token expirationDate        : attribute -> timestamp

``from_xml`` (Spark 4) is used instead of repeated ``xpath()`` calls: one
parse per document, fully whole-stage-codegen compatible, and array
alignment (identifier/datestamp/status per header) is structural instead of
positional-xpath reconstruction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qucosa_fcrepo_reportingdb_spark.functions.timestamps import parse_xsd_datetime

# Raw shape of an OAI-PMH ListIdentifiers response. Attribute fields carry
# the from_xml '_' prefix; _VALUE is the element text.
_RAW_PAGE_SCHEMA = T.StructType([
    T.StructField("responseDate", T.StringType()),
    T.StructField("request", T.StructType([
        T.StructField("_VALUE", T.StringType()),
        T.StructField("_verb", T.StringType()),
    ])),
    T.StructField("ListIdentifiers", T.StructType([
        T.StructField("header", T.ArrayType(T.StructType([
            T.StructField("identifier", T.StringType()),
            T.StructField("datestamp", T.StringType()),
            T.StructField("setSpec", T.ArrayType(T.StringType())),
            T.StructField("_status", T.StringType()),
        ]))),
        T.StructField("resumptionToken", T.StructType([
            T.StructField("_VALUE", T.StringType()),
            T.StructField("_expirationDate", T.StringType()),
        ])),
    ])),
    T.StructField("error", T.ArrayType(T.StructType([
        T.StructField("_VALUE", T.StringType()),
        T.StructField("_code", T.StringType()),
    ]))),
])


def _first_per_key(entries):
    """Keep the first entry per key in an array<struct<key,value>> —
    expression-level dedupe so map_from_entries cannot raise on repeated
    keys regardless of the session's mapKeyDedupPolicy. O(n^2) in the
    entry count, which is bounded by the handful of error codes a page
    can carry."""
    return F.filter(
        entries,
        lambda x, i: ~F.exists(
            F.slice(entries, F.lit(1), i),
            lambda y: y.getField("key") == x.getField("key")))


def _three_valued_token(token_struct: Column) -> Column:
    """X4: NULL (absent) | '' (empty element) | trimmed value."""
    return F.when(token_struct.isNull(), F.lit(None).cast(T.StringType())).otherwise(
        F.coalesce(F.trim(token_struct.getField("_VALUE")), F.lit(""))
    )


def parse_oai_pages(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Parse raw OAI response documents into the flattened page schema
    (FIXTURES.md §4): one row per page with typed headers array, 3-valued
    resumption token, expiration, and code->message errors map."""
    parsed = df.withColumn("__p", F.from_xml(F.col(xml_col), _RAW_PAGE_SCHEMA))
    p = F.col("__p")
    tok = p.getField("ListIdentifiers").getField("resumptionToken")
    headers = p.getField("ListIdentifiers").getField("header")
    errors = p.getField("error")
    return parsed.select(
        *[c for c in df.columns if c != xml_col],
        parse_xsd_datetime(p.getField("responseDate")).alias("response_date"),
        p.getField("request").getField("_verb").alias("request_verb"),
        F.when(headers.isNull(), F.array().cast(
            "array<struct<record_identifier:string,datestamp:timestamp,"
            "set_spec:array<string>,status_is_deleted:boolean>>"
        )).otherwise(
            F.transform(headers, lambda h: F.struct(
                h.getField("identifier").alias("record_identifier"),
                parse_xsd_datetime(h.getField("datestamp")).alias("datestamp"),
                F.coalesce(h.getField("setSpec"),
                           F.array().cast("array<string>")).alias("set_spec"),
                (F.coalesce(h.getField("_status"), F.lit("")) == "deleted")
                .alias("status_is_deleted"),
            ))
        ).alias("headers"),
        _three_valued_token(tok).alias("resumption_token"),
        parse_xsd_datetime(tok.getField("_expirationDate"))
        .alias("resumption_token_expiration"),
        F.when(errors.isNull(),
               F.map_from_arrays(F.array().cast("array<string>"),
                                 F.array().cast("array<string>"))).otherwise(
            # total over malformed input: a NULL code becomes 'unknown'
            # and repeated codes keep the FIRST occurrence — the OAI spec
            # allows both shapes (two badArgument errors is legal), and
            # map_from_entries would otherwise raise (null key /
            # mapKeyDedupPolicy=EXCEPTION), turning a parseable error
            # page into a crashed harvest instead of a T8 failed run
            F.map_from_entries(
                _first_per_key(F.transform(
                    errors,
                    lambda e: F.struct(
                        F.coalesce(e.getField("_code"),
                                   F.lit("unknown")).alias("key"),
                        F.trim(e.getField("_VALUE")).alias("value")),
                )))
        ).alias("errors"),
    )


def explode_headers(pages: DataFrame) -> DataFrame:
    """X1: page rows -> one row per OAI header, ready for the oai_header
    merge (schemas.OAI_HEADER_SCHEMA)."""
    return (
        pages.select(F.explode("headers").alias("h"))
        .select(
            F.col("h.record_identifier").alias("record_identifier"),
            F.col("h.datestamp").alias("datestamp"),
            F.col("h.set_spec").alias("set_spec"),
            F.col("h.status_is_deleted").alias("status_is_deleted"),
        )
    )
