"""Timestamp parsing/formatting (SURVEY.md §2.3 X7-X9).

The reference parses xsd:dateTime via DatatypeConverter
(OaiHarvester.java:546,511,571-579) and METS dates via Joda DateTime —
which must accept no-colon offsets like ``+0200`` (regression test
MetsProcessorTest.java:262-306) and bare dates like ``2008-08-04``
(MetsProcessor.java:221-231).

All parsing is built-in ``try_to_timestamp`` chains (JVM-side, codegen'd) —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered most-specific-first; try_to_timestamp returns NULL on mismatch so
# coalesce picks the first format that parses. A run of N 'S's parses UP
# TO N fraction digits (probed), so the 9-S forms cover every legal
# xsd:dateTime fraction (1-9 digits) in one pattern each — combined with
# the three offset shapes (colon/Z, no-colon, naive) that the reference's
# DatatypeConverter/Joda parsers accept (MetsProcessorTest.java:262-306).
_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX",  # fraction + Z / +02:00
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSZ",    # fraction + +0200 (no colon)
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSS",     # fraction, naive
    "yyyy-MM-dd'T'HH:mm:ssXXX",      # 2014-05-06T17:33:25Z / +02:00
    "yyyy-MM-dd'T'HH:mm:ssZ",        # 2016-05-24T12:33:56+0200 (no colon — X8)
    "yyyy-MM-dd'T'HH:mm:ss",         # naive datetime
    "yyyy-MM-dd",                    # bare date, e.g. 2008-08-04
]


def parse_xsd_datetime(col: Column | str) -> Column:
    """X7/X8: lenient ISO-8601/xsd:dateTime parser covering every format the
    reference fixtures exercise. NULL for blank/unparsable input (callers
    quarantine via filters.validate_reporting_documents)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c)
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in _FORMATS])


# X9 single source of truth — the strftime patterns for the OAI `from=`
# parameter. streaming/state.build_request_params (the PRODUCTION request
# path) and the Spark-side formatter below both consume these; a change
# to FC3 semantics edited in one place reaches both.
OAI_FROM_STRFTIME = "%Y-%m-%dT%H:%M:%SZ"
OAI_FROM_STRFTIME_FC3 = "%Y-%m-%dT%H:%M:%S"   # FC3 shifts dates on 'Z'


def format_oai_request_timestamp(col: Column | str, fc3_compatibility: bool) -> Column:
    """X9: format a watermark for the OAI ``from=`` request parameter.

    Normal mode appends a trailing 'Z'; Fedora Commons 3 compatibility mode
    omits it because FC3 otherwise shifts the date by one day (documented
    reference: OaiHarvester.java:71-83; config flag OaiHarvesterBuilder.java:100-110).
    """
    c = F.col(col) if isinstance(col, str) else col
    fmt = "yyyy-MM-dd'T'HH:mm:ss" if fc3_compatibility else "yyyy-MM-dd'T'HH:mm:ss'Z'"
    return F.date_format(c, fmt)


def is_blank(col: Column | str) -> Column:
    """X11: StringUtils.isBlank — NULL, empty, or whitespace-only
    (reference: OaiHeader.java:48, OaiRunResult.java:89)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | (F.trim(c) == F.lit(""))
