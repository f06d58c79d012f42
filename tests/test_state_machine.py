"""T1/T2/T3 state-machine tests — the branch matrix from
OaiHarvester.java:334-444 re-expressed over pure functions
(reference tests: OaiHarvesterTest.java:349-716)."""

from datetime import datetime, timedelta

from qucosa_fcrepo_reportingdb_spark.streaming.state import (
    EMPTY_STATE,
    HarvestState,
    PageObservation,
    build_request_params,
    compute_wait,
    next_state,
)

T0 = datetime(2016, 7, 20, 12, 0, 0)
T1 = datetime(2016, 7, 20, 12, 5, 0)
LAST_FROM = datetime(2016, 7, 19, 11, 0, 0)


def mk_state(token=None, next_from=None):
    return HarvestState(run_id=7, timestamp_of_run=T0, response_date=T0,
                        resumption_token=token, next_from_timestamp=next_from)


# --- T2 branch matrix: no errors -------------------------------------------

def test_single_page_no_prior_token_advances_watermark():
    s = next_state(mk_state(token=None, next_from=LAST_FROM),
                   PageObservation(resumption_token=None), T1)
    assert s.next_from_timestamp == T1
    assert s.run_id == 8


def test_token_vanished_mid_pagination_keeps_backup():
    # against spec: last run had a token, current page has none
    s = next_state(mk_state(token="abc", next_from=LAST_FROM),
                   PageObservation(resumption_token=None), T1)
    assert s.next_from_timestamp == LAST_FROM


def test_token_vanished_fc3_mode_is_normal_completion():
    # FC3 omits the final empty token; compatibility mode treats it as done
    s = next_state(mk_state(token="abc", next_from=LAST_FROM),
                   PageObservation(resumption_token=None), T1,
                   fc3_compatibility=True)
    assert s.next_from_timestamp == T1


def test_empty_token_after_token_completes_sequence():
    s = next_state(mk_state(token="abc", next_from=LAST_FROM),
                   PageObservation(resumption_token=""), T1)
    assert s.next_from_timestamp == T1


def test_empty_token_without_prior_token_is_violation():
    s = next_state(mk_state(token=None, next_from=LAST_FROM),
                   PageObservation(resumption_token=""), T1)
    assert s.next_from_timestamp == LAST_FROM


def test_live_token_carries_watermark_forward():
    # mid-pagination: an expired token must be able to restart the window
    s = next_state(mk_state(token=None, next_from=LAST_FROM),
                   PageObservation(resumption_token="tok-2"), T1)
    assert s.next_from_timestamp == LAST_FROM
    assert s.resumption_token == "tok-2"


def test_first_run_paginated_has_null_watermark():
    s = next_state(EMPTY_STATE, PageObservation(resumption_token="tok-1"), T1)
    assert s.next_from_timestamp is None
    assert s.has_resumption_token


# --- T3 errors as data -------------------------------------------------------

def test_no_records_match_is_success_with_empty_page():
    s = next_state(mk_state(next_from=LAST_FROM),
                   PageObservation(errors={"noRecordsMatch": "x"}), T1)
    assert s.next_from_timestamp == T1


def test_bad_resumption_token_restarts_window():
    s = next_state(mk_state(token="expired", next_from=LAST_FROM),
                   PageObservation(errors={"badResumptionToken": "x"}), T1)
    assert s.next_from_timestamp == LAST_FROM


def test_unknown_error_keeps_old_watermark():
    s = next_state(mk_state(next_from=LAST_FROM),
                   PageObservation(errors={"badArgument": "x"}), T1)
    assert s.next_from_timestamp == LAST_FROM


def test_multiple_errors_no_records_match_wins():
    s = next_state(mk_state(next_from=LAST_FROM),
                   PageObservation(errors={"badVerb": "x", "noRecordsMatch": "y"}),
                   T1)
    assert s.next_from_timestamp == T1


# --- request construction (S1/X9) -------------------------------------------

def test_request_uses_token_when_present():
    p = build_request_params(mk_state(token="abc", next_from=LAST_FROM))
    assert p == {"verb": "ListIdentifiers", "resumptionToken": "abc"}


def test_request_uses_from_watermark():
    p = build_request_params(mk_state(token=None, next_from=LAST_FROM))
    assert p["metadataPrefix"] == "oai_dc"
    assert p["from"] == "2016-07-19T11:00:00Z"


def test_request_fc3_mode_omits_trailing_z():
    p = build_request_params(mk_state(token=None, next_from=LAST_FROM),
                             fc3_compatibility=True)
    assert p["from"] == "2016-07-19T11:00:00"


def test_request_empty_token_is_not_a_token():
    # '' counts as blank: fall back to metadataPrefix (+from)
    p = build_request_params(mk_state(token="", next_from=None))
    assert "resumptionToken" not in p
    assert "from" not in p


# --- T1 wait logic ------------------------------------------------------------

POLL = timedelta(seconds=300)


def test_wait_first_run_fires_immediately():
    assert compute_wait(EMPTY_STATE, T1, POLL) == timedelta(0)


def test_wait_idle_is_interval_aligned():
    w = compute_wait(mk_state(), T0 + timedelta(seconds=100), POLL)
    assert w == timedelta(seconds=200)


def test_wait_mid_pagination_uses_min_wait():
    w = compute_wait(mk_state(token="abc"), T1, POLL,
                     min_wait_between_requests=timedelta(seconds=1))
    assert w == timedelta(seconds=1)


def test_wait_after_error_full_interval():
    w = compute_wait(mk_state(), T1, POLL, last_run_resulted_in_error=True)
    assert w == POLL


def test_wait_clock_skew_full_interval():
    # last run in the future -> full interval (clock-skew guard)
    w = compute_wait(mk_state(), T0 - timedelta(seconds=60), POLL)
    assert w == POLL


def test_wait_elapsed_beyond_interval_is_zero():
    w = compute_wait(mk_state(), T0 + timedelta(seconds=1000), POLL)
    assert w == timedelta(0)


# --- responseDate clock-skew warning (OaiHarvester.java:69,507-519) ----------
def test_response_date_skew_above_threshold():
    from qucosa_fcrepo_reportingdb_spark.streaming.state import (
        response_date_skew)
    local = datetime(2016, 1, 1, 12, 0, 0)
    assert response_date_skew(
        datetime(2016, 1, 1, 12, 2, 1), local) == timedelta(minutes=2,
                                                            seconds=1)
    # symmetric: server behind local
    assert response_date_skew(
        datetime(2016, 1, 1, 11, 57, 59), local) == timedelta(minutes=2,
                                                              seconds=1)


def test_response_date_skew_within_threshold_or_missing():
    from qucosa_fcrepo_reportingdb_spark.streaming.state import (
        response_date_skew)
    local = datetime(2016, 1, 1, 12, 0, 0)
    assert response_date_skew(datetime(2016, 1, 1, 12, 2, 0), local) is None
    assert response_date_skew(local, local) is None
    assert response_date_skew(None, local) is None


def test_harvest_once_logs_skew_warning(spark, store, caplog):
    import logging
    from tests import fixtures_oai as fx
    from qucosa_fcrepo_reportingdb_spark.sources.oai import (
        OaiHarvestSource, fixture_fetcher)
    src = OaiHarvestSource(spark, store, fixture_fetcher([fx.LIST_IDENTIFIERS]))
    # fixture responseDate is 2014-06-08T11:43:00Z; a 'now' hours away
    # must trigger the warning
    with caplog.at_level(logging.WARNING,
                         logger="qucosa_fcrepo_reportingdb_spark.sources.oai"):
        src.harvest_once(now=datetime(2014, 6, 8, 20, 0, 0))
    assert any("difference" in r.message for r in caplog.records)


def test_harvest_once_no_warning_when_clocks_agree(spark, store, caplog):
    import logging
    from tests import fixtures_oai as fx
    from qucosa_fcrepo_reportingdb_spark.sources.oai import (
        OaiHarvestSource, fixture_fetcher)
    src = OaiHarvestSource(spark, store, fixture_fetcher([fx.LIST_IDENTIFIERS]))
    with caplog.at_level(logging.WARNING,
                         logger="qucosa_fcrepo_reportingdb_spark.sources.oai"):
        src.harvest_once(now=datetime(2014, 6, 8, 11, 43, 30))
    assert not any("difference" in r.message for r in caplog.records)


def test_expired_token_dropped_locally():
    """A stored resumption token past its expirationDate (X5) must not be
    sent: the request restarts the window from the saved watermark — the
    badResumptionToken recovery without the wasted server round-trip."""
    from datetime import datetime

    from qucosa_fcrepo_reportingdb_spark.streaming.state import (
        HarvestState,
        build_request_params,
    )

    state = HarvestState(
        run_id=7, timestamp_of_run=datetime(2024, 1, 1),
        response_date=datetime(2024, 1, 1),
        resumption_token="tok-123",
        resumption_token_expiration_date=datetime(2024, 1, 2),
        next_from_timestamp=datetime(2023, 12, 31))
    # before expiry: token used
    p = build_request_params(state, now=datetime(2024, 1, 1, 23))
    assert p.get("resumptionToken") == "tok-123"
    # after expiry: window restart from the watermark
    p = build_request_params(state, now=datetime(2024, 1, 2, 1))
    assert "resumptionToken" not in p
    assert p["from"].startswith("2023-12-31")
    # no `now` (state-machine property tests): behavior unchanged
    p = build_request_params(state)
    assert p.get("resumptionToken") == "tok-123"


def test_whitespace_only_token_means_sequence_complete():
    """The reference tests StringUtils.isBlank (OaiHarvester.java:
    357-385), so a whitespace-only resumption token is equivalent to
    the empty final token: the page sequence is COMPLETE and the
    watermark advances to start-of-run (hypothesis surfaced the '\\r'
    case in round 8; this pins it deterministically)."""
    s = next_state(mk_state(token="tok-1", next_from=LAST_FROM),
                   PageObservation(resumption_token="\r"), T1)
    assert s.next_from_timestamp == T1
    s2 = next_state(mk_state(token="tok-1", next_from=LAST_FROM),
                    PageObservation(resumption_token="  "), T1)
    assert s2.next_from_timestamp == T1
