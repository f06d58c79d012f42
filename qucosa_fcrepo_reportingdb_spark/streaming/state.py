"""Harvest checkpoint state machine (SURVEY.md §2.5 T1-T3).

This is the reference's densest logic — the resumption-token branch matrix
(OaiHarvester.java:334-444, spec doc/HarvesterResumptionLogic.xlsx) and the
4-case polling wait (OaiHarvester.java:201-237) — re-expressed as pure
functions over an immutable ``HarvestState``. It is exactly the shape of a
Structured Streaming source's ``latestOffset``/``commit`` pair: state in,
page observation in, next state out. No Spark dependency here, so the 3x3
matrix is unit-testable in microseconds.

Token three-valuedness (None = absent, '' = empty element, str = live
cursor) carries the protocol's flow-control meaning (OaiRunResult.java:60-65):
  - value  -> mid-pagination: next request uses resumptionToken=<value>
  - ''     -> page sequence completed normally
  - None   -> single-page (unpaginated) response
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta

OAI_ERROR_NO_RECORDS_MATCH = "noRecordsMatch"
OAI_ERROR_BAD_RESUMPTION_TOKEN = "badResumptionToken"

# Warn when the server's responseDate deviates from the local clock by more
# than this (OaiHarvester.java:69 SERVER_TIME_DIFFERENCE_WARNING_MILLIS) —
# a skewed server clock silently shifts the from= harvest window.
SERVER_TIME_DIFFERENCE_WARNING = timedelta(minutes=2)


def response_date_skew(response_date: datetime | None,
                       start_of_run: datetime,
                       threshold: timedelta = SERVER_TIME_DIFFERENCE_WARNING,
                       ) -> timedelta | None:
    """Clock-skew probe on the page's responseDate
    (OaiHarvester.java:507-519): returns the absolute local-vs-server
    difference when it exceeds `threshold`, else None. Pure — the caller
    decides how to surface it (the harvester logs a warning)."""
    if response_date is None:
        return None
    skew = abs(response_date - start_of_run)
    return skew if skew > threshold else None


def _is_blank(s: str | None) -> bool:
    return s is None or s.strip() == ""


@dataclass(frozen=True)
class HarvestState:
    """Mirror of OaiRunResult (reference: OaiRunResult.java:77-99).
    run_id is the insertion-order sequence — 'latest' is max run_id, never
    max timestamp (PostgrePersistenceService.java:101)."""
    run_id: int | None = None
    timestamp_of_run: datetime | None = None
    response_date: datetime | None = None
    resumption_token: str | None = None
    resumption_token_expiration_date: datetime | None = None
    next_from_timestamp: datetime | None = None

    @property
    def has_resumption_token(self) -> bool:
        """True only for a non-blank token (OaiRunResult.java:124-131)."""
        return not _is_blank(self.resumption_token)

    @property
    def is_empty(self) -> bool:
        return self.timestamp_of_run is None


EMPTY_STATE = HarvestState()


@dataclass(frozen=True)
class PageObservation:
    """What one OAI response page contributes to state transition."""
    response_date: datetime | None = None
    resumption_token: str | None = None          # 3-valued
    resumption_token_expiration: datetime | None = None
    errors: dict[str, str] = field(default_factory=dict)


def build_request_params(state: HarvestState, fc3_compatibility: bool = False,
                         now: "datetime | None" = None) -> dict[str, str]:
    """S1 URI construction (OaiHarvester.java:304-318): mid-pagination uses
    only the token; otherwise metadataPrefix plus the from= watermark
    formatted per X9 (FC3 mode omits the trailing Z — OaiHarvester.java:71-83).

    With ``now``, a resumption token whose stored expirationDate (X5) has
    passed is dropped LOCALLY and the request restarts the window from
    the saved watermark — the same recovery next_state applies after the
    server answers badResumptionToken, minus the wasted request/poll
    cycle that the server round-trip would cost (the state machine backs
    the watermark up during pagination precisely so this restart loses
    nothing)."""
    params = {"verb": "ListIdentifiers"}
    token_usable = state.has_resumption_token and not (
        now is not None
        and state.resumption_token_expiration_date is not None
        and state.resumption_token_expiration_date <= now)
    if token_usable:
        params["resumptionToken"] = state.resumption_token
    else:
        params["metadataPrefix"] = "oai_dc"
        if state.next_from_timestamp is not None:
            from qucosa_fcrepo_reportingdb_spark.functions.timestamps import (
                OAI_FROM_STRFTIME,
                OAI_FROM_STRFTIME_FC3,
            )
            fmt = (OAI_FROM_STRFTIME_FC3 if fc3_compatibility
                   else OAI_FROM_STRFTIME)
            params["from"] = state.next_from_timestamp.strftime(fmt)
    return params


def next_state(last: HarvestState, page: PageObservation, start_of_run: datetime,
               fc3_compatibility: bool = False) -> HarvestState:
    """T2/T3 branch matrix (OaiHarvester.java:352-444).

    Decides the next ``from=`` watermark:
      - page sequence complete (empty/absent token after a token, or clean
        single page)        -> start_of_run
      - mid-pagination      -> carry last.next_from_timestamp (so an expired
        token restarts the whole window)
      - protocol violation / unhandled error -> keep last watermark
      - noRecordsMatch      -> success-with-empty-page, watermark advances
      - badResumptionToken  -> restart window from saved watermark
    """
    if not page.errors:
        if page.resumption_token is None:
            if not last.has_resumption_token:
                # regular single-page response
                nxt = start_of_run
            elif fc3_compatibility:
                # FC3 bug: paginated list ends without an empty token; in
                # compatibility mode this counts as normal completion
                nxt = start_of_run
            else:
                # against spec: token vanished mid-pagination — keep backup
                nxt = last.next_from_timestamp
        elif _is_blank(page.resumption_token):
            if not last.has_resumption_token:
                # against spec: empty token without a prior token
                nxt = last.next_from_timestamp
            else:
                # pagination completed normally
                nxt = start_of_run
        else:
            # mid-pagination: back up the watermark of the request window
            nxt = last.next_from_timestamp
    elif OAI_ERROR_NO_RECORDS_MATCH in page.errors:
        nxt = start_of_run
    else:
        # badResumptionToken and anything unhandled: keep the old watermark
        nxt = last.next_from_timestamp

    return HarvestState(
        run_id=(last.run_id or 0) + 1,
        timestamp_of_run=start_of_run,
        response_date=page.response_date or start_of_run,
        resumption_token=page.resumption_token,
        resumption_token_expiration_date=page.resumption_token_expiration,
        next_from_timestamp=nxt,
    )


def compute_wait(last: HarvestState, now: datetime, poll_interval: timedelta,
                 min_wait_between_requests: timedelta = timedelta(seconds=1),
                 last_run_resulted_in_error: bool = False) -> timedelta:
    """T1 four-case wait (OaiHarvester.java:201-237):
      1. first run                  -> 0 (fire immediately)
      2. idle steady state          -> interval-aligned: poll - elapsed
      3. mid-pagination             -> min wait (politeness, 1 s default)
      4. after error / clock skew   -> full poll interval
    """
    if last.timestamp_of_run is None and not last_run_resulted_in_error:
        return timedelta(0)
    if (last.timestamp_of_run is not None and not last.has_resumption_token
            and not last_run_resulted_in_error):
        if last.timestamp_of_run <= now:
            return max(timedelta(0),
                       poll_interval - (now - last.timestamp_of_run))
        # clock skew: last run in the future
        return poll_interval
    if last.has_resumption_token and not last_run_resulted_in_error:
        return min_wait_between_requests
    return poll_interval
