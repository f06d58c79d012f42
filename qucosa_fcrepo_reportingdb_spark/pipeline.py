"""Two-stage pipeline orchestration (SURVEY.md §2.6 C1/C2, §3).

The reference runs harvester and enricher as independent threads
communicating only through the database (ReportingManager.java:56-95).
Here the same topology is two stage functions over shared tables, with a
cooperative terminate flag (C2's TerminateableRunnable) and the reference's
scheduling semantics provided by the pure wait logic (streaming/state.py:
compute_wait) — the caller chooses batch mode (`run_until_idle`, the
Trigger.AvailableNow analog) or continuous mode (`run_continuous`)."""

from __future__ import annotations

import logging
import threading
import time
from datetime import datetime, timedelta, timezone

from pyspark.sql import SparkSession

from qucosa_fcrepo_reportingdb_spark.sources.mets import MetsFetcher, enrich_once
from qucosa_fcrepo_reportingdb_spark.sources.oai import (
    Fetcher,
    OAI_HEADER_TABLE,
    OaiHarvestSource,
)
from qucosa_fcrepo_reportingdb_spark import schemas
from qucosa_fcrepo_reportingdb_spark.streaming.state import compute_wait
from qucosa_fcrepo_reportingdb_spark.tables import TableStore


class ReportingPipeline:
    def __init__(self, spark: SparkSession, store: TableStore,
                 oai_fetch: Fetcher, mets_fetch: MetsFetcher,
                 batch_size: int = 100,
                 mets_min_wait_s: float = 0.0,
                 fc3_compatibility: bool = False,
                 history_length: timedelta = timedelta(days=2)):
        self.spark = spark
        self.store = store
        self.harvester = OaiHarvestSource(
            spark, store, oai_fetch,
            fc3_compatibility=fc3_compatibility,
            history_length=history_length)
        self.mets_fetch = mets_fetch
        self.batch_size = batch_size
        self.mets_min_wait_s = mets_min_wait_s
        self._terminate = threading.Event()

    # C2: cooperative shutdown — finish the current microbatch, then stop
    def terminate(self) -> None:
        self._terminate.set()

    @property
    def running(self) -> bool:
        return not self._terminate.is_set()

    def queue_depth(self) -> int:
        return self.store.read(
            OAI_HEADER_TABLE, schemas.OAI_HEADER_SCHEMA).count()

    def run_until_idle(self, max_cycles: int = 1000) -> dict[str, int]:
        """Batch mode (Trigger.AvailableNow analog): harvest every
        available page, then drain the queue to empty. At-least-once with
        idempotent merges throughout — interrupting between any two steps
        is safe."""
        stats = {"pages": 0, "processed": 0, "persisted": 0, "rejected": 0}
        if self.running:
            stats["pages"] = self.harvester.harvest_available(
                max_pages=max_cycles)
        cycles = 0
        while self.running and cycles < max_cycles:
            batch = enrich_once(self.spark, self.store, self.mets_fetch,
                                self.batch_size, self.mets_min_wait_s)
            if batch["processed"] == 0:
                break
            for k in ("processed", "persisted", "rejected"):
                stats[k] += batch[k]
            cycles += 1
        return stats

    def run_continuous(self, poll_interval: timedelta,
                       max_iterations: int | None = None) -> int:
        """Continuous mode: the reference's poll loop with the T1 4-case
        wait (streaming/state.compute_wait — interval-aligned idle wait,
        full-interval backoff when the last cycle errored, clock-skew
        guard). Iterations are bounded for testability; production passes
        None."""
        n = 0
        while self.running and (max_iterations is None
                                or n < max_iterations):
            errored = False
            try:
                self.run_until_idle()
                # a fetch failure returns None instead of raising (T8);
                # it must still trigger the case-4 backoff — without
                # this, a down endpoint busy-loops at zero wait once the
                # last success predates the poll interval
                errored = getattr(self.harvester, "last_harvest_failed",
                                  False)
            except Exception:
                # T1 case 4: full-interval backoff after a failed cycle;
                # at-least-once + idempotent merges make the retry safe.
                # Logged (reference: OaiRunResult error logging) — a
                # persistently failing cycle must be diagnosable, not a
                # silent infinite backoff loop.
                logging.getLogger(__name__).exception(
                    "pipeline cycle failed; backing off one full interval")
                errored = True
            n += 1
            if self.running and (max_iterations is None
                                 or n < max_iterations):
                wait = compute_wait(
                    self.harvester.load_state(),
                    datetime.now(timezone.utc).replace(tzinfo=None),
                    poll_interval,
                    last_run_resulted_in_error=errored)
                # interruptible sleep (cooperative C2 semantics)
                self._terminate.wait(wait.total_seconds())
        return n
