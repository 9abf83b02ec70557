"""Driver-side run deadlines and abort-on-signal (W5/T4 analogue).

The reference enforces a hard batch deadline (src/scraper.ts:31,87-97: 30 s
per URL, 300 s per batch) and aborts in-flight work when the client
disconnects (src/daemon/server.ts:363-375). The Spark-native mapping:

  * per-task wedges  -> spark.task.reaper (session.py): the executor
    interrupts, then force-kills, a task that ignores cancellation.
  * batch deadline   -> a driver watchdog that cancels the run's job group
    once the deadline passes — and keeps cancelling, so jobs submitted
    AFTER the deadline die too (cancelJobGroup only hits running jobs).
  * disconnect/abort -> SIGTERM/SIGINT handlers that cancel the same group.

Cancellation is cooperative with the storage contract: parquet/Iceberg
writes commit atomically at job end, so an aborted run leaves no committed
partial table — the next run's checkpoint resume sees only complete tables.
"""

from __future__ import annotations

import signal
import threading
from typing import Optional

from pyspark.sql import SparkSession


class AbortController:
    """Cancels the `group_id` job group on deadline or termination signal.

    Usage (driver main thread, before submitting work):

        ctl = AbortController(spark, run_id, deadline_seconds=args.deadline)
        ctl.install()
        ... run jobs ...
        if ctl.aborted: exit(3)
    """

    def __init__(
        self,
        spark: SparkSession,
        group_id: str,
        deadline_seconds: Optional[float] = None,
        recancel_interval: float = 0.5,
    ):
        self._sc = spark.sparkContext
        self.group_id = group_id
        self.deadline_seconds = deadline_seconds
        self.recancel_interval = recancel_interval
        self.aborted: Optional[str] = None
        self._stop = threading.Event()

    def install(self) -> "AbortController":
        # interruptOnCancel: a cancel interrupts the task threads instead of
        # waiting for them to finish the current record loop.
        self._sc.setJobGroup(self.group_id, "reader_spark run", True)
        signal.signal(signal.SIGTERM, self._on_signal)
        signal.signal(signal.SIGINT, self._on_signal)
        if self.deadline_seconds and self.deadline_seconds > 0:
            watchdog = threading.Thread(
                target=self._watch, name="run-deadline", daemon=True
            )
            watchdog.start()
        return self

    def abort(self, reason: str) -> None:
        if self.aborted is None:
            self.aborted = reason
        try:
            self._sc.cancelJobGroup(self.group_id)
        except Exception:
            pass  # context already stopped — nothing left to cancel

    def close(self) -> None:
        self._stop.set()

    # internal ----------------------------------------------------------
    def _on_signal(self, signum, _frame) -> None:
        self.abort(f"aborted_by_signal_{signum}")

    def _watch(self) -> None:
        if not self._stop.wait(self.deadline_seconds):
            # past the deadline: cancel now and keep cancelling so that any
            # job submitted after the deadline is killed as well
            while not self._stop.is_set():
                self.abort("deadline_exceeded")
                self._stop.wait(self.recancel_interval)
