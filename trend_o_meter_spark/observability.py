"""Running counters & stream health (A9, SURVEY §2.3).

The reference keeps ad-hoc monotonic counters — ``messageStats.rx/tx``
(trend-o-meter:129-132,383), ``rxMsgCount`` (trend-o-meter:136,390), a
``reconnects`` list of epoch timestamps (trend-o-meter:128,280) — all
driver-side dict mutations.  The Spark-native equivalents:

* :func:`observed` — ``DataFrame.observe`` metrics evaluated inside the
  job itself (no second scan, no collect): row count, byte volume, and
  corrupt-row count per pass.  Works on batch and streaming frames; on
  streams the metrics surface per micro-batch in
  ``StreamingQueryProgress.observedMetrics``.
* :class:`ReconnectLog` — a ``StreamingQueryListener`` recording query
  start/termination epochs, the checkpoint-era replacement for the
  reference's reconnect bookkeeping (trend-o-meter:277-284): a restart
  shows up as a new start event on the same query name.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

METRICS_NAME = "tom_metrics"


def observed(
    df: DataFrame,
    *,
    size_col: str | None = None,
    corrupt_col: str | None = None,
    name: str = METRICS_NAME,
) -> tuple[DataFrame, Observation | None]:
    """Attach in-job counters to a DataFrame pass.

    Batch: returns ``(df, Observation)`` — read ``observation.get`` after
    an action.  Streaming: ``Observation`` isn't supported, so the named
    ``observe`` variant is used and ``(df, None)`` returned; read the
    metrics from each progress event under ``observedMetrics[name]``.
    """
    metrics = [F.count(F.lit(1)).alias("rx_rows")]
    if size_col is not None:
        metrics.append(F.sum(F.octet_length(F.col(size_col))).alias("rx_bytes"))
    if corrupt_col is not None:
        metrics.append(
            F.count(F.when(F.col(corrupt_col).isNotNull(), 1)).alias("corrupt_rows")
        )
    if df.isStreaming:
        return df.observe(name, *metrics), None
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


class ReconnectLog(StreamingQueryListener):
    """Records stream lifecycle epochs — the reconnects list, principled.

    ``events`` is a list of ``(epoch_seconds, query_name, kind)`` with
    kind in {"start", "terminate"}; a restart of the same query name is
    the reconnect marker.  Register with
    ``spark.streams.addListener(log)``.
    """

    def __init__(self) -> None:
        self.events: list[tuple[float, str, str]] = []

    def onQueryStarted(self, event) -> None:
        self.events.append((time.time(), event.name or event.id, "start"))

    def onQueryProgress(self, event) -> None:  # noqa: D102 — uninteresting
        pass

    def onQueryIdle(self, event) -> None:  # noqa: D102
        pass

    def onQueryTerminated(self, event) -> None:
        self.events.append((time.time(), str(event.id), "terminate"))

    def reconnects(self) -> list[float]:
        """Start epochs after the first PER QUERY NAME — the reference's
        reconnects list.  Distinct queries starting once each are not
        reconnects; only a repeated start of the same name is (the
        restart-from-checkpoint marker)."""
        seen: set[str] = set()
        out: list[float] = []
        for t, name, kind in self.events:
            if kind != "start":
                continue
            if name in seen:
                out.append(t)
            seen.add(name)
        return out
