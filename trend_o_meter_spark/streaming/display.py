"""Display sink emulation (K1, trend-o-meter:85-108,153-163,335-378).

The reference renders to a 4-row character-cell hardware display via
per-cell ``writeAt`` calls.  Rendering is presentation, not engine work
(SURVEY §1.1), so the Spark build emulates the sink as a ``foreachBatch``
writer that folds the day-binned extents + current rolling average into a
4-line text frame:

    row 0: 3-char devoweled metric label + current value  (trend-o-meter:356,366-371)
    row 1: day-bin labels, one 4-char cell per bin        (trend-o-meter:157-159)
    row 2: per-bin display-rounded max                    (rawValRenderers, :146-151)
    row 3: per-bin display-rounded min

Incomplete bins (``is_complete`` false) render as ``-`` padding — the
reference's minDataHoursToRenderBin gate (trend-o-meter:59,159).  Frames
append to an in-process list (tests) or any callable sink.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

CELL_W = 4  # config/default.json:14 mainMetricWidth


def _fmt(v: float | None) -> str:
    if v is None:
        return "-" * CELL_W
    # rawValRenderers: round-half-away-from-zero integer display (X2)
    s = str(int(abs(v) + 0.5) * (1 if v >= 0 else -1))
    return s[:CELL_W].rjust(CELL_W)


def render_frame(
    extents_rows: list,
    *,
    metric: str,
    current_value: float | None = None,
) -> list[str]:
    """Fold day-bin extent rows (one metric) into the 4-line frame."""
    # the hardware frame has one cell per CONFIGURED bin (trend-o-meter
    # :157-159); the "rest" leftover bin day_binned_extremes emits by
    # default is engine output with no display cell — drop it rather than
    # crash int() on the label (it would also render a meaningless
    # "restd" cell).
    rows = sorted(
        (
            r
            for r in extents_rows
            if r["day_bin"] != "rest"
            # membership FIRST: metric-less rows (day_binned_extremes
            # with metric=None) raise on r["metric"] before a trailing
            # fallback could short-circuit
            and ("metric" not in r.asDict() or r["metric"] == metric)
        ),
        key=lambda r: int(r["day_bin"]),
    )
    abbr = "".join(ch for ch in metric.lower() if ch not in "aeiouy")[:3]
    cur = _fmt(current_value) if current_value is not None else " " * CELL_W
    labels = "".join(f"{r['day_bin']}d".ljust(CELL_W) for r in rows)
    maxs = "".join(_fmt(r["max_val"] if r["is_complete"] else None) for r in rows)
    mins = "".join(_fmt(r["min_val"] if r["is_complete"] else None) for r in rows)
    return [f"{abbr:<3} {cur}", labels, maxs, mins]


class Heartbeat:
    """Per-message render heartbeat (trend-o-meter:337-378).

    The reference alternates a tick character ``~``/``*`` on every
    accepted message and flips the current-value cell between the metric
    label and the live value every ``alternate_every`` ticks, rendering a
    ``' - '`` transition frame in between.  Presentation-state only, so
    it lives driver-side next to the sink (no distributed state).
    """

    def __init__(self, *, alternate_every: int = 15) -> None:
        self.alternate_every = alternate_every
        self.ticks = 0

    def tick(self) -> str:
        self.ticks += 1
        return "~" if self.ticks % 2 else "*"

    def current_cell(self, *, metric: str, value: float | None) -> str:
        """What the current-value cell shows at this tick."""
        offset = self.ticks % self.alternate_every
        showing_value = (self.ticks // self.alternate_every) % 2 == 0
        if offset == 0 and self.ticks > 0:
            return " - "  # transition frame at the flip boundary
        if showing_value and value is not None:
            return _fmt(value)
        abbr = "".join(ch for ch in metric.lower() if ch not in "aeiouy")[:3]
        return abbr.ljust(CELL_W)


def foreach_batch_display(
    *,
    metric: str,
    sink: Callable[[int, list[str]], None],
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function rendering each micro-batch's
    extents table to a frame.  The batch DataFrame must carry the
    day_binned_extremes columns (metric, day_bin, min_val, max_val,
    is_complete)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.collect()  # 4-25 rows: the aggregated extents, not raw data
        if rows:
            sink(batch_id, render_frame(rows, metric=metric))

    return write
