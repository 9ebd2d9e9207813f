"""Control plane: the reference's C2 command surface re-expressed for Spark.

Reference: trend-o-meter:165-272 — a Redis pub/sub text protocol with two
verbs (``get``/``set``), a per-command last-response cache (HSET), a JSON
response channel (PUBLISH), and an append-only command log (LPUSH cmdlog).

Spark mapping (SURVEY §2.10, §3.3): a driver-side dispatcher over the
typed :class:`~trend_o_meter_spark.config.EngineConfig`; the ``set`` path
is a parameter rebind + re-execution of the flagship aggregation (the
reference re-runs A3 on ``set minDataHoursToRenderBin``,
trend-o-meter:214-220); the command log is an append-only parquet table.
"""

from .plane import CommandResult, ControlPlane

__all__ = ["CommandResult", "ControlPlane"]
