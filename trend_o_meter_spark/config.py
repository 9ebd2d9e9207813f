"""Typed engine configuration mirroring the reference's config/default.json.

The reference's config (reference config/default.json:1-28) is the de-facto
schema of its query surface (SURVEY §1.3); this dataclass is the one place
those tunables live.  Every operator takes its parameters explicitly with
these defaults, so the C2 ``set`` path (reference trend-o-meter:213-227) is a
parameter rebind + re-execution, exactly as in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PubSubMetricsConfig:
    """reference config/default.json:23 (block is null => feature off)."""

    mps_window_size_seconds: int = 10
    render_every_seconds: int = 5
    channel_inactive_cutoff_seconds: int = 60


@dataclass(frozen=True)
class EngineConfig:
    # reference config/default.json:6 — backfill scan cap (lrange 0..N inclusive)
    max_list_query_length: int = 14400
    # reference config/default.json:15 — downsample cadence (trend-o-meter:137)
    samples_per_minute_retained: float = 1.0
    # reference config/default.json:16 — disjoint trailing day-bin edges
    day_bins: tuple[int, ...] = (1, 3, 5, 7)
    # reference config/default.json:17 — completeness threshold, strict > on
    # ceil(span_hours) (trend-o-meter:59)
    min_data_hours_to_render_bin: int = 18
    # reference config/default.json:19 — rolling "current value" width
    num_samples: int = 30
    # reference config/default.json:20 — display flip cadence (presentation)
    alternate_every: int = 15
    pubsub_metrics: PubSubMetricsConfig | None = field(default=None)

    @property
    def gap_seconds(self) -> float:
        """Min seconds between retained samples (trend-o-meter:137)."""
        return 60.0 / self.samples_per_minute_retained

    @property
    def retention_days(self) -> int:
        """Retention horizon = max day bin (trend-o-meter:421-422)."""
        return max(self.day_bins)


DEFAULT_CONFIG = EngineConfig()
