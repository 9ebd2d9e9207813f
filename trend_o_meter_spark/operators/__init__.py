"""Timeseries + relational operators (SURVEY §2).

Every operator is a pure function ``DataFrame -> DataFrame`` parameterized
by the reference's config tunables, usable identically from batch and
(where semantics allow) streaming plans.
"""

from .daybins import day_binned_extremes
from .downsample import downsample_anchored, downsample_fixed_grid
from .rolling import rolling_current_average, tumbling_mean
from .rates import active_channels, sessionize, sliding_rates
from .retention import retain_window
from .topk import top_k_recent
from .asof import asof_join

__all__ = [
    "day_binned_extremes",
    "downsample_fixed_grid",
    "downsample_anchored",
    "rolling_current_average",
    "tumbling_mean",
    "sliding_rates",
    "active_channels",
    "sessionize",
    "retain_window",
    "top_k_recent",
    "asof_join",
]
