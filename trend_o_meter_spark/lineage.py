"""Lineage-cut helper: ``localCheckpoint`` that the plan audit can see through.

Several batch operators materialize a multi-consumer intermediate once
via ``localCheckpoint`` (exact_quantiles' counts, the dedup gram table,
the graph-iteration frontiers): without it, each downstream consumer
re-derives the whole upstream subtree — mad_anomalies showed 36+ scans
of the same table before the cut.  The cost of the cut is that the
checkpointed plan is OPAQUE: ``.explain`` shows ``Scan ExistingRDD``
and everything upstream disappears from the very plan audit meant to
police scan counts and shuffle shapes (VERDICT r08 finding 1).

``cut(df)`` behaves exactly like ``df.localCheckpoint(eager=...)``
unless the environment variable ``SPARK_GRAFT_NO_CHECKPOINT`` is set,
in which case it returns ``df`` unchanged so ``tools/plan_audit.py``
can explain the full pre-checkpoint lineage (true scan counts, true
exchange counts).  The variable is an AUDIT hook only — never set it
for real runs: without the cut, multi-consumer lineages re-execute per
consumer and iterative operators (pagerank, connected components) keep
their entire history in one nested plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

AUDIT_ENV = "SPARK_GRAFT_NO_CHECKPOINT"


def cut(df: DataFrame, *, eager: bool = False) -> DataFrame:
    """``df.localCheckpoint(eager=eager)``, or ``df`` unchanged when
    ``SPARK_GRAFT_NO_CHECKPOINT`` is set (plan-audit mode)."""
    if os.environ.get(AUDIT_ENV):
        return df
    return df.localCheckpoint(eager=eager)
