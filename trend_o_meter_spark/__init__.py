"""trend_o_meter_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference streaming trend monitor
(rpj/trend-o-meter), re-expressed Spark-first.

The reference (/root/reference/trend-o-meter, 555 LoC of Node.js) is a
single-metric streaming timeseries trend monitor: Redis-list backfill +
pub/sub tail, day-binned min/max extremes, rolling averages, sliding
msgs-per-second rates, session-style active-channel tracking, and a tiny
get/set control plane.  This package generalizes those semantics to
arbitrary scale on Spark: every operator is a pure function
``DataFrame -> DataFrame`` built on the declarative DataFrame API so
Catalyst/Tungsten pick the physical plan, plus the LLM-data-pipeline
surface (dedup, similarity search, text analysis, multimodal columns)
required of a modern 100 TB training-data engine.

Layout:
    session.py    SparkSession builder + runtime tuning knobs
    config.py     typed engine config mirroring the reference's config/default.json
    catalog.py    logical-table name -> storage mapping
    functions.py  scalar function library (reference §2.8 X1-X12)
    operators/    timeseries + relational operators (SURVEY §2)
    llm/          dedup / similarity / text-analysis / multimodal
    streaming/    Structured Streaming pipelines (SURVEY §2.9)
    control/      C2 get/set control plane + audit log (SURVEY §2.10)
    workload.py   the oracle-checked query registry exported via __spark_entry__
"""

__version__ = "0.1.0"
