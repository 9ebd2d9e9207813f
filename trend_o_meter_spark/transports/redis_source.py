"""Redis-backed sources: the reference's actual I/O shapes over RESP.

Three readers mirroring the reference:

* :func:`read_history_list` — the bounded backfill scan S1:
  ``LRANGE <sensor>:<metric>:.list 0 <maxListQueryLength>`` of JSON
  ``[ts, value]`` pairs, newest first (trend-o-meter:289-290);
* :func:`poll_pubsub` — a bounded ``PSUBSCRIBE`` drain of the live
  sensor channel / firehose (trend-o-meter:446,528): collects push
  frames until a message budget or deadline, returns them as rows —
  the micro-batch form of the reference's event loop (feed it to
  ``foreachBatch`` on a timer for the continuous form);
* :func:`register_redis_history` — wires the list reader into
  ``catalog.register_source`` so ``table(spark, name)`` — and therefore
  every operator in the engine — runs unchanged over a live Redis.

Scale notes: the backfill scan is bounded BY THE REFERENCE'S OWN
CONTRACT (maxListQueryLength=14400, config/default.json:6), so the
driver-side fetch is ≤ ~14 k rows — the same cardinality the reference
holds in process memory; the rows then become a distributed DataFrame.
For unbounded keys, chunked LRANGE windows fan out per executor via the
same client.  Pub/sub has no replay (Redis drops what nobody consumed)
— exactly the reference's semantics; durable streams belong to a log
transport, which is why the engine treats this adapter as a seam, not
the only source.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession

from .resp import RespConnection, encode_command


def read_history_list(
    host: str,
    port: int,
    *,
    sensor: str,
    metric: str,
    max_len: int = 14400,
) -> list[tuple[float, float]]:
    """``LRANGE <sensor>:<metric>:.list 0 <max_len>`` -> [(ts, value)...]
    newest-first, JSON-decoded (trend-o-meter:289-290; the inclusive end
    index — up to max_len+1 rows — is reproduced faithfully)."""
    with RespConnection(host, port) as c:
        raw = c.command("LRANGE", f"{sensor}:{metric}:.list", 0, max_len) or []
    out = []
    for item in raw:
        ts, val = json.loads(item)
        out.append((float(ts), float(val)))
    return out


def history_df(
    spark: SparkSession,
    host: str,
    port: int,
    *,
    sensor: str,
    metric: str,
    max_len: int = 14400,
) -> DataFrame:
    """The backfill scan as a DataFrame ``(metric, ts TIMESTAMP, value)``
    — the long-format canonical schema every operator consumes."""
    rows = read_history_list(host, port, sensor=sensor, metric=metric, max_len=max_len)
    df = spark.createDataFrame(
        [(metric, ts, val) for ts, val in rows], "metric string, ts double, value double"
    )
    from pyspark.sql import functions as F

    return df.select("metric", F.timestamp_seconds("ts").alias("ts"), "value")


def poll_pubsub(
    host: str,
    port: int,
    *,
    pattern: str,
    max_messages: int = 1000,
    timeout: float = 5.0,
) -> list[tuple[str, bytes]]:
    """``PSUBSCRIBE <pattern>`` and drain push frames until
    ``max_messages`` arrive or ``timeout`` elapses -> [(channel, payload)].

    Push frame shape (RESP2): ``["pmessage", pattern, channel, payload]``;
    the initial ``["psubscribe", pattern, n]`` ack is consumed first."""
    out: list[tuple[str, bytes]] = []
    c = RespConnection(host, port, timeout=max(0.1, timeout))
    try:
        c.sock.sendall(encode_command("PSUBSCRIBE", pattern))
        ack = c.read_reply()
        if not (isinstance(ack, list) and ack and ack[0] == b"psubscribe"):
            raise ValueError(f"unexpected subscribe ack {ack!r}")
        deadline = time.time() + timeout
        while len(out) < max_messages and time.time() < deadline:
            c.sock.settimeout(max(0.05, deadline - time.time()))
            try:
                frame = c.read_reply()
            except (TimeoutError, OSError):
                break
            if isinstance(frame, list) and len(frame) == 4 and frame[0] == b"pmessage":
                out.append((frame[2].decode(), frame[3]))
    finally:
        c.close()
    return out


def register_redis_history(
    host: str,
    port: int,
    *,
    name: str = "sensor_history",
    sensor: str = "sensor",
    metrics: tuple[str, ...] = ("temperature",),
    max_len: int = 14400,
) -> None:
    """Route ``catalog.table(spark, name)`` through the live Redis list
    scan — the transport-parity seam made concrete: operators don't
    change, the catalog swaps the backing store."""
    from functools import reduce

    from ..catalog import register_source

    def reader(spark: SparkSession, _name: str, _sf_dir: str) -> DataFrame:
        frames = [
            history_df(spark, host, port, sensor=sensor, metric=m, max_len=max_len)
            for m in metrics
        ]
        return reduce(lambda a, b: a.unionByName(b), frames)

    register_source(name, reader)
