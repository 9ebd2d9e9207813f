"""Continuous pub/sub tail as a Spark 4 Python streaming DataSource.

The reference's runtime is an UNBOUNDED event loop: PSUBSCRIBE to the
sensor bus and process frames forever (trend-o-meter:382,446-450).  The
bounded drain (:func:`..transports.redis_source.poll_pubsub`) covers
parity tests; this module makes the backfill-and-tail shape run as ONE
long-lived Structured Streaming query:

    spark.dataSource.register(RedisPubSubDataSource)
    stream = (spark.readStream.format("redis_pubsub")
              .option("host", h).option("port", p)
              .option("pattern", "sensor").load())
    readings = pubsub_readings(stream)          # S2 envelope decode
    ...stream_day_bins(readings, ...)           # the live loop

Implementation notes (simple-reader API, driver-side by design):

* ``SimpleDataSourceStreamReader.read`` runs on the DRIVER — correct
  for a pub/sub bus: Redis delivers each message to each SUBSCRIBED
  connection once, so the consumer must be a single persistent
  subscription, not a per-executor fan-out.  Rows are then distributed;
  all downstream work (decode, downsample, day-bins) is cluster-side.
  Throughput ceiling is the bus itself, same as the reference's
  single-connection event loop.
* The subscription socket is created lazily on first ``read`` and held
  across micro-batches (a fresh PSUBSCRIBE per batch would DROP frames
  published between batches — Redis pub/sub only delivers to connected
  subscribers).
* Offsets count consumed frames.  Within a run, Spark's simple-reader
  wrapper caches prefetched batches for retry; across a RESTART the bus
  cannot replay (Redis drops what nobody consumed — the reference has
  the same at-most-once semantics, SURVEY §2.2 F6/F7), so
  ``readBetweenOffsets`` for an un-cached range returns empty rather
  than pretending.  Durable replay belongs to a log transport (Kafka),
  which this source deliberately does not impersonate.
* Optional one-shot BACKFILL: ``backfill_key`` LRANGEs the history list
  (the reference's S1 scan, trend-o-meter:289-290) into the FIRST batch
  before tailing — the reference's own startup sequence.
"""

from __future__ import annotations

import json
import select
import time
from typing import TYPE_CHECKING, Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

PUBSUB_SCHEMA = "seq BIGINT, channel STRING, payload STRING"


class RedisPubSubDataSource(DataSource):
    """``format("redis_pubsub")`` — options:

    host, port (required); pattern (PSUBSCRIBE glob, default ``*``);
    poll_seconds (per-batch drain window, default 0.2);
    max_per_batch (admission cap per micro-batch, default 10000);
    backfill_key / backfill_max (optional LRANGE backfill into batch 0).
    """

    @classmethod
    def name(cls) -> str:
        return "redis_pubsub"

    def schema(self) -> str:
        return PUBSUB_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> "_PubSubReader":
        return _PubSubReader(self.options)


class _PubSubReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.host = options["host"]
        self.port = int(options["port"])
        self.pattern = options.get("pattern", "*")
        self.poll_seconds = float(options.get("poll_seconds", "0.2"))
        self.max_per_batch = int(options.get("max_per_batch", "10000"))
        self.backfill_key = options.get("backfill_key")
        self.backfill_max = int(options.get("backfill_max", "14400"))
        self._conn = None

    # -- offsets -----------------------------------------------------------

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def commit(self, end: dict) -> None:  # nothing to ack on a fire-and-forget bus
        pass

    # -- wire --------------------------------------------------------------

    def _ensure_conn(self):
        from ..transports.resp import RespConnection, encode_command

        if self._conn is None:
            c = RespConnection(self.host, self.port, timeout=10.0)
            c.sock.sendall(encode_command("PSUBSCRIBE", self.pattern))
            ack = c.read_reply()
            if not (isinstance(ack, list) and ack and ack[0] == b"psubscribe"):
                raise ValueError(f"unexpected subscribe ack {ack!r}")
            self._conn = c
        return self._conn

    def _drain(self, budget: int) -> list[tuple[str, str]]:
        """Collect up to ``budget`` push frames within the poll window.

        ``select`` gates each parse so the window can close without a
        blocking read mid-frame; once bytes are readable the frame is
        parsed to completion (1 s mid-frame allowance)."""
        c = self._ensure_conn()
        out: list[tuple[str, str]] = []
        deadline = time.time() + self.poll_seconds
        while len(out) < budget:
            wait = deadline - time.time()
            if wait <= 0:
                break
            if not c._buf:  # no buffered bytes: block at most `wait`
                r, _, _ = select.select([c.sock], [], [], wait)
                if not r:
                    break
            c.sock.settimeout(1.0)
            try:
                frame = c.read_reply()
            except (TimeoutError, OSError):
                break
            if isinstance(frame, list) and len(frame) == 4 and frame[0] == b"pmessage":
                out.append((frame[2].decode(), frame[3].decode(errors="replace")))
        return out

    def _backfill_rows(self) -> list[tuple[str, str]]:
        """One-shot LRANGE backfill, re-shaped as envelope payloads so
        batch 0 flows through the same decode as the tail.  The list
        holds newest-first ``[ts, value]`` pairs (trend-o-meter:289);
        the metric name is the middle segment of ``<sensor>:<metric>:.list``."""
        from ..transports.resp import RespConnection

        key = self.backfill_key
        parts = key.split(":")
        sensor = parts[0] if len(parts) > 2 else "sensor"
        metric = parts[1] if len(parts) > 2 else "value"
        with RespConnection(self.host, self.port, timeout=10.0) as c:
            raw = c.command("LRANGE", key, 0, self.backfill_max) or []
        rows = []
        for item in raw:
            ts, val = json.loads(item)
            rows.append(
                (key, json.dumps({"ts": ts, "source": sensor, "value": {metric: val}}))
            )
        return rows

    # -- reads -------------------------------------------------------------

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        seq = int(start["seq"])
        rows: list[tuple[str, str]] = []
        if seq == 0 and self.backfill_key:
            rows.extend(self._backfill_rows())
        # subscribe BEFORE the backfill scan would be even safer against
        # the publish/scan race; _ensure_conn is idempotent so do it now
        # regardless of whether the drain budget is already spent
        self._ensure_conn()
        if len(rows) < self.max_per_batch:
            rows.extend(self._drain(self.max_per_batch - len(rows)))
        out = [(seq + i, chan, payload) for i, (chan, payload) in enumerate(rows)]
        return iter(out), {"seq": seq + len(out)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # Only reached on RESTART recovery for a batch Spark's own cache
        # lost: a pub/sub bus cannot re-serve dropped frames, so the
        # honest answer is the empty range (at-most-once across
        # restarts — the reference's own semantics).
        return iter([])

    def __getstate__(self):  # the socket never travels; reads are driver-side
        state = dict(self.__dict__)
        state["_conn"] = None
        return state


def pubsub_readings(stream: "DataFrame") -> "DataFrame":
    """Decode the raw ``(seq, channel, payload)`` tail into canonical
    long-format readings via the S2 envelope decoder — the same
    expressions every other source uses."""
    from .sources import decode_sensor_stream

    return decode_sensor_stream(stream, payload_col="payload")
