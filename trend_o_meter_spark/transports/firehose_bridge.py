"""Durable firehose bridge: RESP2 pub/sub -> append-only segment log.

The live Spark 4 DataSource (:mod:`..streaming.redis_datasource`) reads
the pub/sub bus directly, but the bus itself has NO replay — Redis
drops what nobody consumed, so that reader is honestly AT-MOST-ONCE
across restarts (its ``readBetweenOffsets`` returns the empty range on
restart recovery, by design).  At 1000-executor scale a restart gap is
routine, so SCALE.md routes durable feeds through a replayable log.
This module is that recipe as executable code:

* :class:`DurableFirehoseBridge` — a driver-side drain process that
  holds ONE long-lived PSUBSCRIBE connection and appends every push
  frame to JSONL SEGMENT files, published atomically (write to a
  dot-prefixed temp name Spark's file listings ignore, fsync, then
  ``os.rename``) so a reader never observes a half-written segment;
* :func:`bridge_stream` — the Spark side: a plain file streaming
  source over the segment directory.  Files are immutable once
  published, so Spark's own checkpointing makes the handoff
  EXACTLY-ONCE across reader restarts: frames drained while NO reader
  was running wait in segments, and a restarted query resumes from its
  checkpoint without loss or duplication (test-pinned against the raw
  DataSource's documented drop).

The durability window starts when the bridge subscribes — pub/sub
cannot re-serve frames published while the BRIDGE itself was down
(that residual gap belongs to the publisher; the reference's own bus
semantics, trend-o-meter:446).  Deploy the bridge as a tiny supervised
process per bus, segments on shared/object storage; Spark readers come
and go freely.  Kafka occupies the same seam — the segment log is the
dependency-free stand-in with identical replay semantics.
"""

from __future__ import annotations

import json
import os
import select
import time
from pathlib import Path

from .resp import RespConnection, encode_command

BRIDGE_SCHEMA = "channel string, payload string, recv_ts double"
_SEG_PREFIX = "seg-"


class DurableFirehoseBridge:
    """Drain ``PSUBSCRIBE pattern`` into ``log_dir`` segment files.

    One call to :meth:`drain_segment` collects frames for at most
    ``poll_seconds`` (or until ``max_messages``) and publishes them as
    one immutable segment; call it in a loop (or from a scheduler) for
    the continuous form.  The subscription survives across calls — no
    frames are lost BETWEEN segments."""

    def __init__(
        self,
        host: str,
        port: int,
        *,
        pattern: str = "*",
        log_dir: str,
        poll_seconds: float = 0.5,
        max_messages: int = 10_000,
    ) -> None:
        self.host, self.port, self.pattern = host, int(port), pattern
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.poll_seconds = float(poll_seconds)
        self.max_messages = int(max_messages)
        self._conn: RespConnection | None = None

    # -- wire (same select-gated drain discipline as the raw DataSource) --

    def _ensure_conn(self) -> RespConnection:
        if self._conn is None:
            c = RespConnection(self.host, self.port, timeout=10.0)
            c.sock.sendall(encode_command("PSUBSCRIBE", self.pattern))
            ack = c.read_reply()
            if not (isinstance(ack, list) and ack and ack[0] == b"psubscribe"):
                raise ValueError(f"unexpected subscribe ack {ack!r}")
            self._conn = c
        return self._conn

    def _drain(self, budget: int, window: float) -> list[tuple[str, str, float]]:
        c = self._ensure_conn()
        out: list[tuple[str, str, float]] = []
        deadline = time.time() + window
        base_timeout = c.sock.gettimeout()
        c.sock.settimeout(1.0)  # per-frame stall bound inside read_reply
        try:
            while len(out) < budget:
                wait = deadline - time.time()
                if wait <= 0:
                    break
                if not c._buf:
                    r, _, _ = select.select([c.sock], [], [], wait)
                    if not r:
                        break
                mark = c._consumed
                try:
                    frame = c.read_reply()
                except (TimeoutError, OSError):
                    if c._consumed != mark:
                        # read_reply already split the `*4` header / early
                        # bulk elements off the stream before stalling: the
                        # bytes that remain start MID-FRAME, so reusing this
                        # connection would parse garbage (RespError crash or
                        # silently dropped frames).  Drop it; the next drain
                        # resubscribes on a fresh frame-aligned connection.
                        # (The resubscribe gap is the same publisher-side
                        # window as bridge downtime, documented above.)
                        self.close()
                    break
                if (
                    isinstance(frame, list)
                    and len(frame) == 4
                    and frame[0] == b"pmessage"
                ):
                    out.append(
                        (
                            frame[2].decode(),
                            frame[3].decode(errors="replace"),
                            time.time(),
                        )
                    )
        finally:
            if self._conn is not None:
                # restore the constructor's timeout — the 1 s drain bound
                # must not leak into _ensure_conn's subscribe handshake
                self._conn.sock.settimeout(base_timeout)
        return out

    # -- segments ----------------------------------------------------------

    def _next_segment_index(self) -> int:
        idx = -1
        for p in self.log_dir.glob(f"{_SEG_PREFIX}*.jsonl"):
            try:
                idx = max(idx, int(p.stem[len(_SEG_PREFIX):]))
            except ValueError:
                continue
        return idx + 1

    def drain_segment(
        self, *, max_messages: int | None = None, poll_seconds: float | None = None
    ) -> int:
        """One bounded drain -> at most one atomically-published segment.
        Returns the number of frames published (0 writes no file)."""
        rows = self._drain(
            max_messages or self.max_messages,
            self.poll_seconds if poll_seconds is None else float(poll_seconds),
        )
        if not rows:
            return 0
        seg = self.log_dir / f"{_SEG_PREFIX}{self._next_segment_index():012d}.jsonl"
        tmp = seg.with_name("." + seg.name + ".tmp")  # dot-prefixed: invisible to Spark
        with open(tmp, "w") as fh:
            for chan, payload, ts in rows:
                fh.write(
                    json.dumps(
                        {"channel": chan, "payload": payload, "recv_ts": ts}
                    )
                    + "\n"
                )
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, seg)  # atomic publish: readers see whole segments only
        return len(rows)

    def close(self) -> None:
        if self._conn is not None:
            try:
                self._conn.close()
            except OSError:
                pass
            self._conn = None

    def __enter__(self) -> "DurableFirehoseBridge":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def bridge_stream(spark, log_dir: str):
    """Streaming DataFrame over the bridge's segment log — a plain file
    source, so Spark's checkpointing gives exactly-once delivery across
    reader restarts (the property the raw pub/sub DataSource cannot
    offer).  Schema: ``channel, payload, recv_ts``; feed ``payload``
    to the same S2 envelope decode as every other source
    (``streaming.sources.decode_sensor_stream``)."""
    return (
        spark.readStream.schema(BRIDGE_SCHEMA)
        .option("pathGlobFilter", f"{_SEG_PREFIX}*.jsonl")
        .json(str(log_dir))
    )


def bridge_table(spark, log_dir: str):
    """Batch view of the same log (backfill / audit)."""
    return (
        spark.read.schema(BRIDGE_SCHEMA)
        .option("pathGlobFilter", f"{_SEG_PREFIX}*.jsonl")
        .json(str(log_dir))
    )
