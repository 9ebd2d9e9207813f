"""C2 command dispatcher: parse -> resolve -> execute -> respond -> audit.

Faithful to the reference lifecycle (trend-o-meter:171-263):

- commands are whitespace-tokenized text, first token selects the verb
  (``split(/\\s+/)``, trend-o-meter:173);
- ``get <field>`` reads from a getter registry (config / stats,
  trend-o-meter:175-211);
- ``set <field> <value>`` rebinds an engine parameter; setting
  ``minDataHoursToRenderBin`` re-executes the flagship day-bin query with
  the new literal (trend-o-meter:213-227) — a parameterized prepared
  query, Catalyst re-plans in milliseconds;
- unknown verbs/fields produce an error result with no return value
  (trend-o-meter:232-234);
- every invocation — valid or not — is appended to the command log
  (trend-o-meter:253-262: ``{ts, valid, message, retVal, error}``), and
  the last successful response per command name is cached
  (trend-o-meter:245-248: the HSET response hash).

The audit log is an append-only parquet table so it scales like any
other engine table (at 100 TB the cmdlog is still tiny, but it shares
the same storage/query path — query it back with ``read_audit_log``).
Boolean-ish ``set`` values go through the same coercion as the reference
(X5 ``toBool``, trend-o-meter:196-205), implemented driver-side here to
mirror :func:`trend_o_meter_spark.functions.to_bool`.
"""

from __future__ import annotations

import dataclasses
import json
import re
import time
import uuid
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from ..config import EngineConfig
from ..schemas import AUDIT_LOG_SCHEMA


def _js_truthy(value: Any) -> bool:
    """JS truthiness of a command return value — the reference's publish
    gate is ``if (retVal)`` (trend-o-meter:243): undefined/null/false/0/
    ''/NaN are falsy; objects and arrays (even empty) are truthy."""
    import math

    if value is None or value is False:
        return False
    if isinstance(value, bool):
        return value
    if isinstance(value, (int, float)):
        return value != 0 and not (isinstance(value, float) and math.isnan(value))
    if isinstance(value, str):
        return len(value) > 0
    return True


def _to_bool(value: str) -> bool:
    """Driver-side mirror of functions.to_bool (trend-o-meter:196-205):
    JS parseInt takes a leading-integer prefix ('1.5'/'2abc' truthy,
    '0rest' falsy), else lower(x)=='true'."""
    import re

    m = re.match(r"^\s*([+-]?\d+)", str(value)) if value is not None else None
    if m:
        return any(ch in "123456789" for ch in m.group(1))
    return str(value).lower() == "true"


@dataclass(frozen=True)
class CommandResult:
    ts: float
    valid: bool
    message: str
    ret_val: Any
    error: str | None

    def to_json(self) -> str:
        return json.dumps(
            {
                "ts": self.ts,
                "valid": self.valid,
                "message": self.message,
                "retVal": self.ret_val,
                "error": self.error,
            },
            default=str,
        )


# Field-name aliases the reference accepts (logMsgs/logMessages,
# trend-o-meter:222-225) plus camelCase -> our snake_case config names.
_FIELD_ALIASES = {
    "mindatahourstorenderbin": "min_data_hours_to_render_bin",
    "samplesperminuteretained": "samples_per_minute_retained",
    "maxlistquerylength": "max_list_query_length",
    "numsamples": "num_samples",
    "alternateevery": "alternate_every",
    "daybins": "day_bins",
    "logmsgs": "log_messages",
    "logmessages": "log_messages",
    "debug": "debug",
}

_INT_FIELDS = {"min_data_hours_to_render_bin", "max_list_query_length",
               "num_samples", "alternate_every"}
_FLOAT_FIELDS = {"samples_per_minute_retained"}
_BOOL_FIELDS = {"debug", "log_messages"}


class ControlPlane:
    """Two-verb (``get``/``set``) control surface over the engine config.

    ``on_rebind`` is invoked after any ``set`` that changes a query
    parameter; it receives the new :class:`EngineConfig` and may re-run
    the flagship query (the reference's re-exec path,
    trend-o-meter:214-220).  Its DataFrame result (if any) is kept on
    ``last_rebind_result`` for the caller/sink.
    """

    def __init__(
        self,
        spark: SparkSession,
        config: EngineConfig | None = None,
        *,
        audit_path: str | None = None,
        on_rebind: Callable[[EngineConfig], DataFrame | None] | None = None,
        clock: Callable[[], float] = time.time,
        device_rpc: Callable[[str], Any] | None = None,
        reconnect_log: Any | None = None,
    ) -> None:
        self.spark = spark
        self.config = config or EngineConfig()
        self.audit_path = audit_path
        self.on_rebind = on_rebind
        self.clock = clock
        # Optional device command channel (the reference's
        # display.issueCustomCommand, trend-o-meter:178-183): a callable
        # taking the command name.  None = no device attached.
        self.device_rpc = device_rpc
        # Reference's reconnect counter (:186-190,:277).  Wire an
        # observability.ReconnectLog (stream lifecycle listener) to report
        # actual query restarts; without one the counter stays manual.
        self.reconnect_log = reconnect_log
        self.reconnects = 0
        # Ephemeral 8-char app id, as the reference (uuid at trend-o-meter:115).
        self.app_id = uuid.uuid4().hex[:8]
        self.started_at = clock()
        # Runtime flags (C2-settable, not query parameters).
        self.flags: dict[str, bool] = {"debug": False, "log_messages": False}
        # Last successful response per command name (the HSET hash,
        # trend-o-meter:245-248).
        self.response_cache: dict[str, str] = {}
        self.last_rebind_result: DataFrame | None = None
        self._audit_buffer: list[CommandResult] = []
        self.message_stats = {"rx": 0, "tx": 0}

    # -- getters (trend-o-meter:175-211) ---------------------------------

    def get_config(self) -> dict[str, Any]:
        out = dataclasses.asdict(self.config)
        out["day_bins"] = list(self.config.day_bins)
        return out

    def get_stats(self) -> dict[str, Any]:
        """trend-o-meter:177-194: uptime (app + device RPC) + counters.

        The display-uptime leg mirrors the reference exactly: issue the
        ``uptime`` custom command over ``device_rpc`` and report ``-1``
        when there is no device or the RPC fails
        (``issueCustomCommand('uptime')`` in a try/catch, :178-183).
        """
        device_uptime: Any = -1
        if self.device_rpc is not None:
            try:
                device_uptime = self.device_rpc("uptime")
            except Exception:  # noqa: BLE001 — reference logs and returns -1
                device_uptime = -1
        progresses = [
            q.lastProgress for q in self.spark.streams.active if q.lastProgress
        ]
        n_reconnects = (
            len(self.reconnect_log.reconnects())
            if self.reconnect_log is not None
            else self.reconnects
        )
        return {
            "uptime": {"app": self.clock() - self.started_at, "display": device_uptime},
            "reconnects": n_reconnects,
            "messages": dict(self.message_stats),
            "streaming_input_rows": sum(
                int(p.get("numInputRows", 0)) for p in progresses
            ),
            "active_streams": len(self.spark.streams.active),
        }

    # -- dispatch (trend-o-meter:228-262) --------------------------------

    def execute(self, message: str) -> CommandResult:
        self.message_stats["rx"] += 1
        ts = self.clock()
        tokens = re.split(r"\s+", message.strip()) if message.strip() else []
        verb = tokens[0].lower() if tokens else ""
        if verb == "get":
            executor: Callable[[list[str]], Any] | None = self._do_get
        elif verb == "set":
            executor = self._do_set
        else:
            executor = None
        if executor is None:
            # Unknown verb: valid=false, exactly the reference's
            # `valid: !!executor` (trend-o-meter:232-234,256).  We keep a
            # diagnostic error string where the reference leaves error
            # undefined — strictly more information, same flag.
            result = CommandResult(ts, False, message, None, f"unknown command: {verb!r}")
        else:
            try:
                result = CommandResult(ts, True, message, executor(tokens[1:]), None)
            except Exception as exc:  # noqa: BLE001 — every failure is audited
                # Resolved verb whose executor threw: the reference keeps
                # valid=true and records the error ALONGSIDE
                # (trend-o-meter:236-241,256) — so cmdlog consumers can
                # tell "no such command" from "command failed".
                result = CommandResult(ts, True, message, None, str(exc))
        if _js_truthy(result.ret_val):
            # Cache + tx gate mirrors the reference's publish gate: only
            # a JS-truthy retVal is HSET/published/tx-counted
            # (trend-o-meter:243-250).  The cache key is verb+field —
            # deliberately FINER than the reference's verb-only HSET
            # field (under which every `get X` overwrites `get config`);
            # the wire bridge (transports/c2_bridge.py) uses the faithful
            # verb-only field.
            cache_key = " ".join(tokens[:2]).lower()
            self.response_cache[cache_key] = result.to_json()
            self.message_stats["tx"] += 1
        self._audit_buffer.append(result)
        return result

    def _do_get(self, args: list[str]) -> Any:
        if not args:
            raise ValueError("get requires a field")
        field = args[0].lower()
        if field == "config":
            return self.get_config()
        if field == "stats":
            return self.get_stats()
        key = _FIELD_ALIASES.get(field, field)
        if key in self.flags:
            return self.flags[key]
        cfg = self.get_config()
        if key in cfg:
            return cfg[key]
        raise ValueError(f"unknown get field: {args[0]!r}")

    def _do_set(self, args: list[str]) -> Any:
        if len(args) < 2:
            raise ValueError("set requires a field and a value")
        field, raw = args[0].lower(), args[1]
        key = _FIELD_ALIASES.get(field, field)
        if key in _BOOL_FIELDS:
            self.flags[key] = _to_bool(raw)
            return self.flags[key]
        if key in _INT_FIELDS:
            value: Any = int(raw)
        elif key in _FLOAT_FIELDS:
            value = float(raw)
        elif key == "day_bins":
            value = tuple(int(x) for x in raw.split(","))
        else:
            raise ValueError(f"unknown set field: {args[0]!r}")
        new_config = dataclasses.replace(self.config, **{key: value})
        if self.on_rebind is not None:
            # Parameter rebind + re-execution (trend-o-meter:214-220).
            # Rebind runs against the CANDIDATE config and must succeed
            # before the plane adopts it: a failed set is audited invalid
            # AND leaves the config untouched — otherwise 'get' would
            # report a value the audit log says never took effect.
            self.last_rebind_result = self.on_rebind(new_config)
        self.config = new_config
        return value

    # -- audit log (trend-o-meter:253-262) -------------------------------

    def flush_audit_log(self) -> int:
        """Append buffered command results to the audit parquet table."""
        if not self._audit_buffer or self.audit_path is None:
            n = len(self._audit_buffer)
            self._audit_buffer.clear()
            return n
        rows = [
            (
                r.ts,
                r.valid,
                r.message,
                json.dumps(r.ret_val, default=str) if r.ret_val is not None else None,
                r.error,
            )
            for r in self._audit_buffer
        ]
        df = self.spark.createDataFrame(rows, schema=AUDIT_LOG_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.audit_path)
        n = len(self._audit_buffer)
        self._audit_buffer.clear()
        return n

    def read_audit_log(self) -> DataFrame:
        if self.audit_path is None:
            raise ValueError("no audit_path configured")
        return self.spark.read.schema(AUDIT_LOG_SCHEMA).parquet(self.audit_path)


def command_stream_dispatcher(
    plane: ControlPlane, *, message_col: str = "value", order_col: str | None = None
):
    """Wire the C2 channel as a stream (§3.3): ``foreachBatch`` function
    dispatching each micro-batch's command messages through the plane.

    Control messages are tiny and inherently serial (a ``set`` must apply
    before the next command sees its effect), so the batch is collected
    to the driver and executed in order — O(commands), never O(data); the
    same stance as the reference's single-threaded handler
    (trend-o-meter:171-263).  Every batch ends with an audit-log flush.

    Replay guard: ``foreachBatch`` is at-least-once, and dispatching
    mutates plane state and APPENDS audit rows — so a replayed batch id
    (same id re-delivered after a crash before the checkpoint commit)
    is skipped rather than re-executed.  The guard persists next to the
    audit log (``<audit_path>/_last_batch_id``, written after the
    flush) so it survives the restart that causes the replay; without
    an audit path it is in-memory only (no restart -> no replay risk
    beyond the process lifetime).
    """
    import pathlib

    marker = (
        pathlib.Path(plane.audit_path) / "_last_batch_id"
        if plane.audit_path is not None
        else None
    )
    state = {"last": -1}
    if marker is not None and marker.exists():
        try:
            state["last"] = int(marker.read_text().strip())
        except ValueError:
            pass

    def dispatch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state["last"]:
            return  # at-least-once replay of an already-dispatched batch
        rows = batch_df.collect()
        if order_col is not None:
            rows = sorted(rows, key=lambda r: r[order_col])
        for r in rows:
            msg = r[message_col]
            if msg is not None:
                plane.execute(str(msg))
        plane.flush_audit_log()
        state["last"] = batch_id
        if marker is not None:
            marker.parent.mkdir(parents=True, exist_ok=True)
            marker.write_text(str(batch_id))

    return dispatch
