"""Control plane: C2 dispatch, parameter rebind re-execution, audit log.

Reference lifecycle: trend-o-meter:171-263 (parse -> resolve -> execute ->
respond -> audit); re-exec path trend-o-meter:214-220.
"""

from __future__ import annotations

import json

from trend_o_meter_spark.config import EngineConfig
from trend_o_meter_spark.control import ControlPlane
from trend_o_meter_spark.operators import daybins


def _clock():
    t = [1000.0]

    def tick():
        t[0] += 1.0
        return t[0]

    return tick


def test_get_config_and_aliases(spark):
    cp = ControlPlane(spark, clock=_clock())
    r = cp.execute("get config")
    assert r.valid and r.ret_val["min_data_hours_to_render_bin"] == 18
    # camelCase alias, as the reference's C2 field names.
    r2 = cp.execute("get minDataHoursToRenderBin")
    assert r2.valid and r2.ret_val == 18


def test_set_rebinds_and_reexecutes(spark, events_df):
    runs = []

    def rerun(cfg: EngineConfig):
        df = daybins.day_binned_extremes(
            events_df.selectExpr("ts", "event_type as metric", "value"),
            day_bins=cfg.day_bins,
            min_data_hours=cfg.min_data_hours_to_render_bin,
        )
        runs.append(cfg.min_data_hours_to_render_bin)
        return df

    cp = ControlPlane(spark, on_rebind=rerun, clock=_clock())
    r = cp.execute("set minDataHoursToRenderBin 1")
    assert r.valid and r.ret_val == 1
    assert runs == [1]
    assert cp.config.min_data_hours_to_render_bin == 1
    # Tightening the threshold can only flip is_complete toward True.
    strict = cp.last_rebind_result
    assert strict is not None
    assert strict.filter("is_complete").count() >= 0  # executes the rebound plan


def test_set_bool_coercion(spark):
    # X5 toBool semantics (trend-o-meter:196-205): int-string -> !=0,
    # else lower(x)=='true'.
    cp = ControlPlane(spark, clock=_clock())
    assert cp.execute("set debug 1").ret_val is True
    assert cp.execute("set debug 0").ret_val is False
    assert cp.execute("set logMsgs TRUE").ret_val is True
    assert cp.execute("set logMessages nope").ret_val is False


def test_unknown_command_audited_not_cached(spark):
    cp = ControlPlane(spark, clock=_clock())
    r = cp.execute("frobnicate everything")
    assert not r.valid and r.error and r.ret_val is None
    # Unknown -> no response published/cached (trend-o-meter:232-234) ...
    assert cp.response_cache == {}
    # ... but still audited (trend-o-meter:253: logged valid or not).
    assert len(cp._audit_buffer) == 1


def test_failed_known_command_is_valid_with_error(spark):
    """Reference cmdlog semantics (trend-o-meter:236-241,256): a RESOLVED
    verb whose executor throws keeps valid=true with the error recorded
    alongside — distinct from an unknown verb (valid=false)."""
    cp = ControlPlane(spark, clock=_clock())
    r = cp.execute("set numSamples notanint")
    assert r.valid is True and r.error and r.ret_val is None
    # falsy retVal -> not cached / not tx-counted (the publish gate)
    assert cp.response_cache == {}
    assert cp.message_stats["tx"] == 0
    # and falsy-but-successful results are valid, uncached, error-free
    r2 = cp.execute("set debug 0")
    assert r2.valid is True and r2.error is None and r2.ret_val is False
    assert cp.response_cache == {}
    assert cp.message_stats["tx"] == 0


def test_audit_log_roundtrip(spark, tmp_path):
    cp = ControlPlane(spark, audit_path=str(tmp_path / "cmdlog"), clock=_clock())
    cp.execute("get config")
    cp.execute("set numSamples 10")
    cp.execute("bogus")
    assert cp.flush_audit_log() == 3
    log = cp.read_audit_log().orderBy("ts").collect()
    assert [row.valid for row in log] == [True, True, False]
    assert json.loads(log[1].ret_val) == 10
    # Response cache holds the last result per command name.
    assert "get config" in cp.response_cache
    assert cp.message_stats == {"rx": 3, "tx": 2}


def test_command_stream_dispatcher(spark, tmp_path):
    """§3.3 as a stream: commands arrive on a channel, execute in order,
    rebind parameters, and everything lands in the audit log."""
    from trend_o_meter_spark.control.plane import ControlPlane, command_stream_dispatcher

    reruns = []
    plane = ControlPlane(
        spark,
        audit_path=str(tmp_path / "audit"),
        on_rebind=lambda cfg: reruns.append(cfg.min_data_hours_to_render_bin) or None,
    )
    in_dir = tmp_path / "cmds"
    in_dir.mkdir()
    q = (
        spark.readStream.format("text")
        .load(str(in_dir))
        .writeStream.foreachBatch(command_stream_dispatcher(plane))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    (in_dir / "c0.txt").write_text(
        "get config\nset minDataHoursToRenderBin 6\nbogus verb\nget stats\n"
    )
    q.processAllAvailable()
    q.stop()

    assert plane.config.min_data_hours_to_render_bin == 6
    assert reruns == [6]  # the parameter rebind re-executed exactly once
    log = plane.read_audit_log().orderBy("ts").collect()
    assert len(log) == 4
    assert [r["valid"] for r in log] == [True, True, False, True]
    assert "unknown command" in log[2]["error"]


def test_get_stats_device_rpc_leg(spark):
    """trend-o-meter:178-183: 'get stats' issues the 'uptime' custom
    command to the display device; a working RPC reports its value, a
    failing (or absent) one reports -1 — never an error."""
    from trend_o_meter_spark.control.plane import ControlPlane

    # no device attached
    plane = ControlPlane(spark)
    assert plane.execute("get stats").ret_val["uptime"]["display"] == -1

    # working device
    plane = ControlPlane(spark, device_rpc=lambda cmd: 1234 if cmd == "uptime" else None)
    assert plane.execute("get stats").ret_val["uptime"]["display"] == 1234

    # failing device: swallowed, -1 (the reference's try/catch)
    def boom(cmd):
        raise RuntimeError("device gone")

    plane = ControlPlane(spark, device_rpc=boom)
    res = plane.execute("get stats")
    assert res.valid and res.ret_val["uptime"]["display"] == -1
    assert "reconnects" in res.ret_val


def test_get_stats_reports_reconnects_from_listener(spark):
    """trend-o-meter:277-284: restarts after the first start count as
    reconnects; the control plane reports the listener's tally."""
    from trend_o_meter_spark.control.plane import ControlPlane
    from trend_o_meter_spark.observability import ReconnectLog

    class FakeLog(ReconnectLog):
        def __init__(self, starts):
            super().__init__()
            self.starts = starts

        def reconnects(self):
            return self.starts[1:]

    plane = ControlPlane(spark, reconnect_log=FakeLog([100.0, 200.0, 300.0]))
    assert plane.execute("get stats").ret_val["reconnects"] == 2


def test_set_rolls_back_config_when_rebind_fails(spark, tmp_path):
    """A set whose rebind raises is audited with the error recorded
    (valid stays true — the verb resolved; trend-o-meter:236-241,256)
    AND leaves the config untouched — get must not report a value the
    audit log says never took effect."""
    from trend_o_meter_spark.control.plane import ControlPlane

    calls = []

    def bad_rebind(cfg):
        calls.append(cfg)
        raise RuntimeError("flagship re-exec failed")

    plane = ControlPlane(spark, on_rebind=bad_rebind)
    before = plane.get_config()["min_data_hours_to_render_bin"]
    res = plane.execute(f"set mindatahourstorenderbin {before + 5}")
    assert res.valid is True and res.error and res.ret_val is None
    assert plane.get_config()["min_data_hours_to_render_bin"] == before
    assert len(calls) == 1  # rebind saw the CANDIDATE config
    assert calls[0].min_data_hours_to_render_bin == before + 5


def test_command_dispatcher_skips_replayed_batch(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-dispatched
    batch id must not re-execute commands or duplicate audit rows, even
    across a dispatcher rebuild (the restart that causes replays)."""
    from trend_o_meter_spark.control.plane import ControlPlane, command_stream_dispatcher

    audit = str(tmp_path / "audit")
    plane = ControlPlane(spark, audit_path=audit)
    dispatch = command_stream_dispatcher(plane)
    batch = spark.createDataFrame([("get version",)], "value string")
    dispatch(batch, 0)
    n_after_first = plane.read_audit_log().count()
    dispatch(batch, 0)  # same-process replay
    # rebuilt dispatcher (post-restart) replaying the same batch id
    dispatch2 = command_stream_dispatcher(ControlPlane(spark, audit_path=audit))
    dispatch2(batch, 0)
    assert plane.read_audit_log().count() == n_after_first
    dispatch2(batch, 1)  # the NEXT batch still executes
    assert plane.read_audit_log().count() == n_after_first + 1
