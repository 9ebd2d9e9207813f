"""A9 running counters (observability.py)."""

import json

from pyspark.sql import functions as F

from trend_o_meter_spark.observability import ReconnectLog, observed
from trend_o_meter_spark.streaming.sources import decode_sensor_stream


def test_observed_batch_counters(spark):
    msgs = [
        json.dumps({"ts": 1_700_000_000 + i, "source": "s", "value": {"temperature": float(i)}})
        for i in range(10)
    ] + ["{broken"]
    df = spark.createDataFrame([(m,) for m in msgs], ["value"])
    decoded = decode_sensor_stream(df)
    obs_df, obs = observed(decoded, size_col="corrupt", corrupt_col="corrupt")
    n = obs_df.count()  # action materializes the observation
    assert n == 11
    got = obs.get
    assert got["rx_rows"] == 11
    assert got["corrupt_rows"] == 1
    assert got["rx_bytes"] == len("{broken")  # only the corrupt row has bytes here


def test_observed_streaming_progress(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    raw = spark.readStream.format("text").load(str(in_dir))
    obs_df, obs = observed(raw, name="ingest")
    assert obs is None  # streaming path: named observe
    q = (
        obs_df.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    (in_dir / "a.txt").write_text("x\ny\nz\n")
    q.processAllAvailable()
    progresses = [p for p in (q.recentProgress or []) if p.get("observedMetrics")]
    q.stop()
    rows = sum(p["observedMetrics"]["ingest"]["rx_rows"] for p in progresses)
    assert rows == 3


def test_reconnect_log(spark, tmp_path):
    import time

    log = ReconnectLog()
    spark.streams.addListener(log)
    try:
        for _ in range(2):  # start/stop twice == one reconnect
            q = (
                spark.readStream.format("rate")
                .option("rowsPerSecond", "1")
                .load()
                .writeStream.format("noop")
                .queryName("reconnect_probe")
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(10)

        # Listener events are delivered asynchronously on the JVM listener
        # bus; poll with a deadline instead of asserting immediately.
        def _settled():
            kinds = [k for _, _, k in log.events]
            return (
                len(log.reconnects()) >= 1
                and kinds.count("start") >= 2
                and kinds.count("terminate") >= 1
            )

        deadline = time.monotonic() + 30.0
        while not _settled() and time.monotonic() < deadline:
            time.sleep(0.2)
        assert len(log.reconnects()) >= 1
        kinds = [k for _, _, k in log.events]
        assert kinds.count("start") >= 2 and kinds.count("terminate") >= 1
    finally:
        spark.streams.removeListener(log)


def test_reconnects_count_same_name_restarts_only():
    """Three distinct queries starting once = zero reconnects; a repeat
    start of an existing name = one reconnect."""
    from trend_o_meter_spark.observability import ReconnectLog

    log = ReconnectLog()
    for i, name in enumerate(["q1", "q2", "q3"]):
        log.events.append((float(i), name, "start"))
    assert log.reconnects() == []
    log.events.append((10.0, "q2", "start"))
    assert log.reconnects() == [10.0]
