"""As-of join: known answers, tie rules, null-payload atomicity."""

from __future__ import annotations

import datetime

from htm_streamer_spark.operators.asof import asof_join


def _dt(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_known_answer_and_no_future_leak(spark):
    left = spark.createDataFrame(
        [(1, 100, _dt(5)), (2, 100, _dt(15)), (3, 100, _dt(1)), (4, 200, _dt(30))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _dt(3), 9.0), (100, _dt(10), 7.0), (200, _dt(40), 5.0)],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r.event_id: r.asof_value
        for r in asof_join(left, right, "user_id", "ts", ["value"]).collect()
    }
    # e1@05 sees r@03; e2@15 sees r@10; e3@01 predates everything ->
    # null; e4@30: user 200's only purchase is AT 40 (future) -> null
    assert got == {1: 9.0, 2: 7.0, 3: None, 4: None}


def test_equal_ts_is_visible(spark):
    left = spark.createDataFrame(
        [(1, 5, _dt(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, _dt(10), 3.5)], "user_id long, ts timestamp, value double"
    )
    rows = asof_join(left, right, "user_id", "ts", ["value"]).collect()
    assert rows[0].asof_value == 3.5


def test_right_dup_ts_tiebreak_by_seq(spark):
    left = spark.createDataFrame(
        [(1, 5, _dt(20))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, _dt(10), 11, 1.0), (5, _dt(10), 99, 2.0)],
        "user_id long, ts timestamp, seq long, value double",
    )
    rows = asof_join(
        left, right, "user_id", "ts", ["seq", "value"], seq_col="seq"
    ).collect()
    assert (rows[0].asof_seq, rows[0].asof_value) == (99, 2.0)


def test_null_right_column_does_not_mix_rows(spark):
    """A right row whose payload column is null must be carried AS a
    null, not skipped back to an older row (atomic struct carry)."""
    left = spark.createDataFrame(
        [(1, 5, _dt(30))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, _dt(10), 8, 4.0), (5, _dt(20), 9, None)],
        "user_id long, ts timestamp, seq long, value double",
    )
    rows = asof_join(left, right, "user_id", "ts", ["seq", "value"]).collect()
    # latest right row is seq=9 with value null: asof_value must be
    # null (from seq 9), NOT 4.0 (stitched from seq 8)
    assert rows[0].asof_seq == 9
    assert rows[0].asof_value is None
