"""Property-based interval-join parity: hypothesis generates arbitrary
keyed, timestamped sides (boundary-equal times, duplicate timestamps,
keys present on one side only); the batch twin of the stream-stream
interval join must match a brute-force nested-loop reference."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from htm_streamer_spark.streaming.joins import interval_join_streams

BASE = datetime.datetime(2024, 1, 1)

row = st.fixed_dictionaries(
    {"key": st.integers(0, 2), "minute": st.integers(0, 25)}
)
tables = st.tuples(
    st.lists(row, min_size=1, max_size=10),
    st.lists(row, min_size=0, max_size=10),
)

LOWER_MIN, UPPER_MIN = 0, 10


def reference_pairs(lrows, rrows):
    out = set()
    for li, l in enumerate(lrows):
        for ri, r in enumerate(rrows):
            if l["key"] != r["key"]:
                continue
            d = r["minute"] - l["minute"]
            if LOWER_MIN <= d <= UPPER_MIN:
                out.add((li, ri))
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tables)
def test_interval_join_matches_nested_loop(spark, tabs):
    lrows, rrows = tabs
    left = spark.createDataFrame(
        [
            (i, str(r["key"]), BASE + datetime.timedelta(minutes=r["minute"]))
            for i, r in enumerate(lrows)
        ],
        "l_id long, key string, l_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (i, str(r["key"]), BASE + datetime.timedelta(minutes=r["minute"]))
            for i, r in enumerate(rrows)
        ],
        "r_id long, key string, r_ts timestamp",
    )
    out = interval_join_streams(
        left, right, "key",
        left_ts="l_ts", right_ts="r_ts",
        lower=f"{LOWER_MIN} minutes", upper=f"{UPPER_MIN} minutes",
        watermark=None,
    )
    got = {(r.l_id, r.r_id) for r in out.collect()}
    assert got == reference_pairs(lrows, rrows)
