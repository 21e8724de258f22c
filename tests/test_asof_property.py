"""Property-based as-of-join parity: hypothesis generates arbitrary
small event/label tables (duplicate timestamps, keys with no labels,
boundary-equal times); the Spark union-sort formulation must match
pandas.merge_asof (direction='backward', allow_exact_matches=True)
row-for-row on every one."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from htm_streamer_spark.operators.asof import asof_join

BASE = datetime.datetime(2024, 1, 1)

row_l = st.fixed_dictionaries(
    {"key": st.integers(0, 3), "minute": st.integers(0, 30)}
)
row_r = st.fixed_dictionaries(
    {"key": st.integers(0, 3), "minute": st.integers(0, 30), "value": st.integers(-5, 5)}
)
tables = st.tuples(
    st.lists(row_l, min_size=1, max_size=12),
    st.lists(row_r, min_size=0, max_size=12),
)


def _ts(m):
    return BASE + datetime.timedelta(minutes=m)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(tables)
def test_asof_matches_pandas_merge_asof(spark, tabs):
    lrows, rrows = tabs
    left = spark.createDataFrame(
        [(i, r["key"], _ts(r["minute"])) for i, r in enumerate(lrows)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(r["key"], _ts(r["minute"]), i, float(r["value"])) for i, r in enumerate(rrows)],
        "user_id long, ts timestamp, seq long, value double",
    )
    got = (
        asof_join(left, right, "user_id", "ts", ["value"], seq_col="seq")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    lp = pd.DataFrame(
        {
            "event_id": range(len(lrows)),
            "user_id": [r["key"] for r in lrows],
            "ts": [_ts(r["minute"]) for r in lrows],
        }
    )
    rp = pd.DataFrame(
        {
            "user_id": [r["key"] for r in rrows],
            "ts": [_ts(r["minute"]) for r in rrows],
            "seq": range(len(rrows)),
            "value": [float(r["value"]) for r in rrows],
        }
    )
    # same dedup rule as the operator: max seq per (key, ts)
    if len(rp):
        rp = (
            rp.sort_values(["user_id", "ts", "seq"])
            .groupby(["user_id", "ts"], as_index=False)
            .last()
        )
        want = pd.merge_asof(
            lp.sort_values("ts", kind="mergesort"),
            rp.sort_values("ts", kind="mergesort"),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        ).sort_values("event_id").reset_index(drop=True)
        want_vals = want["value"]
    else:
        want = lp.copy()
        want_vals = pd.Series([float("nan")] * len(lp))

    got_vals = got["asof_value"]
    for g, w in zip(got_vals, want_vals):
        if pd.isna(w):
            assert pd.isna(g), (got, want)
        else:
            assert g == pytest.approx(w), (got, want)
