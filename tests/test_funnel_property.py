"""Property-based funnel parity: hypothesis generates arbitrary small
event streams (shared timestamps, repeated stages, users missing
stages); the one-shuffle running-max formulation must match a direct
python sequential-scan reference on every one."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from htm_streamer_spark.operators.funnel import funnel_counts

BASE = datetime.datetime(2024, 1, 1)
STAGES = ["s0", "s1", "s2"]

event = st.fixed_dictionaries(
    {
        "user": st.integers(0, 3),
        "minute": st.integers(0, 10),
        "stage": st.sampled_from(STAGES + ["other"]),
    }
)


def reference_counts(rows):
    # sequential scan per user over (ts, event_id)-ordered events:
    # reached[i] flips once stage i is seen with reached[i-1] already set
    per_user = {}
    for eid, r in sorted(enumerate(rows), key=lambda p: (p[1]["minute"], p[0])):
        st_ = per_user.setdefault(r["user"], [False] * len(STAGES))
        for i, s in enumerate(STAGES):
            if r["stage"] == s and (i == 0 or st_[i - 1]):
                st_[i] = True
    return [
        sum(1 for v in per_user.values() if v[i]) for i in range(len(STAGES))
    ]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(event, min_size=1, max_size=20))
def test_funnel_matches_sequential_reference(spark, rows):
    df = spark.createDataFrame(
        [
            (i, BASE + datetime.timedelta(minutes=r["minute"]), str(r["user"]), r["stage"])
            for i, r in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id string, event_type string",
    )
    got = {
        r.stage_idx: r.n_users for r in funnel_counts(df, STAGES).collect()
    }
    want = reference_counts(rows)
    assert [got[i] for i in range(len(STAGES))] == want
