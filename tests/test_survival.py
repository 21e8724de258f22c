"""Kaplan-Meier survival (operators/survival.py) vs a pure-python
reference, including censoring correctness."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.survival import km_survival


def _events_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_type", "user_id", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    return spark.createDataFrame(pdf)


def _durations(rows, round_to=1):
    """Recompute (t, event) per group exactly as specified: lead within
    (group, user), censor at the global max ts."""
    pdf = pd.DataFrame(rows, columns=["event_type", "user_id", "ts"])
    end = pdf["ts"].max()
    out = {}
    for (g, _u), sub in pdf.groupby(["event_type", "user_id"]):
        ts = sorted(sub["ts"])
        for a, b in zip(ts, ts[1:]):
            out.setdefault(g, []).append(((b - a) // round_to * round_to, 1))
        out.setdefault(g, []).append(
            ((end - ts[-1]) // round_to * round_to, 0)
        )
    return out


def _km_ref(durs):
    """Classical KM over (t, event) pairs."""
    d = Counter(t for t, e in durs if e)
    curve, s = [], 1.0
    for t in sorted(d):
        n_risk = sum(1 for tt, _ in durs if tt >= t)
        if d[t] >= n_risk:
            s = 0.0
        else:
            s *= 1.0 - d[t] / n_risk
        curve.append((t, n_risk, d[t], s))
    return curve


def test_km_matches_reference_on_random_events(spark):
    rng = np.random.default_rng(31)
    rows = []
    for g in ("a", "b"):
        for u in range(12):
            t = 1_000_000
            for _ in range(int(rng.integers(2, 9))):
                rows.append((g, u, t))
                t += int(rng.integers(10, 500))
    out = km_survival(
        _events_df(spark, rows), "event_type", "user_id", "ts"
    ).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["event_type"], []).append(r)
    durs = _durations(rows)
    for g, got in by_g.items():
        ref = _km_ref(durs[g])
        got = sorted(got, key=lambda r: r["duration_s"])
        assert [(r["duration_s"], r["n_risk"], r["n_events"]) for r in got] \
            == [(t, n, d) for t, n, d, _ in ref]
        for r, (_, _, _, s) in zip(got, ref):
            assert r["survival"] == pytest.approx(s, abs=2e-6)
        # survival is a non-increasing step function
        sv = [r["survival"] for r in got]
        assert all(x >= y - 1e-12 for x, y in zip(sv, sv[1:]))


def test_km_censoring_keeps_users_in_risk_set(spark):
    # user 1 completes gaps of 100 and 300; user 2 has ONE event 150 s
    # before the end -> censored gap of 150: it must raise n_risk at
    # t=100 to 3 (naive drop-censored would say 2)
    rows = [
        ("g", 1, 1000), ("g", 1, 1100), ("g", 1, 1400),
        ("g", 2, 1250),
    ]
    out = sorted(
        km_survival(
            _events_df(spark, rows), "event_type", "user_id", "ts"
        ).collect(),
        key=lambda r: r["duration_s"],
    )
    # durations: (100,1), (300,1) from user 1; (150,0) censored user 2;
    # user 1's last event is AT the end -> (0,0) censored
    assert [(r["duration_s"], r["n_risk"], r["n_events"]) for r in out] == [
        (100, 3, 1),
        (300, 1, 1),
    ]
    assert out[0]["survival"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[1]["survival"] == 0.0  # d == n_risk -> curve hits zero


def test_km_round_to_buckets_durations(spark):
    rows = [("g", 1, 0), ("g", 1, 95), ("g", 1, 210)]
    out = sorted(
        km_survival(
            _events_df(spark, rows), "event_type", "user_id", "ts",
            round_to=60,
        ).collect(),
        key=lambda r: r["duration_s"],
    )
    # gaps 95 -> bucket 60, 115 -> bucket 60: one curve point, d=2
    assert [(r["duration_s"], r["n_events"]) for r in out] == [(60, 2)]


def test_km_empty_and_single_event(spark):
    df = _events_df(spark, [("g", 1, 1000)])
    # one event: only a censored duration -> no curve rows
    assert km_survival(df, "event_type", "user_id", "ts").count() == 0
    assert (
        km_survival(
            df.where("user_id < 0"), "event_type", "user_id", "ts"
        ).count()
        == 0
    )
