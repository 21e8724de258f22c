"""Two-sample log-rank test (operators/survival.py logrank_test)
vs a sequential numpy reference with explicit censoring."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.survival import logrank_test

CHI2_1DF_95 = 3.841458820694124


def _events(user_gaps, group="g0", start="2024-01-01"):
    """user_gaps: {user_id: [gap_s, ...]} -> event rows; each user's
    events start at `start` and step by their gaps."""
    t0 = pd.Timestamp(start)
    rows = []
    for uid, gaps in user_gaps.items():
        t = t0
        rows.append({"g": group, "user_id": uid, "ts": t})
        for gp in gaps:
            t = t + pd.Timedelta(seconds=int(gp))
            rows.append({"g": group, "user_id": uid, "ts": t})
    return pd.DataFrame(rows)


def _ref(pdf, round_to=1):
    """Sequential log-rank on the same duration derivation: per-user
    consecutive gaps (event=1) plus the censored final gap to the
    global max ts (event=0), floored to round_to buckets."""
    end = pdf["ts"].max()
    rows = []
    for uid, gg in pdf.groupby("user_id"):
        ts = sorted(gg["ts"])
        cls = int(uid) % 2
        for a, b in zip(ts, ts[1:]):
            rows.append(((b - a).total_seconds(), 1, cls))
        rows.append(((end - ts[-1]).total_seconds(), 0, cls))
    dur = [
        (int(t // round_to) * round_to, ev, cls) for t, ev, cls in rows
    ]
    times = sorted({t for t, ev, _ in dur if ev == 1})
    o_a = e_a = v = 0.0
    for t in times:
        at_risk = [(tt, ev, c) for tt, ev, c in dur if tt >= t]
        n = len(at_risk)
        n_a = sum(1 for tt, ev, c in at_risk if c == 0)
        d = sum(1 for tt, ev, c in dur if tt == t and ev == 1)
        d_a = sum(1 for tt, ev, c in dur if tt == t and ev == 1 and c == 0)
        o_a += d_a
        p = n_a / n
        e_a += d * p
        if n > 1:
            v += d * p * (1 - p) * (n - d) / (n - 1)
    chi2 = (o_a - e_a) ** 2 / v if v > 0 else None
    return o_a, round(e_a + 1e-9, 6), (
        round(chi2 + 1e-9, 6) if chi2 is not None else None
    )


def _run(spark, pdf, round_to=1):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pdf).repartition(7)
    df = df.withColumn("half", F.col("user_id") % 2)
    return {
        r["g"]: r
        for r in logrank_test(
            df, "g", "user_id", "ts", "half", round_to=round_to
        ).collect()
    }


def test_logrank_matches_reference_and_separates(spark):
    rng = np.random.default_rng(7)
    # same-curve split: both classes draw gaps from one distribution
    same = {
        uid: rng.integers(600, 7200, 20) for uid in range(40)
    }
    # shifted: even users (class A) churn 3x slower
    shifted = {
        uid: (
            rng.integers(1800, 21600, 20)
            if uid % 2 == 0
            else rng.integers(600, 7200, 20)
        )
        for uid in range(40)
    }
    # run each group in its own frame: the operator right-censors at
    # the GLOBAL max(ts) of its input, so mixing groups would censor
    # "same" against "shift"'s horizon
    for name, gaps in (("same", same), ("shift", shifted)):
        sub = _events(gaps, name)
        out = _run(spark, sub, round_to=60)
        o_a, e_a, chi2 = _ref(sub, round_to=60)
        r = out[name]
        assert r["o_a"] == int(o_a)
        assert r["e_a"] == pytest.approx(e_a, abs=2e-6)
        assert r["logrank_chi2"] == pytest.approx(chi2, rel=1e-6)
        if name == "shift":
            assert r["lr_reject"] is True
            assert r["logrank_chi2"] > CHI2_1DF_95
        else:
            assert r["lr_reject"] is (r["logrank_chi2"] > CHI2_1DF_95)


def test_logrank_censoring_matters(spark):
    # class A: one completed 100s gap then a long censored tail;
    # class B: completed 100s gaps only. A naive comparison of
    # completed gaps sees identical distributions; log-rank keeps the
    # censored tails in the risk set, so E_A reflects them
    users = {}
    for uid in range(0, 10, 2):  # class A (even)
        users[uid] = [100]
    for uid in range(1, 11, 2):  # class B (odd)
        users[uid] = [100, 100, 100]
    pdf = _events(users)
    out = _run(spark, pdf)["g0"]
    # all observed deaths at t=100; A contributes 5 of 20 (B: 15)
    assert out["o_a"] == 5
    assert out["e_a"] > 0 and out["logrank_chi2"] is not None
    o_a, e_a, chi2 = _ref(pdf)
    assert out["e_a"] == pytest.approx(e_a, abs=2e-6)
    assert out["logrank_chi2"] == pytest.approx(chi2, rel=1e-6)


def test_logrank_degenerates(spark):
    # one-sided: every user in class B -> NULL chi2, verdict NULL
    users = {uid * 2 + 1: [60, 60] for uid in range(5)}
    out = _run(spark, _events(users))["g0"]
    assert out["n_a"] == 0 and out["logrank_chi2"] is None
    assert out["lr_reject"] is None
    # everyone dies at the single shared time: the last risk set is
    # exhausted (n == d at every event time), so V = 0 -> NULL chi2
    allsame = {uid: [300] for uid in range(8)}
    out1 = _run(spark, _events(allsame))["g0"]
    assert out1["logrank_chi2"] is None
    # balanced asymmetric times: identical gap multisets per class ->
    # O == E exactly at every time, V > 0 at t=100 -> chi2 == 0
    eq = {0: [100], 2: [200], 1: [100], 3: [200]}
    out2 = _run(spark, _events(eq))["g0"]
    assert out2["o_a"] == 2
    assert out2["logrank_chi2"] == pytest.approx(0.0, abs=1e-6)
    # empty input
    from pyspark.sql import functions as F

    df = spark.createDataFrame(_events(eq)).withColumn(
        "half", F.col("user_id") % 2
    )
    assert (
        logrank_test(
            df.where("g = 'nope'"), "g", "user_id", "ts", "half"
        ).count()
        == 0
    )
