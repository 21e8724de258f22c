"""Cross-correlation lead-lag (stattests.ccf_bucket_counts) and basket
lift (infotheory.basket_lift) vs numpy/counter references."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.infotheory import basket_lift
from htm_streamer_spark.operators.stattests import ccf_bucket_counts


def _events(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_type", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def _hours(start, n):
    return pd.date_range(start, periods=n, freq="h")


def test_ccf_detects_planted_lead(spark):
    # B's hourly volume is A's shifted forward 2 hours: ccf(A->B, lag 2)
    # must dominate every other lag of that pair
    rng = np.random.default_rng(9)
    hours = _hours("2024-03-01", 48)
    vol = rng.integers(1, 20, size=48)
    rows = []
    for h, v in zip(hours, vol):
        rows += [("a", h)] * int(v)
    for h, v in zip(hours[2:], vol[:-2]):
        rows += [("b", h)] * int(v)
    out = {
        (r["group_a"], r["group_b"], r["lag"]): r
        for r in ccf_bucket_counts(
            _events(spark, rows), "event_type", "ts", max_lag=3
        ).collect()
    }
    ab = {k[2]: v["ccf"] for k, v in out.items() if k[:2] == ("a", "b")}
    assert ab[2] == max(ab.values()) and ab[2] > 0.95
    # and the reverse direction must NOT peak at lag 2
    ba = {k[2]: v["ccf"] for k, v in out.items() if k[:2] == ("b", "a")}
    assert ba[2] < ab[2]


def test_ccf_matches_numpy_pearson_on_dense_series(spark):
    rng = np.random.default_rng(21)
    hours = _hours("2024-04-01", 30)
    ca = rng.integers(0, 6, 30)
    cb = rng.integers(0, 6, 30)
    rows = []
    for h, v in zip(hours, ca):
        rows += [("a", h)] * int(v)
    for h, v in zip(hours, cb):
        rows += [("b", h)] * int(v)
    out = {
        (r["group_a"], r["group_b"], r["lag"]): r
        for r in ccf_bucket_counts(
            _events(spark, rows), "event_type", "ts", max_lag=2
        ).collect()
    }
    # reference on the same dense global span (zeros where no rows)
    span = pd.date_range(hours.min(), hours.max(), freq="h")
    xa = pd.Series(ca, index=hours).reindex(span, fill_value=0).to_numpy(float)
    xb = pd.Series(cb, index=hours).reindex(span, fill_value=0).to_numpy(float)
    for k in range(3):
        ref = np.corrcoef(xa[: len(xa) - k or None], xb[k:])[0, 1]
        got = out[("a", "b", k)]
        assert got["ccf"] == pytest.approx(ref, abs=2e-6)
        assert got["n_overlap"] == len(span) - k


def test_ccf_constant_series_null_and_gap_zeros(spark):
    # "flat" fires exactly once per hour (zero variance -> NULL ccf);
    # "gappy" has a hole that must count as 0, not be skipped
    hours = _hours("2024-05-01", 10)
    rows = [("flat", h) for h in hours]
    rows += [("gappy", h) for h in hours if h.hour not in (3, 4)]
    out = ccf_bucket_counts(
        _events(spark, rows), "event_type", "ts", max_lag=1
    ).collect()
    flat_rows = [r for r in out if r["group_a"] == "flat"]
    assert flat_rows and all(r["ccf"] is None for r in flat_rows)
    lag0 = {
        (r["group_a"], r["group_b"]): r for r in out if r["lag"] == 0
    }
    assert lag0[("gappy", "flat")]["n_overlap"] == 10


def test_ccf_empty_input(spark):
    df = _events(spark, [("a", "2024-01-01 00:00")]).where("event_type = 'z'")
    assert ccf_bucket_counts(df, "event_type", "ts").count() == 0


# ---------------------------------------------------------------------------
# basket lift
# ---------------------------------------------------------------------------


def _basket_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "day", "event_type"])
    )


def _lift_ref(rows):
    baskets = {}
    for u, d, t in rows:
        baskets.setdefault((u, d), set()).add(t)
    nb = len(baskets)
    freq = Counter(t for s in baskets.values() for t in s)
    pair = Counter()
    for s in baskets.values():
        for a in s:
            for b in s:
                if a < b:
                    pair[(a, b)] += 1
    return {
        k: (freq[k[0]], freq[k[1]], v, v / nb, v * nb / (freq[k[0]] * freq[k[1]]))
        for k, v in pair.items()
    }


def test_lift_matches_counter_reference(spark):
    rng = np.random.default_rng(13)
    types = list("abcde")
    rows = []
    for u in range(40):
        for d in range(5):
            for t in rng.choice(types, size=rng.integers(1, 5), replace=False):
                # duplicate raw rows: membership must dedup them
                rows += [(u, d, str(t))] * 2
    out = {
        (r["item_a"], r["item_b"]): r
        for r in basket_lift(
            _basket_df(spark, rows), ["user_id", "day"], "event_type"
        ).collect()
    }
    ref = _lift_ref(rows)
    assert set(out) == set(ref)
    for k, (na, nb_, nab, sup, lift) in ref.items():
        r = out[k]
        assert (r["n_a"], r["n_b"], r["n_ab"]) == (na, nb_, nab)
        assert r["support"] == pytest.approx(sup, abs=2e-6)
        assert r["lift"] == pytest.approx(lift, abs=2e-6)


def test_lift_extremes(spark):
    # perfect co-occurrence -> lift = n_baskets / n_a; never-together
    # pairs are absent from the output
    rows = [
        (1, 1, "x"), (1, 1, "y"),
        (2, 1, "x"), (2, 1, "y"),
        (3, 1, "z"),
        (4, 1, "w"),
    ]
    out = {
        (r["item_a"], r["item_b"]): r
        for r in basket_lift(
            _basket_df(spark, rows), ["user_id", "day"], "event_type"
        ).collect()
    }
    assert set(out) == {("x", "y")}
    assert out[("x", "y")]["lift"] == pytest.approx(4 / 2, abs=1e-6)
    assert out[("x", "y")]["support"] == pytest.approx(0.5, abs=1e-6)


def test_lift_independence_grid(spark):
    # every basket contains both items -> lift exactly 1
    rows = [(u, d, t) for u in range(6) for d in range(2) for t in "pq"]
    out = basket_lift(
        _basket_df(spark, rows), ["user_id", "day"], "event_type"
    ).collect()
    assert len(out) == 1 and out[0]["lift"] == 1.0


def test_lift_empty_input(spark):
    df = _basket_df(spark, [(1, 1, "x")]).where("user_id < 0")
    assert basket_lift(df, ["user_id", "day"], "event_type").count() == 0
