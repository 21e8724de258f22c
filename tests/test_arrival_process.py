"""Arrival-process validator battery (operators/stattests.py
ljung_box / dispersion_index / spectral_entropy / exp_interarrival_ks)
vs sequential numpy references."""

import math

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.stattests import (
    _CHI2_95,
    dispersion_index,
    exp_interarrival_ks,
    ljung_box,
    spectral_entropy,
)


def _hourly_events(counts, group="a", start="2024-01-01 00:00:00"):
    t0 = pd.Timestamp(start)
    rows = []
    for h, c in enumerate(counts):
        rows += [{"g": group, "ts": t0 + pd.Timedelta(hours=h)}] * int(c)
    return pd.DataFrame(rows)


# ---------------------------------------------------------------- Ljung-Box


def _lb_ref(counts, max_lag=5):
    x = np.asarray(counts, dtype=float)
    T = len(x)
    d = x - x.mean()
    dn = float((d * d).sum())
    if dn <= 0 or T <= max_lag:
        return None
    q = 0.0
    for k in range(1, max_lag + 1):
        r = round(float((d[k:] * d[:-k]).sum()) / dn + 1e-9, 6)
        q += r * r / (T - k)
    return round(T * (T + 2) * q + 1e-9, 6)


def test_ljung_box_matches_reference_and_separates(spark):
    rng = np.random.default_rng(7)
    iid = rng.poisson(20, 400)
    # AR(1)-flavored: strong lag-1 correlation
    ar = np.empty(400)
    ar[0] = 20
    for t in range(1, 400):
        ar[t] = 0.7 * ar[t - 1] + rng.poisson(6)
    ar = np.round(np.clip(ar, 0, None))
    pdf = pd.concat([_hourly_events(iid, "iid"), _hourly_events(ar, "ar")])
    out = {
        r["g"]: r
        for r in ljung_box(
            spark.createDataFrame(pdf).repartition(5), "g", "ts"
        ).collect()
    }
    assert out["iid"]["q_stat"] == pytest.approx(_lb_ref(iid), abs=2e-6)
    assert out["ar"]["q_stat"] == pytest.approx(_lb_ref(ar), abs=2e-6)
    assert out["ar"]["lb_reject"] is True
    assert out["ar"]["q_stat"] > _CHI2_95[5] > 0
    assert out["iid"]["lb_reject"] is (out["iid"]["q_stat"] > _CHI2_95[5])


def test_ljung_box_degenerate_contracts(spark):
    const = spark.createDataFrame(_hourly_events([5] * 64))
    r = ljung_box(const, "g", "ts").collect()[0]
    assert r["q_stat"] is None and r["lb_reject"] is None
    short = spark.createDataFrame(_hourly_events([3, 4, 5]))
    r2 = ljung_box(short, "g", "ts").collect()[0]  # T=3 <= max_lag=5
    assert r2["n_buckets"] == 3 and r2["q_stat"] is None
    with pytest.raises(ValueError):
        ljung_box(const, "g", "ts", max_lag=40)
    assert ljung_box(const.where("g='x'"), "g", "ts").count() == 0


# ------------------------------------------------------------- dispersion


def _fano_ref(counts):
    x = np.asarray(counts, dtype=float)
    T = len(x)
    mean = x.sum() / T
    var = (np.square(x).sum() - T * mean * mean) / (T - 1)
    fano = var / mean
    chi2 = (T - 1) * fano
    z = math.sqrt(2 * chi2) - math.sqrt(2 * (T - 1) - 1)
    return round(fano + 1e-9, 6), round(z + 1e-9, 6)


def test_dispersion_index_three_regimes(spark):
    rng = np.random.default_rng(1)  # seed picked for an in-band draw
    poisson = rng.poisson(15, 300)
    bursty = np.zeros(300)  # batch flush every 10 h
    bursty[::10] = 150
    regular = np.full(300, 15)
    regular[0] = 16  # not constant, but nearly deterministic
    pdf = pd.concat(
        [
            _hourly_events(poisson, "p"),
            _hourly_events(bursty, "b"),
            _hourly_events(regular, "r"),
        ]
    )
    out = {
        r["g"]: r
        for r in dispersion_index(
            spark.createDataFrame(pdf).repartition(5), "g", "ts"
        ).collect()
    }
    # the operator's dense grid spans first..last OBSERVED bucket, so
    # the reference must trim the bursty tail of empty hours (291, not
    # 300, buckets: the last flush is at hour 290)
    for name, series in (("p", poisson), ("b", bursty[:291]), ("r", regular)):
        fano, z = _fano_ref(series)
        assert out[name]["n_buckets"] == len(series)
        assert out[name]["fano"] == pytest.approx(fano, abs=2e-6)
        assert out[name]["z"] == pytest.approx(z, abs=2e-6)
    assert out["b"]["dispersion"] == "over" and out["b"]["fano"] > 10
    assert out["r"]["dispersion"] == "under" and out["r"]["fano"] < 0.05
    assert out["p"]["dispersion"] == "poisson"


def test_dispersion_degenerate_contracts(spark):
    one = spark.createDataFrame(_hourly_events([4]))
    r = dispersion_index(one, "g", "ts").collect()[0]
    assert r["n_buckets"] == 1 and r["fano"] is None
    assert r["dispersion"] is None
    assert dispersion_index(one.where("g='x'"), "g", "ts").count() == 0


# -------------------------------------------------------- spectral entropy


def _spec_ref(counts, max_k=8):
    x = np.asarray(counts, dtype=float)
    T = len(x)
    d = x - x.mean()
    ss = float((d * d).sum())
    t = np.arange(T, dtype=float)
    pws = []
    for k in range(1, max_k + 1):
        if ss <= 0 or k > (T - 1) // 2:
            continue
        a = float((d * np.cos(t * (2.0 * math.pi * k) / T)).sum())
        b = float((d * np.sin(t * (2.0 * math.pi * k) / T)).sum())
        pws.append((a * a + b * b) * 2.0 / T)
    if len(pws) < 1:
        return None, None, 0
    kk = len(pws)
    nz = [p for p in pws if p > 0]
    tot = sum(nz)
    ent = None
    if kk > 1 and tot > 0:
        ent = (math.log(tot) - sum(p * math.log(p) for p in nz) / tot) / (
            math.log(kk)
        )
    if len(nz) == kk and tot > 0:
        flat = math.exp(sum(math.log(p) for p in nz) / kk) / (tot / kk)
    elif tot > 0:
        flat = 0.0
    else:
        flat = None
    return ent, flat, kk


def test_spectral_entropy_spike_vs_noise(spark):
    rng = np.random.default_rng(29)
    T = 192
    t = np.arange(T)
    spike = np.round(100 + 80 * np.sin(2 * np.pi * t * 4 / T))  # one line
    noise = rng.poisson(100, T)
    pdf = pd.concat(
        [_hourly_events(spike, "spike"), _hourly_events(noise, "noise")]
    )
    out = {
        r["g"]: r
        for r in spectral_entropy(
            spark.createDataFrame(pdf).repartition(5), "g", "ts"
        ).collect()
    }
    for name, series in (("spike", spike), ("noise", noise)):
        ent, flat, kk = _spec_ref(series)
        assert out[name]["n_harmonics"] == kk == 8
        assert out[name]["spec_entropy"] == pytest.approx(ent, abs=2e-6)
        assert out[name]["flatness"] == pytest.approx(flat, abs=2e-6)
    assert out["spike"]["spec_entropy"] < 0.3 < out["noise"]["spec_entropy"]
    assert out["spike"]["flatness"] < out["noise"]["flatness"]


def test_spectral_entropy_degenerate_contracts(spark):
    const = spark.createDataFrame(_hourly_events([9] * 64))
    r = spectral_entropy(const, "g", "ts").collect()[0]
    assert r["n_buckets"] == 64
    assert r["spec_entropy"] is None and r["n_harmonics"] is None
    assert spectral_entropy(const.where("g='x'"), "g", "ts").count() == 0


# --------------------------------------------------- exponential-gap KS


def _evts_from_gaps(gaps_us, group="a", start="2024-01-01"):
    t0 = pd.Timestamp(start)
    ts = [t0]
    for gp in gaps_us:
        ts.append(ts[-1] + pd.Timedelta(microseconds=int(gp)))
    return pd.DataFrame({"g": group, "ts": ts})


def _ks_ref(gaps_us):
    gaps = np.asarray(sorted(int(x) for x in gaps_us), dtype=float)
    n = len(gaps)
    mu = gaps.sum() / n
    vals, cnts = np.unique(gaps, return_counts=True)
    cum = np.cumsum(cnts)
    fu = cum / n
    fl = (cum - cnts) / n
    fe = 1.0 - np.exp(-vals / mu)
    d = float(np.maximum(np.abs(fu - fe), np.abs(fl - fe)).max())
    stat = (d - 0.2 / n) * (math.sqrt(n) + 0.26 + 0.5 / math.sqrt(n))
    return round(d + 1e-9, 6), round(stat + 1e-9, 6)


def test_exp_ks_exponential_vs_heartbeat(spark):
    rng = np.random.default_rng(41)
    # inverse-CDF exponential gaps, mean 5 s, microsecond-rounded
    exp_gaps = np.round(-5e6 * np.log(rng.uniform(size=500))).astype(int)
    exp_gaps = np.clip(exp_gaps, 1, None)
    beat_gaps = np.full(500, 5_000_000)  # strict 5 s heartbeat
    pdf = pd.concat(
        [_evts_from_gaps(exp_gaps, "exp"), _evts_from_gaps(beat_gaps, "beat")]
    )
    out = {
        r["g"]: r
        for r in exp_interarrival_ks(
            spark.createDataFrame(pdf).repartition(5), "g", "ts"
        ).collect()
    }
    for name, gaps in (("exp", exp_gaps), ("beat", beat_gaps)):
        d, stat = _ks_ref(gaps)
        assert out[name]["n_gaps"] == 500
        assert out[name]["ks_d"] == pytest.approx(d, abs=2e-6)
        assert out[name]["ks_stat"] == pytest.approx(stat, abs=2e-6)
    assert out["exp"]["exp_reject"] is False
    # heartbeat: ECDF jumps 0 -> 1 at x = mu; the lower side gives
    # D = |0 - (1 - e^-1)| = 1 - 1/e ~= 0.632
    assert out["beat"]["exp_reject"] is True
    assert out["beat"]["ks_d"] == pytest.approx(1 - 1 / math.e, abs=1e-6)


def test_exp_ks_tie_order_invariance_and_degenerates(spark):
    # duplicate timestamps: gap 0 rows; multiset of sorted diffs is
    # tie-order invariant so any partitioning gives the same answer
    pdf = _evts_from_gaps([0, 1_000_000, 0, 2_000_000, 1_000_000] * 20)
    a = exp_interarrival_ks(
        spark.createDataFrame(pdf).repartition(1), "g", "ts"
    ).collect()[0]
    b = exp_interarrival_ks(
        spark.createDataFrame(pdf).repartition(13), "g", "ts"
    ).collect()[0]
    assert a == b and a["n_gaps"] == 100
    single = spark.createDataFrame(
        pd.DataFrame({"g": "s", "ts": [pd.Timestamp("2024-01-01")]})
    )
    assert exp_interarrival_ks(single, "g", "ts").count() == 0  # no gaps
    # all-simultaneous: gaps exist but mean 0 -> NULL stat, kept row
    simo = spark.createDataFrame(
        pd.DataFrame(
            {"g": "z", "ts": [pd.Timestamp("2024-01-01")] * 5}
        )
    )
    r = exp_interarrival_ks(simo, "g", "ts").collect()[0]
    assert r["n_gaps"] == 4 and r["ks_stat"] is None
    assert r["exp_reject"] is None


# ------------------------------------------------------ fused profile


def test_arrival_profile_fusion_matches_standalones(spark):
    from htm_streamer_spark.operators.stattests import (
        arrival_profile,
        dispersion_index,
        dominant_period,
        ljung_box,
        spectral_entropy,
    )

    rng = np.random.default_rng(31)
    T = 200
    t = np.arange(T)
    a = np.round(40 + 25 * np.sin(2 * np.pi * t * 5 / T)) + rng.poisson(
        4, T
    )
    b = rng.poisson(30, T)
    pdf = pd.concat([_hourly_events(a, "a"), _hourly_events(b, "b")])
    df = spark.createDataFrame(pdf).repartition(6)
    fused = {r["g"]: r for r in arrival_profile(df, "g", "ts").collect()}
    disp = {r["g"]: r for r in dispersion_index(df, "g", "ts").collect()}
    lb = {r["g"]: r for r in ljung_box(df, "g", "ts").collect()}
    dp = {r["g"]: r for r in dominant_period(df, "g", "ts").collect()}
    se = {r["g"]: r for r in spectral_entropy(df, "g", "ts").collect()}
    for g in ("a", "b"):
        # fusion changes the plan, never the answer: bit-identical
        assert fused[g]["fano"] == disp[g]["fano"]
        assert fused[g]["dispersion"] == disp[g]["dispersion"]
        assert fused[g]["q_stat"] == lb[g]["q_stat"]
        assert fused[g]["lb_reject"] == lb[g]["lb_reject"]
        assert fused[g]["best_k"] == dp[g]["best_k"]
        assert fused[g]["power_frac"] == dp[g]["power_frac"]
        assert fused[g]["spec_entropy"] == se[g]["spec_entropy"]
        assert fused[g]["flatness"] == se[g]["flatness"]
    assert fused["a"]["best_k"] == 5  # the planted 5th harmonic


def test_arrival_profile_single_fact_scan(spark):
    from htm_streamer_spark.operators.stattests import arrival_profile

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = arrival_profile(df, "event_type", "ts")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # every source reference must hit the persisted counts cache: the
    # only parquet Relation allowed is the one inside the cached plan
    n_rel = plan.count("Relation")
    n_mem = plan.count("InMemoryRelation")
    assert n_mem > 0 and n_rel == n_mem, (n_rel, n_mem)
