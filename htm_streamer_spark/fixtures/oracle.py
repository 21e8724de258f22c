"""Pure pandas/numpy oracle — the golden implementation of every check.

Implements the reference's exact verdict semantics (no Spark):

- hard-fail override: any invariant violation ⇒ partition ``fail``
  regardless of drift score (reference: spatial anomaly forces
  ``anomaly_likelihood = 1.0``, /root/reference/htm_streamer/model/
  htm_model.py:385-388).
- probation: partitions consumed by baseline fitting get verdict
  ``probation`` (reference: first learningPeriod+estimationSamples rows
  emit flat 0.5, anomalylikelihood.py:440-442,273).
- drift: per-partition token-frequency and n_tok histograms compared by
  KL divergence / PSI against the baseline fitted on the first K clean
  partitions (reference: sliding-window Gaussian fit + tail probability,
  anomalylikelihood.py:718-788).

The engine's Spark output must match this row-for-row under token-array
equality (BASELINE.json invariant).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from htm_streamer_spark.config import HIST_EPS, NTOK_MAX, EngineConfig

ROW_CHECKS = ("null_n_tok", "len_mismatch", "token_range", "empty_tokens", "bad_source")


def _row_flags(df: pd.DataFrame, cfg: EngineConfig) -> pd.DataFrame:
    """Row-level check flags. ``tokens`` is a column of int sequences."""
    tok_len = df["tokens"].map(len)
    n_tok = df["n_tok"]
    flags = pd.DataFrame(index=df.index)
    flags["null_n_tok"] = n_tok.isna()
    flags["len_mismatch"] = (~n_tok.isna()) & (n_tok != tok_len)
    v = cfg.vocab_size
    flags["token_range"] = df["tokens"].map(
        lambda ts: bool(len(ts)) and (min(ts) < 0 or max(ts) >= v)
    )
    flags["empty_tokens"] = tok_len == 0
    flags["bad_source"] = ~df["source"].isin(list(cfg.allowed_sources))
    return flags


def oracle_violations(df: pd.DataFrame, cfg: EngineConfig | None = None) -> pd.DataFrame:
    """Violation rows: ``(doc_id, part_id, check_id, payload)`` sorted by
    ``(part_id, doc_id, check_id)``. Payload is canonical-key-order JSON of
    the offending row (tokens elided to a fingerprint for size).
    """
    cfg = cfg or EngineConfig()
    flags = _row_flags(df, cfg)
    # dup_doc_id: all rows of any doc_id appearing more than once (global)
    if "dup_doc_id" in cfg.checks:
        dup = df["doc_id"].duplicated(keep=False)
    else:
        dup = pd.Series(False, index=df.index)
    out = []
    for check in ROW_CHECKS:
        if check not in cfg.checks:
            continue
        sub = df.loc[flags[check], ["doc_id", "part_id"]].copy()
        sub["check_id"] = check
        out.append(sub)
    sub = df.loc[dup, ["doc_id", "part_id"]].copy()
    sub["check_id"] = "dup_doc_id"
    out.append(sub)
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["doc_id", "part_id", "check_id"]
    )
    # compact separators + sorted keys == Spark's to_json(struct(...))
    # with alphabetically-ordered struct fields
    res["payload"] = [
        json.dumps(
            {"check_id": c, "doc_id": d, "part_id": int(p)},
            sort_keys=True,
            separators=(",", ":"),
        )
        for d, p, c in zip(res["doc_id"], res["part_id"], res["check_id"])
    ]
    return res.sort_values(["part_id", "doc_id", "check_id"]).reset_index(drop=True)


def _hist_tok(tokens_concat: np.ndarray, buckets: int, vocab: int) -> np.ndarray:
    b = (tokens_concat.astype(np.int64) * buckets) // vocab
    b = np.clip(b, 0, buckets - 1)
    return np.bincount(b, minlength=buckets).astype(np.float64)


def _hist_ntok(n_tok: np.ndarray, buckets: int) -> np.ndarray:
    n = np.clip(n_tok.astype(np.int64), 0, NTOK_MAX)
    b = (n * buckets) // (NTOK_MAX + 1)
    return np.bincount(b, minlength=buckets).astype(np.float64)


def psi_kl(p_counts: np.ndarray, q_counts: np.ndarray) -> tuple[float, float]:
    """(PSI, KL) between observed p and baseline q, with probability floors
    (reference analog of the mean/var floors, anomalylikelihood.py:733-742).
    """
    p = p_counts / max(p_counts.sum(), 1.0)
    q = q_counts / max(q_counts.sum(), 1.0)
    p = np.maximum(p, HIST_EPS)
    q = np.maximum(q, HIST_EPS)
    lr = np.log(p / q)
    psi = float(np.sum((p - q) * lr))
    kl = float(np.sum(p * lr))
    return psi, kl


def oracle_verdicts(df: pd.DataFrame, cfg: EngineConfig | None = None) -> pd.DataFrame:
    """Per-partition verdicts: ``(part_id, verdict, n_violations, psi, kl)``.

    Rule (mirrors model/htm_model.py:385-392): any violation ⇒ ``fail``;
    baseline partitions ⇒ ``probation``; drift beyond threshold ⇒ ``fail``;
    else ``pass``. Baseline = histograms over clean rows (no row-level
    violation) of the first ``cfg.baseline_partitions`` part_ids.
    """
    cfg = cfg or EngineConfig()
    violations = oracle_violations(df, cfg)
    n_viol = violations.groupby("part_id").size()

    flags = _row_flags(df, cfg)
    clean = ~flags.any(axis=1)
    part_ids = np.sort(df["part_id"].unique())
    baseline_parts = set(part_ids[: cfg.baseline_partitions].tolist())

    base_mask = clean & df["part_id"].isin(baseline_parts)
    base_tok = _hist_tok(
        np.concatenate([np.asarray(t) for t in df.loc[base_mask, "tokens"]])
        if base_mask.any()
        else np.zeros(0, dtype=np.int64),
        cfg.tok_hist_buckets,
        cfg.vocab_size,
    )
    base_ntok = _hist_ntok(df.loc[base_mask, "n_tok"].to_numpy(dtype=np.float64), cfg.ntok_hist_buckets)

    rows = []
    for pid in part_ids:
        nv = int(n_viol.get(pid, 0))
        if pid in baseline_parts:
            verdict = "fail" if nv > 0 else "probation"
            psi, kl = 0.0, 0.0
        else:
            pm = clean & (df["part_id"] == pid)
            toks = (
                np.concatenate([np.asarray(t) for t in df.loc[pm, "tokens"]])
                if pm.any()
                else np.zeros(0, dtype=np.int64)
            )
            p_tok = _hist_tok(toks, cfg.tok_hist_buckets, cfg.vocab_size)
            p_ntok = _hist_ntok(df.loc[pm, "n_tok"].to_numpy(dtype=np.float64), cfg.ntok_hist_buckets)
            psi_t, kl_t = psi_kl(p_tok, base_tok)
            psi_n, kl_n = psi_kl(p_ntok, base_ntok)
            psi = max(psi_t, psi_n)
            kl = max(kl_t, kl_n)
            drifted = ("drift" in cfg.checks) and (psi > cfg.psi_threshold or kl > cfg.kl_threshold)
            verdict = "fail" if (nv > 0 or drifted) else "pass"
        rows.append(
            {"part_id": int(pid), "verdict": verdict, "n_violations": nv, "psi": psi, "kl": kl}
        )
    return pd.DataFrame(rows)
