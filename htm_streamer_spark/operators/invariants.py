"""Row-level invariant checks, as pure native expressions.

All five row checks compile into ONE projection over the scan (no UDF, no
shuffle, whole-stage codegen). Reference analogs per check:

- ``null_n_tok`` — missing-feature row filter; the reference skips + logs
  such rows (/root/reference/htm_streamer/pipeline/htm_stream_runner.py:
  78-85, utils/general.py:54-56). Here they become violation rows, never
  silently dropped.
- ``len_mismatch`` — encoding width equals the sum of encoder widths *by
  construction* in the reference (model/htm_model.py:34); declared n_tok
  must equal len(tokens).
- ``token_range`` — the spatial (range) anomaly check: value outside
  [minExpected, maxExpected) (model/htm_model.py:305-312).
- ``empty_tokens`` — flat-metric guard (anomalylikelihood.py:530-538).
- ``bad_source`` — membership against the allowed-values set; small-list
  ``isin`` form here, the broadcast-join form lives in referential.py
  (driver.py:28-39).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from htm_streamer_spark.config import EngineConfig
from htm_streamer_spark.functions.array_funcs import (
    len_mismatch_expr,
    token_oob_expr,
)

ROW_CHECK_ORDER = ("null_n_tok", "len_mismatch", "token_range", "empty_tokens", "bad_source")


def row_check_exprs(cfg: EngineConfig) -> dict[str, Column]:
    """One boolean Column per enabled row-level check."""
    tokens = F.col("tokens")
    n_tok = F.col("n_tok")
    exprs: dict[str, Column] = {}
    if "null_n_tok" in cfg.checks:
        exprs["null_n_tok"] = n_tok.isNull()
    if "len_mismatch" in cfg.checks:
        exprs["len_mismatch"] = len_mismatch_expr(tokens, n_tok)
    if "token_range" in cfg.checks:
        exprs["token_range"] = F.coalesce(token_oob_expr(tokens, cfg.vocab_size), F.lit(False))
    if "empty_tokens" in cfg.checks:
        exprs["empty_tokens"] = F.coalesce(F.size(tokens) == 0, F.lit(True))
    if "bad_source" in cfg.checks:
        exprs["bad_source"] = ~F.coalesce(
            F.col("source").isin(list(cfg.allowed_sources)), F.lit(False)
        )
    return exprs


def row_check_flags(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Append one boolean flag column per check plus ``any_violation``."""
    exprs = row_check_exprs(cfg)
    out = df
    for name, e in exprs.items():
        out = out.withColumn(f"flag_{name}", e)
    flags = [F.col(f"flag_{n}") for n in exprs]
    any_v = flags[0] if flags else F.lit(False)
    for f in flags[1:]:
        any_v = any_v | f
    return out.withColumn("any_violation", any_v)


def row_violations(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Violation rows for all row-level checks in ONE pass.

    Builds an array of fired check_ids per row, filters to non-empty, then
    explodes — so the scan is read once for all five checks instead of
    once per check. Output: (doc_id, part_id, check_id, payload).
    """
    exprs = row_check_exprs(cfg)
    fired = F.filter(
        F.array(*[F.when(e, F.lit(name)) for name, e in exprs.items()]),
        lambda x: x.isNotNull(),
    )
    return (
        df.withColumn("_fired", fired)
        .filter(F.size("_fired") > 0)
        .select(
            "doc_id",
            "part_id",
            F.explode("_fired").alias("check_id"),
        )
        .withColumn(
            "payload",
            F.to_json(
                F.struct(
                    F.col("check_id"),
                    F.col("doc_id"),
                    F.col("part_id"),
                )
            ),
        )
    )
