"""Incremental view maintenance (operators/ivm.py): the incremental
path must equal recompute-from-scratch on the new snapshot, including
group appearance/disappearance and group-moving changes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.delta import snapshot_diff
from htm_streamer_spark.operators.ivm import grouped_totals, incremental_totals


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, src string, nv long, text string")


def _collect_view(view):
    return sorted(map(tuple, view.select("src", "n", "total").collect()))


def _run(spark, old_rows, new_rows):
    old_snap, new_snap = _snap(spark, old_rows), _snap(spark, new_rows)
    old_view = grouped_totals(old_snap, ["src"], "nv")
    diff = snapshot_diff(
        old_snap, new_snap, key_col="doc_id", content_cols=("src", "nv", "text")
    )
    got = incremental_totals(
        old_view, old_snap, new_snap, diff, "doc_id", ["src"], "nv"
    )
    want = grouped_totals(new_snap, ["src"], "nv")
    assert _collect_view(got) == _collect_view(want)
    return diff


def test_mixed_mutations_match_recompute(spark):
    rng = np.random.default_rng(5)
    old = [
        (i, f"s{i % 4}", int(rng.integers(1, 100)), f"t{i}") for i in range(300)
    ]
    new = []
    for doc_id, src, nv, text in old:
        if doc_id % 13 == 0:
            continue  # removed
        if doc_id % 7 == 0:
            new.append((doc_id, src, nv + 5, text + " rev"))  # value change
        elif doc_id % 11 == 0:
            new.append((doc_id, f"s{(doc_id + 1) % 4}", nv, text))  # group move
        else:
            new.append((doc_id, src, nv, text))
    new += [(10_000 + i, "s_new", 7, "fresh") for i in range(20)]  # new group
    diff = _run(spark, old, new)
    kinds = {r["change"] for r in diff.select("change").distinct().collect()}
    assert kinds == {"added", "removed", "changed"}


def test_group_vanishes_from_view(spark):
    old = [(i, "solo" if i < 5 else "rest", 10, "x") for i in range(50)]
    new = [r for r in old if r[1] != "solo"]
    _run(spark, old, new)  # asserts equality; 'solo' must be gone
    # and explicitly: no zero-count residue rows
    old_snap, new_snap = _snap(spark, old), _snap(spark, new)
    view = incremental_totals(
        grouped_totals(old_snap, ["src"], "nv"),
        old_snap,
        new_snap,
        snapshot_diff(old_snap, new_snap, key_col="doc_id",
                      content_cols=("src", "nv", "text")),
        "doc_id",
        ["src"],
        "nv",
    )
    assert [r["src"] for r in view.collect()] == ["rest"]


def test_empty_diff_is_identity(spark):
    rows = [(i, f"s{i % 3}", i, "t") for i in range(60)]
    _run(spark, rows, rows)


def test_unchanged_content_rows_do_not_inflate(spark):
    # a changed row whose aggregate inputs are unchanged (text-only
    # revision) flows through remove+add and must cancel exactly
    old = [(i, "a", 10, f"t{i}") for i in range(40)]
    new = [(i, "a", 10, f"t{i} rev" if i % 2 == 0 else f"t{i}") for i in range(40)]
    _run(spark, old, new)
