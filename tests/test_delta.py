"""Snapshot diff (operators/delta.py): added/removed/changed detection,
separator disambiguation across multiple content columns, and the
hash-only join shape."""

from pyspark.sql import functions as F

from htm_streamer_spark.operators.delta import snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_known_answer_all_change_kinds(spark):
    old = _snap(spark, [(1, "a"), (2, "b"), (3, "c")])
    new = _snap(spark, [(2, "b"), (3, "c2"), (4, "d")])
    got = {r.key: r for r in snapshot_diff(old, new).collect()}
    assert set(got) == {1, 3, 4}  # 2 unchanged -> absent
    assert got[1].change == "removed" and got[1].new_hash is None
    assert got[3].change == "changed" and None not in (got[3].old_hash, got[3].new_hash)
    assert got[4].change == "added" and got[4].old_hash is None


def test_identical_snapshots_empty_diff(spark):
    a = _snap(spark, [(1, "a"), (2, "b")])
    assert snapshot_diff(a, a).count() == 0


def test_multi_column_separator_disambiguation(spark):
    schema = "doc_id long, a string, b string"
    # ("x\x1fy", "") vs ("x", "\x1fy"-less) would collide under naive
    # concat; the \x1f separator keeps ("xy","z") != ("x","yz")
    old = spark.createDataFrame([(1, "xy", "z")], schema)
    new = spark.createDataFrame([(1, "x", "yz")], schema)
    out = snapshot_diff(old, new, content_cols=("a", "b")).collect()
    assert len(out) == 1 and out[0].change == "changed"


def test_content_cols_subset_ignores_other_columns(spark):
    schema = "doc_id long, text string, crawl_ts long"
    old = spark.createDataFrame([(1, "same", 100)], schema)
    new = spark.createDataFrame([(1, "same", 200)], schema)
    # diff on text only: ts churn is not a content change
    assert snapshot_diff(old, new, content_cols=("text",)).count() == 0


def test_plan_is_hash_only_join(spark):
    old = _snap(spark, [(1, "a")])
    new = _snap(spark, [(1, "b")])
    out = snapshot_diff(old, new)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # text never crosses the join: only key + md5 in the join output
    assert "text" not in [f.name for f in out.schema.fields]
