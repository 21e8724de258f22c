"""Order-independent table digest (operators/checksum.py): layout
independence, single-change sensitivity, null-vs-empty distinction,
unsupported-type refusal, and DuckDB reproducing the identical digest
from the documented canonical form (the operator's whole point)."""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
import pytest

from htm_streamer_spark.operators.checksum import table_digest


def _pdf():
    return pd.DataFrame(
        {
            "k": [1, 2, 3, 4, 5, 6],
            "s": ["a", "", None, "d", "e", "f"],
            "grp": ["x", "x", "y", "y", "y", "x"],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00:00"] * 3 + ["2024-06-30 23:59:59"] * 3
            ),
            "v": [1.5, 2.25, None, -0.125, 1e6, 0.000001],
        }
    )


def _digest(spark, pdf, n_parts, group_by=None):
    df = spark.createDataFrame(pdf).repartition(n_parts)
    rows = table_digest(df, ["k", "s", "ts", "v"], group_by=group_by).collect()
    if group_by is None:
        return (rows[0]["n_rows"], rows[0]["digest"])
    return {r[group_by]: (r["n_rows"], r["digest"]) for r in rows}


def test_layout_and_order_independent(spark):
    pdf = _pdf()
    shuffled = pdf.sample(frac=1.0, random_state=9).reset_index(drop=True)
    assert _digest(spark, pdf, 1) == _digest(spark, shuffled, 7)


def test_single_value_change_flips_digest(spark):
    pdf = _pdf()
    n0, d0 = _digest(spark, pdf, 2)
    pdf2 = pdf.copy()
    pdf2.loc[3, "v"] = -0.125001
    n1, d1 = _digest(spark, pdf2, 2)
    assert n0 == n1 and d0 != d1


def test_null_differs_from_empty_string(spark):
    schema = "k long, s string, grp string, ts timestamp, v double"
    ts = datetime.datetime(2024, 1, 1)

    def one(s_val):
        df = spark.createDataFrame([(1, s_val, "x", ts, 1.0)], schema)
        r = table_digest(df, ["k", "s", "ts", "v"]).collect()[0]
        return (r["n_rows"], r["digest"])

    assert one("") != one(None)


def test_grouped_digest_isolates_groups(spark):
    pdf = _pdf()
    base = _digest(spark, pdf, 3, group_by="grp")
    pdf2 = pdf.copy()
    pdf2.loc[0, "k"] = 99  # grp x row
    changed = _digest(spark, pdf2, 3, group_by="grp")
    assert base["y"] == changed["y"]
    assert base["x"] != changed["x"]


def test_unsupported_type_raises(spark):
    df = spark.createDataFrame([([1, 2],)], "a array<int>")
    with pytest.raises(TypeError, match="canonical form"):
        table_digest(df, ["a"])


def test_duckdb_reproduces_digest(spark):
    """Cross-engine: DuckDB computes the same digest from the same
    parquet via the documented canonical rendering."""
    pdf = _pdf()
    got_n, got_d = _digest(spark, pdf, 4)
    con = duckdb.connect()
    con.register("t", pdf)
    n, d = con.execute(
        r"""
        SELECT count(*)::BIGINT,
               (sum(('0x' || substr(md5(
                   concat_ws(chr(31),
                     coalesce(k::VARCHAR, chr(1)),
                     coalesce(s, chr(1)),
                     coalesce(strftime(ts, '%Y-%m-%d %H:%M:%S'), chr(1)),
                     coalesce(v::DECIMAL(28,6)::VARCHAR, chr(1)))
               ), 1, 15))::BIGINT)::HUGEINT
                % 1000000000000000000)::BIGINT
        FROM t
        """
    ).fetchone()
    assert (n, d) == (got_n, got_d)
