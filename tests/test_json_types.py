"""JSON value-type profile (operators/profiling.py json_type_profile):
cross-engine canonical-type-mapping parity vs DuckDB on heterogeneous
blobs (the driver table is monomorphic, so the seven-type surface is
pinned here), plus hand-computed shares and malformed handling."""

import duckdb
import pandas as pd
import pytest

from htm_streamer_spark.operators.profiling import json_type_profile

BLOBS = [
    '{"a": 5, "b": "x", "mix": 1}',
    '{"a": -3, "b": "y", "mix": "one"}',
    '{"a": 7, "c": 1.5, "mix": 2.0}',
    '{"a": null, "c": 2.75, "mix": true}',
    '{"a": 9, "d": true, "arr": [1, 2], "obj": {"k": 1}}',
    '{"a": 11, "d": false, "arr": [], "obj": {}}',
    '{"big": 123456789012345678901234567890, "sci": 1e5}',
    "not json at all",
    None,
]

DUCK_SQL = """
WITH blobs AS (SELECT * FROM df),
keyed AS (
  SELECT t.key, json_type(try_cast(js AS JSON), '$.' || t.key) AS jt,
         try_cast(json_extract(try_cast(js AS JSON), '$.' || t.key)
                  AS DOUBLE) AS xv
  FROM blobs,
       LATERAL (SELECT unnest(json_keys(try_cast(js AS JSON))) AS key) t
),
canon AS (
  SELECT key,
         CASE coalesce(jt, 'NULL')
           WHEN 'NULL' THEN 'null' WHEN 'BOOLEAN' THEN 'bool'
           WHEN 'BIGINT' THEN 'int' WHEN 'UBIGINT' THEN 'int'
           WHEN 'HUGEINT' THEN 'int'
           WHEN 'DOUBLE' THEN CASE WHEN xv IS NOT NULL AND (xv % 1) = 0
                                   THEN 'int' ELSE 'float' END
           WHEN 'VARCHAR' THEN 'string' WHEN 'ARRAY' THEN 'array'
           WHEN 'OBJECT' THEN 'object' ELSE 'other' END AS vtype
  FROM keyed
),
agg AS (SELECT key, vtype, count(*)::BIGINT AS n FROM canon GROUP BY 1, 2)
SELECT key, vtype, n,
       round(n / (sum(n) OVER (PARTITION BY key)) + 1e-9, 6) + 0.0 AS share
FROM agg
"""


def test_type_profile_matches_duckdb_on_all_seven_types(spark):
    sdf = spark.createDataFrame([(b,) for b in BLOBS], ["js"])
    got = {
        (r["key"], r["vtype"]): (r["n"], r["share"])
        for r in json_type_profile(sdf, "js").collect()
    }
    df = pd.DataFrame({"js": BLOBS})  # noqa: F841 (registered below)
    want = {
        (k, v): (n, s)
        for k, v, n, s in duckdb.connect().execute(DUCK_SQL).fetchall()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6), k
    # every canonical type is exercised
    assert {v for (_k, v) in got} == {
        "null", "bool", "int", "float", "string", "array", "object",
    }


def test_type_profile_shares_and_mixed_key(spark):
    sdf = spark.createDataFrame([(b,) for b in BLOBS], ["js"])
    got = {
        (r["key"], r["vtype"]): (r["n"], r["share"])
        for r in json_type_profile(sdf, "js").collect()
    }
    # "mix" appears 4x: 1 (int), "one" (string), 2.0 (INTEGER-VALUED ->
    # int under the value-based contract), true (bool)
    assert got[("mix", "int")] == (2, pytest.approx(0.5, abs=1e-6))
    for vt in ("string", "bool"):
        assert got[("mix", vt)] == (1, pytest.approx(0.25, abs=1e-6))
    assert ("mix", "float") not in got
    # "a": 5 ints + 1 null of 6
    assert got[("a", "int")] == (5, pytest.approx(5 / 6, abs=2e-6))
    assert got[("a", "null")] == (1, pytest.approx(1 / 6, abs=2e-6))
    # >uint64 integer and 1e5 are integer-VALUED -> int on BOTH engines
    assert got[("big", "int")][0] == 1
    assert got[("sci", "int")][0] == 1
    # shares sum to 1 per key
    sums = {}
    for (k, _v), (_n, s) in got.items():
        sums[k] = sums.get(k, 0.0) + s
    assert all(abs(s - 1.0) < 1e-5 for s in sums.values())


def test_type_profile_malformed_and_empty(spark):
    # malformed and NULL blobs contribute no keys (presence accounting
    # is json_key_profile's job)
    sdf = spark.createDataFrame(
        [("{bad",), (None,), ("[1,2]",), ("{}",)], ["js"]
    )
    assert json_type_profile(sdf, "js").count() == 0
    empty = spark.createDataFrame([], "js string")
    assert json_type_profile(empty, "js").count() == 0
