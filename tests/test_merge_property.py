"""Property-based MERGE parity: hypothesis generates random batched
upsert histories (key collisions, stale updates, multi-batch chains);
after replaying every batch through merge_upsert, the latest snapshot
must equal a dict-based last-writer-wins reference."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from htm_streamer_spark.sources.table_io import ManifestCatalog, merge_upsert

SCHEMA = "k long, v string, updated_at long"

# per-batch: distinct (key, order) pairs — the documented determinism
# contract (two same-key same-order updates in ONE batch tie arbitrarily)
batch = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 9)),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],
)
history = st.lists(batch, min_size=1, max_size=4)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history)
def test_merge_replay_matches_dict_reference(spark, tmp_path_factory, hist):
    cat = ManifestCatalog(tmp_path_factory.mktemp("cat"))
    ref: dict[int, tuple[str, int]] = {}
    for bi, b in enumerate(hist):
        rows = [(k, f"b{bi}k{k}", order) for k, order in b]
        merge_upsert(
            spark, cat, "t",
            spark.createDataFrame(rows, SCHEMA),
            ["k"], "updated_at", n_buckets=4,
        )
        for k, order in b:
            # latest-wins; an update beats an existing row on a tie
            if k not in ref or order >= ref[k][1]:
                ref[k] = (f"b{bi}k{k}", order)
    got = {
        r.k: (r.v, r.updated_at)
        for r in cat.read(spark, "t", latest_only=True).collect()
    }
    assert got == ref
