"""Property-based and negative-path tests.

The hypothesis test models MERGE as a dict-upsert and checks the
distributed implementation against it on arbitrary small inputs —
the correctness story the 50-row golden fixture can't give alone.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_by_example_spark.tables.versioned import VersionedTable

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.integers(min_value=-100, max_value=100)


rows_strategy = st.lists(
    st.tuples(KEYS, VALS), min_size=0, max_size=12, unique_by=lambda r: r[0]
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=rows_strategy, source=rows_strategy)
def test_merge_equals_dict_upsert(spark, tmp_path_factory, target, source):
    """merge(target, source) ≡ {**dict(target), **dict(source)}."""
    loc = str(tmp_path_factory.mktemp("prop") / "t")
    t = VersionedTable.create(spark, loc, schema="k bigint, v bigint")
    try:
        if target:
            t.append(spark.createDataFrame(target, "k bigint, v bigint"))
        src_df = spark.createDataFrame(source or [(None, None)], "k bigint, v bigint")
        if source:
            t.merge(src_df, on="k")
        got = {r["k"]: r["v"] for r in t.read().collect()}
        want = {**dict(target), **dict(source)}
        assert got == want
    finally:
        t.drop()


def test_read_unknown_branch_raises(spark, tmp_path):
    t = VersionedTable.create(spark, str(tmp_path / "t"), schema="k bigint")
    with pytest.raises(ValueError, match="unknown branch"):
        t.read(branch="nope")


def test_drop_main_branch_rejected(spark, tmp_path):
    t = VersionedTable.create(spark, str(tmp_path / "t2"), schema="k bigint")
    with pytest.raises(ValueError, match="cannot drop main"):
        t.drop_branch("main")


def test_create_existing_table_rejected(spark, tmp_path):
    loc = str(tmp_path / "t3")
    VersionedTable.create(spark, loc, schema="k bigint")
    with pytest.raises(ValueError, match="already exists"):
        VersionedTable.create(spark, loc, schema="k bigint")
    # if_not_exists is the reference's CREATE-if-absent idiom (WI:23)
    VersionedTable.create(spark, loc, schema="k bigint", if_not_exists=True)


def test_load_missing_table_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="no table"):
        VersionedTable.load(spark, str(tmp_path / "missing"))


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    """Iceberg MERGE cardinality rule: duplicate source keys error out."""
    t = VersionedTable.create(spark, str(tmp_path / "dupm"), schema="k bigint, v bigint")
    t.append(spark.createDataFrame([(1, 10)], "k bigint, v bigint"))
    dup_src = spark.createDataFrame([(1, 11), (1, 12)], "k bigint, v bigint")
    with pytest.raises(ValueError, match="duplicate key"):
        t.merge(dup_src, on="k")
    # escape hatch keeps last-writer-ambiguous behavior opt-in
    t.merge(dup_src.dropDuplicates(["k"]), on="k")
    assert t.read().count() == 1
