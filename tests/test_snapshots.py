"""S7 snapshot time travel: partitioned store + deleted-row recovery.

Reference semantics: ogm.py:434-449 reads a deleted file's prior content
from the parent git commit tree; here the prior content comes from the
latest earlier snapshot partition.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from geoharvest_spark.snapshots import (
    SNAPSHOT_COLS,
    SnapshotStore,
    deleted_payloads,
    synth_snapshot_df,
    synth_snapshot_rows,
)


def _pay(i: int, v: int) -> str:
    return hashlib.md5(f"rec{i}-v{v}".encode()).hexdigest()


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snapstore"))
    st = SnapshotStore(spark, root)
    pdf = synth_snapshot_rows()
    for snap in (1, 2, 3):
        part = pdf[pdf["snap"] == snap].drop(columns=["snap"])
        st.write_snapshot(
            spark.createDataFrame(part, "identifier string, event string, payload string"),
            snap,
        )
    return st


def test_read_snapshot_time_travel(store):
    # AS OF snap 1: everything present at v1
    t1 = store.read_snapshot(1).toPandas().set_index("identifier")
    assert len(t1) == 60
    assert t1.loc["rec0003", "payload"] == _pay(3, 1)
    # AS OF snap 2: %3 ids updated to v2, others still v1
    t2 = store.read_snapshot(2).toPandas().set_index("identifier")
    assert t2.loc["rec0003", "payload"] == _pay(3, 2)
    assert t2.loc["rec0004", "payload"] == _pay(4, 1)
    # AS OF snap 3: %5 ids deleted
    t3 = store.read_snapshot(3).toPandas()
    assert len(t3) == 48  # 60 - 12 deleted
    assert "rec0005" not in set(t3.identifier)


def test_snapshot_scan_prunes_partitions(store):
    plan = store.table().where(F.col("snap") <= 2)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "snap" in plan


def test_deleted_payloads_recovers_prior_content(store):
    out = deleted_payloads(store.table(), 3).toPandas().set_index("identifier")
    # 12 ids deleted (%5 of 60)
    assert len(out) == 12
    # rec0000: updated in snap 2 -> recovered payload is v2 from snap 2
    assert out.loc["rec0000", "payload"] == _pay(0, 2)
    assert out.loc["rec0000", "from_snap"] == 2
    # rec0005: never updated -> v1 from snap 1
    assert out.loc["rec0005", "payload"] == _pay(5, 1)
    assert out.loc["rec0005", "from_snap"] == 1


def test_write_snapshot_idempotent(store, spark):
    # rewriting snapshot 3 replaces (not duplicates) the partition
    pdf = synth_snapshot_rows()
    part = pdf[pdf["snap"] == 3].drop(columns=["snap"])
    store.write_snapshot(
        spark.createDataFrame(part, "identifier string, event string, payload string"),
        3,
    )
    n = store.table().where(F.col("snap") == 3).count()
    assert n == 12


def test_synth_snapshot_df_matches_rows(spark):
    a = synth_snapshot_df(spark).toPandas()
    b = synth_snapshot_rows()
    assert len(a) == len(b)
    assert set(SNAPSHOT_COLS.replace(" int", "").replace(" string", "").split(", ")) == set(a.columns)


def test_apply_changes_merge_semantics(spark):
    from geoharvest_spark.snapshots import apply_changes

    snap = spark.createDataFrame(
        [(1, "alpha", 10), (2, "beta", 20), (3, "gamma", 30)],
        "k long, name string, v long",
    )
    # unique seq per key (CDC log offsets); latest change wins
    changes = spark.createDataFrame(
        [
            (2, "U", 1, "beta2", 21),   # superseded
            (2, "U", 2, "beta3", 22),   # wins
            (3, "D", 1, None, None),    # delete
            (4, "I", 1, "delta", 40),   # insert new key
            (5, "I", 1, "eps", 50),     # insert then delete -> absent
            (5, "D", 2, None, None),
            (6, "D", 1, None, None),    # delete of unknown key -> no-op
        ],
        "k long, op string, seq long, name string, v long",
    )
    got = {
        r["k"]: (r["name"], r["v"])
        for r in apply_changes(snap, changes, "k").collect()
    }
    assert got == {
        1: ("alpha", 10),   # untouched passes through
        2: ("beta3", 22),   # latest update
        4: ("delta", 40),   # insert
    }


def test_apply_changes_rejects_op_seq_collision(spark):
    import pytest as _pt

    from geoharvest_spark.snapshots import apply_changes

    snap = spark.createDataFrame([(1, "x")], "k long, op string")
    ch = spark.createDataFrame(
        [(1, "U", 1, "y")], "k long, op string, seq long, v string"
    )
    with _pt.raises(ValueError, match="collide"):
        apply_changes(snap, ch, "k")
