"""Merkle hierarchical diff: equivalence with the classic reconcile,
pruning effectiveness, digest stability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ig_etl_sync_spark.operators.merkle import (
    bucket_digests,
    changed_buckets,
    md5_row_digest,
    merkle_diff,
)
from ig_etl_sync_spark.operators.reconcile import reconcile, snapshot_of


def _rows(n, bump=()):  # bump: ids whose payload changed
    return [
        (str(i), f"v{i}x" if i in bump else f"v{i}") for i in range(n)
    ]


@pytest.fixture()
def frames(spark):
    def mk(rows):
        return spark.createDataFrame(rows, ["external_id", "payload"])

    return mk


def _diff_sets(d):
    creates = {tuple(r) for r in d.to_create.select("external_id", "payload").collect()}
    deletes = {r.external_id for r in d.to_delete.collect()}
    return creates, deletes


@pytest.mark.parametrize("n_buckets", [1, 7, 64])
def test_merkle_equivalent_to_reconcile(frames, n_buckets):
    """Same creates/deletes as the classic full diff: changed payloads,
    new keys, removed keys, all at several bucket granularities."""
    prev = frames(_rows(100))  # keys 0..99
    cur = frames(_rows(103, bump={5, 50}))  # +3 new keys, 2 changed
    cur = cur.where(F.col("external_id") != "7")  # 1 deleted
    snap = snapshot_of(prev, prefer_cols=("payload",))

    classic = _diff_sets(reconcile(cur, snap, prefer_cols=("payload",)))
    merkle = merkle_diff(cur, snap, n_buckets=n_buckets, prefer_cols=("payload",))
    assert _diff_sets(merkle.diff) == classic
    creates, deletes = classic
    assert {p for _, p in creates} == {"v5x", "v50x", "v100", "v101", "v102"}
    assert deletes == {"7"}


def test_merkle_prunes_buckets(frames):
    """1 changed key out of 500 -> exactly 1 changed bucket of 64."""
    prev = frames(_rows(500))
    cur = frames(_rows(500, bump={123}))
    snap = snapshot_of(prev, prefer_cols=("payload",))
    m = merkle_diff(cur, snap, n_buckets=64, prefer_cols=("payload",))
    assert m.changed.count() == 1
    creates, deletes = _diff_sets(m.diff)
    assert creates == {("123", "v123x")} and deletes == set()


def test_merkle_no_change_empty_everywhere(frames):
    prev = frames(_rows(200))
    snap = snapshot_of(prev, prefer_cols=("payload",))
    m = merkle_diff(frames(_rows(200)), snap, n_buckets=32, prefer_cols=("payload",))
    assert m.changed.count() == 0
    assert m.diff.is_empty()


def test_merkle_first_sync_none_snapshot(frames):
    cur = frames(_rows(10))
    m = merkle_diff(cur, None, n_buckets=16, prefer_cols=("payload",))
    creates, deletes = _diff_sets(m.diff)
    assert len(creates) == 10 and deletes == set()


def test_merkle_duplicate_incoming_keys(frames, spark):
    """Duplicate keys in one batch must not make an unchanged bucket
    look changed vs the deduped snapshot-form digest, and the diff keeps
    reconcile's semantics (dup rows both reach the create set when the
    winning hash differs from the snapshot)."""
    prev = frames([("1", "a"), ("2", "b")])
    snap = snapshot_of(prev, prefer_cols=("payload",))
    cur = frames([("1", "a"), ("1", "a"), ("2", "B")])
    classic = _diff_sets(reconcile(cur, snap, prefer_cols=("payload",)))
    m = merkle_diff(cur, snap, n_buckets=8, prefer_cols=("payload",))
    assert _diff_sets(m.diff) == classic


def test_prev_digests_shortcut(frames):
    """Passing persisted digests of the previous snapshot gives the
    same answer as re-digesting it."""
    prev = frames(_rows(100))
    cur = frames(_rows(100, bump={3}))
    snap = snapshot_of(prev, prefer_cols=("payload",))
    d_prev = bucket_digests(snap, 16)
    m = merkle_diff(cur, snap, n_buckets=16, prefer_cols=("payload",), prev_digests=d_prev)
    creates, _ = _diff_sets(m.diff)
    assert creates == {("3", "v3x")}


def test_digest_partition_independence(frames):
    """XOR digest must not depend on physical layout."""
    df = frames(_rows(300))
    snap = snapshot_of(df, prefer_cols=("payload",))
    a = {tuple(r) for r in bucket_digests(snap, 16).collect()}
    b = {tuple(r) for r in bucket_digests(snap.repartition(13), 16).collect()}
    assert a == b


def test_changed_buckets_one_sided(spark):
    cur = spark.createDataFrame([(0, 1, 1), (1, 5, 2)], "bucket long, digest long, n long")
    prev = spark.createDataFrame([(0, 1, 1), (2, 9, 1)], "bucket long, digest long, n long")
    got = {r.bucket for r in changed_buckets(cur, prev).collect()}
    assert got == {1, 2}


def test_md5_row_digest_deterministic(frames):
    df = snapshot_of(frames(_rows(50)), prefer_cols=("payload",))
    a = {tuple(r) for r in bucket_digests(df, 8, row_digest=md5_row_digest).collect()}
    b = {tuple(r) for r in bucket_digests(df, 8, row_digest=md5_row_digest).collect()}
    assert a == b


def test_merkle_pruned_join_broadcasts(frames):
    """The changed-bucket prune must be a broadcast semi join (never a
    shuffle of the big side against a 64-row frame)."""
    prev = frames(_rows(100))
    cur = frames(_rows(100, bump={9}))
    snap = snapshot_of(prev, prefer_cols=("payload",))
    m = merkle_diff(cur, snap, n_buckets=64, prefer_cols=("payload",))
    p = m.diff.to_create._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
