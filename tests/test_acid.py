"""Transactional-table protocol tests (plans/acid.py): atomic commit,
optimistic concurrency with rebase, snapshot isolation / time travel,
compaction, and crash-residue tolerance."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tmdb_movie_data_pipeline_spark.plans.acid import CommitConflict, TxTable


def _mk(spark, tmp_path, rows=None):
    df = spark.createDataFrame(
        rows or [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, v double"
    )
    return TxTable.create(spark, str(tmp_path / "tbl"), df)


def _content(df):
    return sorted(tuple(r) for r in df.collect())


def test_create_read_roundtrip(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert t.latest_version() == 0
    assert _content(t.read()) == [(1, "a", 10.0), (2, "b", 20.0)]


def test_merge_commits_new_version_and_preserves_old(spark, tmp_path):
    t = _mk(spark, tmp_path)
    src = spark.createDataFrame([(2, "b2", 22.0), (3, "c", 30.0)], "k long, name string, v double")
    assert t.merge(src, "k") == 1
    assert _content(t.read()) == [(1, "a", 10.0), (2, "b2", 22.0), (3, "c", 30.0)]
    # snapshot isolation: version 0 is untouched by the merge
    assert _content(t.read(0)) == [(1, "a", 10.0), (2, "b", 20.0)]
    ops = [m["op"] for m in t.history()]
    assert ops[0] == "CREATE" and ops[1].startswith("MERGE")


def test_publish_is_put_if_absent(spark, tmp_path):
    """Two writers racing for the same version: exactly one manifest wins."""
    t = _mk(spark, tmp_path)
    m = {"version": 1, "op": "X", "files": [], "schema_ddl": "k long"}
    t._publish(dict(m))
    with pytest.raises(CommitConflict):
        t._publish(dict(m))
    # the loser's tmp file must not linger
    residue = [n for n in os.listdir(t._log_path()) if n.startswith(".tmp-")]
    assert residue == []


def test_merge_rebases_after_conflicting_commit(spark, tmp_path):
    """A competing commit lands between a writer's read and its publish; the
    writer must rebase onto the winner's snapshot, so BOTH changes land."""
    t = _mk(spark, tmp_path)
    other = TxTable(spark, t.path)
    competing = spark.createDataFrame([(3, "c", 30.0)], "k long, name string, v double")
    fired = {"done": False}

    def interleave():
        if not fired["done"]:
            fired["done"] = True
            other.merge(competing, "k")

    src = spark.createDataFrame([(1, "a2", 11.0)], "k long, name string, v double")
    v = t.merge(src, "k", _test_hook=interleave)
    assert v == 2  # rebased past the competing version 1
    assert _content(t.read()) == [(1, "a2", 11.0), (2, "b", 20.0), (3, "c", 30.0)]


def test_optimize_same_content_fewer_files(spark, tmp_path):
    rows = [(i, f"n{i}", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, name string, v double").repartition(8)
    t = TxTable.create(spark, str(tmp_path / "tbl"), df)
    before = _content(t.read())
    n_before = len(t.manifest(t.latest_version())["files"])
    assert n_before > 1
    t.optimize(target_files=1)
    assert len(t.manifest(t.latest_version())["files"]) == 1
    assert _content(t.read()) == before


def test_uncommitted_stage_dirs_are_invisible(spark, tmp_path):
    """A crashed writer leaves staged data but no manifest: readers never
    see it, and the next version number is unaffected."""
    t = _mk(spark, tmp_path)
    orphan = spark.createDataFrame([(9, "z", 99.0)], "k long, name string, v double")
    t._stage(orphan, 1)  # staged, never published — a simulated crash
    assert _content(t.read()) == [(1, "a", 10.0), (2, "b", 20.0)]
    src = spark.createDataFrame([(3, "c", 30.0)], "k long, name string, v double")
    assert t.merge(src, "k") == 1
    assert (3, "c", 30.0) in _content(t.read())


def test_merge_prunes_untouched_files(spark, tmp_path):
    """With footer stats on the key, a MERGE touching a narrow key range
    rewrites only intersecting files; the rest are carried into the new
    manifest by reference — same rel paths, never restaged (VERDICT r2 #5)."""
    base = spark.range(0, 800).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("double").alias("v"),
    ).repartitionByRange(8, "k")
    t = TxTable.create(spark, str(tmp_path / "tbl"), base, stats_key="k")
    m0 = t.manifest(0)
    assert len(m0["files"]) == 8
    assert all(m0["stats"][rel] for rel in m0["files"])

    # update keys 10..20 (one file's range) + insert far out of range
    src = spark.createDataFrame(
        [(k, 999.0) for k in range(10, 21)] + [(10_000, 1.0)], "k long, v double"
    )
    t.merge(src, "k")
    m1 = t.manifest(1)

    reused = set(m0["files"]) & set(m1["files"])
    rewritten_v0 = set(m0["files"]) - set(m1["files"])
    assert len(reused) == 7, f"expected 7 carried files, got {len(reused)}"
    assert len(rewritten_v0) == 1
    # carried files keep their stats in the new manifest
    assert all(m1["stats"][rel] == m0["stats"][rel] for rel in reused)

    # content equals a plain full upsert
    got = {(r.k, r.v) for r in t.read().collect()}
    want = {(k, float(k * 2)) for k in range(800) if not (10 <= k <= 20)}
    want |= {(k, 999.0) for k in range(10, 21)} | {(10_000, 1.0)}
    assert got == want
    # snapshot isolation still holds for v0
    assert t.read(0).count() == 800


def test_merge_without_stats_falls_back_to_full_rewrite(spark, tmp_path):
    t = _mk(spark, tmp_path)  # created without stats_key
    src = spark.createDataFrame([(2, "b2", 22.0)], "k long, name string, v double")
    t.merge(src, "k")
    m1 = t.manifest(1)
    assert "stats_key" not in m1
    assert not (set(t.manifest(0)["files"]) & set(m1["files"]))
    assert _content(t.read()) == [(1, "a", 10.0), (2, "b2", 22.0)]


def test_delete_range_prunes_untouched_files(spark, tmp_path):
    """DELETE on a narrow key range rewrites only the intersecting files
    (range-vs-range footer pruning is exact); untouched files carry by
    reference, the deleted rows are gone, v0 stays intact, and a follow-up
    OPTIMIZE compacts without changing content."""
    base = spark.range(0, 800).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("double").alias("v"),
    ).repartitionByRange(8, "k")
    t = TxTable.create(spark, str(tmp_path / "tbl"), base, stats_key="k")
    m0 = t.manifest(0)
    assert len(m0["files"]) == 8

    t.delete_range("k", 10, 20)  # inside one file's range
    m1 = t.manifest(1)
    reused = set(m0["files"]) & set(m1["files"])
    assert len(reused) == 7, f"expected 7 carried files, got {len(reused)}"
    got = {r.k for r in t.read().collect()}
    assert got == {k for k in range(800) if not (10 <= k <= 20)}
    assert t.read(0).count() == 800  # snapshot isolation

    v2 = t.optimize(2)
    assert t.read(v2).count() == 800 - 11
    assert len(t.manifest(v2)["files"]) <= 2


import pytest


@pytest.mark.parametrize(
    "lo,hi,expect_kept,expect_carried",
    [
        (900, 999, 800, 8),   # range misses every file: all carried, no-op
        (0, 799, 0, 0),       # range covers the table: full rewrite, empty
        (100, 100, 799, 7),   # single key: one file touched
    ],
)
def test_delete_range_edges(spark, tmp_path, lo, hi, expect_kept, expect_carried):
    base = spark.range(0, 800).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("double").alias("v")
    ).repartitionByRange(8, "k")
    t = TxTable.create(spark, str(tmp_path / "tbl"), base, stats_key="k")
    m0 = t.manifest(0)
    t.delete_range("k", lo, hi)
    m1 = t.manifest(1)
    assert t.read().count() == expect_kept
    assert len(set(m0["files"]) & set(m1["files"])) == expect_carried
    # deleted keys truly gone; snapshot v0 untouched
    assert t.read().filter(F.col("k").between(lo, hi)).count() == 0
    assert t.read(0).count() == 800


def test_benched_merge_scenario_takes_pruned_path(spark, tmp_path):
    """The pruned path is CORRECT on the benched `delta_merge_upsert_read`
    data even though the registered query deliberately skips it (VERDICT
    r4 item #5 — its %5-key source spans every file's range, so pruning
    skips nothing and only adds overhead there; see the query docstring).
    This pins that when stats ARE enabled on that exact scenario, the
    machinery engages (stats at v0, split computed, stats re-recorded at
    v1) and conservatively marks all files touched; genuine carry is
    covered by test_merge_prunes_untouched_files."""
    from tmdb_movie_data_pipeline_spark.operators.merge import (
        _tx_base,
        _tx_source,
    )

    sf = "/root/testdata/sf0.001"
    t = TxTable.create(
        spark, str(tmp_path / "tbl"), _tx_base(spark, sf), stats_key="c_custkey"
    )
    m0 = t.manifest(0)
    assert m0["stats_key"] == "c_custkey"
    assert all(m0["stats"][rel] for rel in m0["files"])

    src = _tx_source(spark, sf)
    split = t._touched_files(m0, src, "c_custkey")
    assert split is not None, "benched merge must take the pruned path"
    touched, untouched = split
    # %5 keys intersect every file's [min, max]: conservative == all touched
    assert set(touched) == set(m0["files"]) and not untouched

    t.merge(src, "c_custkey")
    m1 = t.manifest(1)
    assert m1["stats_key"] == "c_custkey"
    assert all(m1["stats"][rel] for rel in m1["files"])


def test_vacuum_deletes_only_unreferenced_files(spark, tmp_path):
    """VACUUM contract: files of retained manifests survive byte-for-byte,
    everything else is gone, the current snapshot is unchanged, and a
    vacuumed version's read fails (files removed, manifest kept)."""
    from tmdb_movie_data_pipeline_spark.operators.merge import (
        _tx_base,
        _tx_source,
    )

    sf = "/root/testdata/sf0.001"
    base = _tx_base(spark, sf).repartitionByRange(4, "c_custkey")
    t = TxTable.create(spark, str(tmp_path / "tbl"), base, stats_key="c_custkey")
    t.merge(_tx_source(spark, sf), "c_custkey")
    t.delete_range("c_custkey", 1, 30)
    t.optimize(1)

    before = sorted(map(tuple, t.read().collect()))
    data_root = os.path.join(t.path, "data")
    n_files_before = sum(
        1 for _r, _d, names in os.walk(data_root)
        for n in names if n.endswith(".parquet")
    )
    stats = t.vacuum(keep_latest=1)
    n_files_after = sum(
        1 for _r, _d, names in os.walk(data_root)
        for n in names if n.endswith(".parquet")
    )
    # something was reclaimed, and exactly the retained set survives
    assert stats["n_deleted"] > 0 and stats["bytes_deleted"] > 0
    assert n_files_after == n_files_before - stats["n_deleted"]
    assert n_files_after == len(t.manifest(t.latest_version())["files"])
    # current snapshot identical across the physical deletion
    assert sorted(map(tuple, t.read().collect())) == before
    # history stays auditable, but a vacuumed version can't be read
    assert len(t.versions()) == 4
    with pytest.raises(Exception):
        t.read(0).collect()


# -- TxGroup: multi-table atomicity -------------------------------------------


def _tiers(spark, tmp_path):
    from tmdb_movie_data_pipeline_spark.plans.acid import TxTable
    from tmdb_movie_data_pipeline_spark.plans.txgroup import TxGroup

    a = TxTable.create(
        spark, str(tmp_path / "a"), spark.range(0, 10).withColumnRenamed("id", "k")
    )
    b = TxTable.create(
        spark, str(tmp_path / "b"), spark.range(10, 30).withColumnRenamed("id", "k")
    )
    return TxGroup(spark, str(tmp_path)), a, b


def test_txgroup_commit_moves_rows_atomically(spark, tmp_path):
    from pyspark.sql import functions as F

    g, a, b = _tiers(spark, tmp_path)
    moved = g.read(b).filter(F.col("k") < 15)
    g.transact(
        [
            (a, g.read(a).unionByName(moved)),
            (b, g.read(b).filter(F.col("k") >= 15)),
        ],
        "MOVE",
    )
    ka = {r.k for r in g.read(a).collect()}
    kb = {r.k for r in g.read(b).collect()}
    assert ka == set(range(15)) and kb == set(range(15, 30))
    assert not (ka & kb)  # conservation: moved, never duplicated


def test_txgroup_crash_before_group_record_is_invisible_everywhere(
    spark, tmp_path
):
    """Prepare publishes pending manifests on BOTH tables, then 'crash':
    no group record. Group-aware reads must fall back to the previous
    visible version on BOTH members — no partial state."""
    from pyspark.sql import functions as F

    g, a, b = _tiers(spark, tmp_path)
    before_a = sorted(r.k for r in g.read(a).collect())
    before_b = sorted(r.k for r in g.read(b).collect())
    gid = g.prepare(
        [
            (a, g.read(a).unionByName(g.read(b).filter(F.col("k") < 15))),
            (b, g.read(b).filter(F.col("k") >= 15)),
        ],
        "MOVE",
    )
    # the pending versions exist in both logs...
    assert a.latest_version() == 1 and b.latest_version() == 1
    # ...but neither is visible without the group record
    assert sorted(r.k for r in g.read(a).collect()) == before_a
    assert sorted(r.k for r in g.read(b).collect()) == before_b
    # late recovery: writing the record commits BOTH at one instant
    g.commit(gid, [a.path, b.path])
    assert {r.k for r in g.read(a).collect()} == set(range(15))
    assert {r.k for r in g.read(b).collect()} == set(range(15, 30))


def test_txgroup_next_writer_skips_aborted_pending(spark, tmp_path):
    """An ABORTED prepare's slot is dead: a later SINGLE-table commit
    lands on top and becomes visible, while the aborted version stays
    invisible forever (its manifest remains in the log for audit)."""
    from pyspark.sql import functions as F

    g, a, b = _tiers(spark, tmp_path)
    gid = g.prepare([(a, g.read(a).filter(F.col("k") < 3))], "ABANDONED")
    assert g.abort(gid) is True
    assert a.pending_slots() == []  # tombstoned, not pending
    # independent later commit on the next slot (normal TxTable path)
    a._commit(g.read(a).unionByName(spark.range(100, 102).withColumnRenamed("id", "k")), 2, "APPEND")  # noqa: SLF001
    ks = sorted(r.k for r in g.read(a).collect())
    assert ks == list(range(10)) + [100, 101]
    # the aborted version is permanently invisible but still in history
    assert a.latest_visible_version() == 2
    assert 1 in a.versions()


def test_prepare_partial_failure_self_aborts(spark, tmp_path):
    """A prepare that conflicts on a LATER member must roll back the
    earlier members (ADVICE r6): the abort record tombstones every
    already-prepared manifest, so nothing stays pending and transactional
    writers are not wedged."""
    from pyspark.sql import functions as F

    from tmdb_movie_data_pipeline_spark.plans.acid import CommitConflict

    g, a, b = _tiers(spark, tmp_path)
    # inject a slot race on the SECOND member: a competing writer wins b's
    # slot between prepare's version pick and its publish
    real_commit = b._commit  # noqa: SLF001

    def racing_commit(df, version, op, **kw):
        if kw.get("extra", {}).get("pending_group"):
            real_commit(g.read(b), version, "RACE")  # competitor lands first
        return real_commit(df, version, op, **kw)

    b._commit = racing_commit
    import pytest

    with pytest.raises(CommitConflict):
        g.prepare(
            [
                (a, g.read(a).filter(F.col("k") < 3)),
                (b, g.read(b).filter(F.col("k") >= 25)),
            ],
            "DOOMED",
        )
    # member a's prepared manifest exists but is tombstoned, not pending
    assert a.latest_version() == 1
    assert a.pending_slots() == []
    assert a.latest_visible_version() == 0
    assert sorted(r.k for r in a.read().collect()) == list(range(10))
    # a transactional writer proceeds immediately — no permanent wedge
    a.delete_range("k", 0, 4)
    assert sorted(r.k for r in a.read().collect()) == list(range(5, 10))


def test_commit_abort_race_is_decided_once(spark, tmp_path):
    """Commit and abort contend on the same create-exclusive record:
    whichever lands first wins permanently; the loser raises."""
    import pytest
    from pyspark.sql import functions as F

    from tmdb_movie_data_pipeline_spark.plans.txgroup import GroupAborted

    g, a, b = _tiers(spark, tmp_path)
    gid1 = g.prepare([(a, g.read(a).filter(F.col("k") < 3))], "T1")
    assert g.abort(gid1) is True
    assert g.abort(gid1) is False  # idempotent replay
    with pytest.raises(GroupAborted):
        g.commit(gid1, [a.path])
    gid2 = g.prepare([(b, g.read(b).filter(F.col("k") < 20))], "T2")
    g.commit(gid2, [b.path])
    g.commit(gid2, [b.path])  # recovery replay of the commit point: no-op
    with pytest.raises(ValueError, match="already committed"):
        g.abort(gid2)
    assert sorted(r.k for r in b.read().collect()) == list(range(10, 20))


def test_merge_refuses_pending_group_then_lands_after_abort(spark, tmp_path):
    """MERGE over a prepared group slot must refuse (the group's later
    commit would silently shadow it on this member only — lost update,
    ADVICE r6), exactly like the streaming sink; after the group aborts,
    the same merge lands."""
    import pytest
    from pyspark.sql import functions as F

    from tmdb_movie_data_pipeline_spark.plans.acid import PendingGroupConflict

    g, a, b = _tiers(spark, tmp_path)
    gid = g.prepare([(a, g.read(a).filter(F.col("k") < 3))], "IN_FLIGHT")
    source = spark.range(100, 103).withColumnRenamed("id", "k")
    with pytest.raises(PendingGroupConflict):
        a.merge(source, "k")
    with pytest.raises(PendingGroupConflict):
        a.delete_range("k", 0, 4)
    g.abort(gid)
    a.merge(source, "k")
    assert sorted(r.k for r in a.read().collect()) == list(range(10)) + [
        100,
        101,
        102,
    ]


def test_sink_unwedges_after_group_abort(spark, tmp_path):
    """The sink's refusal is transient by construction: once the group
    aborts, the retried epoch lands — a dead tombstoned slot must never
    wedge streaming appends permanently (ADVICE r6)."""
    import pytest
    from pyspark.sql import functions as F

    from tmdb_movie_data_pipeline_spark.streaming.txtable_sink import TxTableSink

    g, a, b = _tiers(spark, tmp_path)
    gid = g.prepare([(a, g.read(a).filter(F.col("k") < 3))], "IN_FLIGHT")
    sink = TxTableSink(spark, a)
    batch = spark.range(100, 103).withColumnRenamed("id", "k")
    with pytest.raises(RuntimeError, match="in-flight group transaction"):
        sink.process_batch(batch, 0)
    g.abort(gid)
    sink.process_batch(batch, 0)  # foreachBatch retry after resolution
    assert sorted(r.k for r in a.read().collect()) == list(range(10)) + [
        100,
        101,
        102,
    ]


def test_vacuum_reclaims_aborted_group_files(spark, tmp_path):
    """An aborted prepare's staged files are garbage with a tombstone
    saying so — VACUUM reclaims them while the visible snapshot and any
    still-PENDING prepare survive untouched."""
    from pyspark.sql import functions as F

    g, a, b = _tiers(spark, tmp_path)
    gid = g.prepare([(a, g.read(a).filter(F.col("k") < 3))], "DOOMED")
    before = a.vacuum(keep_latest=1)
    assert before["n_deleted"] == 0  # pending: files pinned
    g.abort(gid)
    after = a.vacuum(keep_latest=1)
    assert after["n_deleted"] > 0  # tombstoned: files reclaimed
    assert sorted(r.k for r in a.read().collect()) == list(range(10))


def test_vacuum_spares_inflight_staging_dir(spark, tmp_path):
    """Never-published files are protected two ways: a version token above
    every claimed slot is certainly a live stage, and ANY young
    unreferenced file is spared by the grace window (a competitor can
    publish the same slot while the loser still writes — review r7, so
    slot number alone cannot prove a file dead). Old unreferenced files
    are lost-race debris and ARE reclaimed."""
    import os

    g, a, b = _tiers(spark, tmp_path)
    # in-flight stage for the NEXT slot (latest is 0): spared by version
    live = os.path.join(a.path, "data", "v1-inflight0000")
    os.makedirs(live)
    with open(os.path.join(live, "part-0.parquet"), "wb") as f:
        f.write(b"stub-bytes")
    # in-flight stage at the CURRENT slot (its writer lost the race but
    # may still be mid-write): young -> spared by the grace window
    racing = os.path.join(a.path, "data", "v0-racing000000")
    os.makedirs(racing)
    with open(os.path.join(racing, "part-0.parquet"), "wb") as f:
        f.write(b"stub-bytes")
    # old lost-race debris at the current slot: reclaimed
    lost = os.path.join(a.path, "data", "v0-lostrace0000")
    os.makedirs(lost)
    lost_file = os.path.join(lost, "part-0.parquet")
    with open(lost_file, "wb") as f:
        f.write(b"stub-bytes")
    os.utime(lost_file, (1, 1))  # ancient mtime: past any grace window
    a.vacuum(keep_latest=1)
    assert os.path.exists(os.path.join(live, "part-0.parquet"))
    assert os.path.exists(os.path.join(racing, "part-0.parquet"))
    assert not os.path.exists(lost_file)
    assert sorted(r.k for r in a.read().collect()) == list(range(10))


def test_txtable_sink_replayed_epoch_is_noop(spark, tmp_path):
    """The epoch marker rides the data commit: replaying a processed
    micro-batch must not append its rows again, and each distinct epoch
    is exactly one table version."""
    from tmdb_movie_data_pipeline_spark.plans.acid import TxTable
    from tmdb_movie_data_pipeline_spark.streaming.txtable_sink import TxTableSink

    table = TxTable.create(
        spark, str(tmp_path / "t"), spark.createDataFrame([], "k long")
    )
    sink = TxTableSink(spark, table)
    b0 = spark.range(0, 5).withColumnRenamed("id", "k")
    b1 = spark.range(5, 8).withColumnRenamed("id", "k")
    sink.process_batch(b0, 0)
    sink.process_batch(b1, 1)
    assert table.latest_version() == 2
    sink.process_batch(b0, 0)  # redelivery
    assert table.latest_version() == 2  # no new commit
    assert sorted(r.k for r in table.read().collect()) == list(range(8))
    assert sink.committed_epochs() == {0, 1}


def test_pending_group_is_invisible_to_plain_txtable_reads(spark, tmp_path):
    """The visibility rule lives in TxTable itself: a NON-group-aware
    reader (plain table.read()) skips an uncommitted pending version, and
    a later transactional writer refuses to commit above it — no
    coordinator required."""
    from pyspark.sql import functions as F

    g, a, b = _tiers(spark, tmp_path)
    g.prepare([(a, g.read(a).filter(F.col("k") < 3))], "ABANDONED")
    assert a.latest_version() == 1  # slot claimed...
    assert a.latest_visible_version() == 0  # ...but invisible
    assert sorted(r.k for r in a.read().collect()) == list(range(10))
    # a single-table transactional write REFUSES while the slot is pending
    # (committing above it would shadow the group's update — ADVICE r6)
    import pytest

    from tmdb_movie_data_pipeline_spark.plans.acid import PendingGroupConflict

    with pytest.raises(PendingGroupConflict):
        a.delete_range("k", 0, 4)


def test_vacuum_preserves_visible_snapshot_under_abandoned_prepare(
    spark, tmp_path
):
    """An abandoned prepare must not let VACUUM destroy the last visible
    snapshot (retention counts VISIBLE versions), nor reclaim the
    prepared files themselves (the group may still commit)."""
    from pyspark.sql import functions as F

    g, a, b = _tiers(spark, tmp_path)
    gid = g.prepare([(a, g.read(a).filter(F.col("k") < 3))], "IN_FLIGHT")
    a.vacuum(keep_latest=1)
    # the visible v0 still reads fine after the sweep
    assert sorted(r.k for r in a.read().collect()) == list(range(10))
    # late commit: the prepared files survived the sweep too
    g.commit(gid, [a.path])
    assert sorted(r.k for r in a.read().collect()) == [0, 1, 2]


def test_sink_append_refuses_to_shadow_pending_group(spark, tmp_path):
    """A streaming append landing while a group prepare is in flight must
    FAIL (foreachBatch will retry): committing above the pending slot
    would shadow this member's transactional version, so a later group
    commit would apply to other members but not here — partial state one
    table at a time. After the group resolves, the retried batch lands."""
    import pytest
    from pyspark.sql import functions as F

    from tmdb_movie_data_pipeline_spark.streaming.txtable_sink import TxTableSink

    g, a, b = _tiers(spark, tmp_path)
    gid = g.prepare([(a, g.read(a).filter(F.col("k") < 3))], "IN_FLIGHT")
    sink = TxTableSink(spark, a)
    batch = spark.range(100, 103).withColumnRenamed("id", "k")
    with pytest.raises(RuntimeError, match="in-flight group transaction"):
        sink.process_batch(batch, 0)
    # transaction commits; the retried epoch now lands exactly once,
    # carrying the GROUP's snapshot
    g.commit(gid, [a.path])
    sink.process_batch(batch, 0)
    assert sorted(r.k for r in a.read().collect()) == [0, 1, 2, 100, 101, 102]


def test_shallow_clone_delete_prunes_carried_absolute_refs(spark, tmp_path):
    """A stats-keyed clone's DELETE must engage file pruning over the
    ABSOLUTE cross-table references: files whose range misses the delete
    stay carried (still absolute, still the source's bytes), and the
    source is untouched."""
    from pyspark.sql import functions as F

    from tmdb_movie_data_pipeline_spark.plans.acid import TxTable

    base = (
        spark.range(0, 100)
        .withColumnRenamed("id", "k")
        .repartitionByRange(4, "k")
    )
    src = TxTable.create(spark, str(tmp_path / "src"), base, stats_key="k")
    clone = TxTable.shallow_clone(spark, str(tmp_path / "clone"), src)
    clone.delete_range("k", 10, 20)
    m = clone.manifest(clone.latest_visible_version())
    carried_abs = [f for f in m["files"] if f.startswith(str(tmp_path / "src"))]
    assert carried_abs, "pruning should carry untouched source files"
    assert sorted(r.k for r in clone.read().collect()) == [
        k for k in range(100) if not 10 <= k <= 20
    ]
    assert src.read().count() == 100  # source untouched


def test_merge_rejects_schema_drift(spark, tmp_path):
    """A MERGE source whose schema doesn't line up must fail loudly, not
    corrupt the table: the upsert's unionByName raises on the missing
    column, and the table's visible snapshot is untouched afterward."""
    import pytest

    from tmdb_movie_data_pipeline_spark.plans.acid import TxTable

    t = TxTable.create(
        spark,
        str(tmp_path / "t"),
        spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v"),
    )
    drifted = spark.range(0, 3).selectExpr("id AS k", "id AS WRONG_NAME")
    with pytest.raises(Exception):
        t.merge(drifted, "k")
    assert t.latest_visible_version() == 0  # nothing committed
    assert t.read().count() == 10


def test_every_write_path_refuses_pending_group(spark, tmp_path):
    """The pending-slot refusal lives in _commit (review r7) — so EVERY
    transactional writer refuses over a prepared group slot, including the
    ones the first cut missed: optimize, optimize_clustered, RESTORE, and
    a SECOND group's prepare on a shared member (whose self-abort then
    rolls back its own earlier members)."""
    import pytest
    from pyspark.sql import functions as F

    from tmdb_movie_data_pipeline_spark.plans.acid import (
        PendingGroupConflict,
        TxTable,
    )
    from tmdb_movie_data_pipeline_spark.plans.txgroup import TxGroup

    g, a, b = _tiers(spark, tmp_path)
    a._commit(g.read(a), 1, "APPEND")  # noqa: SLF001 — a restore target
    gid = g.prepare([(a, g.read(a).filter(F.col("k") < 3))], "IN_FLIGHT")
    with pytest.raises(PendingGroupConflict):
        a.optimize()
    with pytest.raises(PendingGroupConflict):
        a.optimize_clustered("k", target_files=2)
    with pytest.raises(PendingGroupConflict):
        a.restore(0)
    # a second coordinator sharing member `a` must refuse and self-abort:
    # its FIRST member (c) gets a pending manifest, which the abort then
    # tombstones so c is not wedged either
    c = TxTable.create(
        spark, str(tmp_path / "c"), spark.range(50, 60).withColumnRenamed("id", "k")
    )
    g2 = TxGroup(spark, str(tmp_path / "g2"))
    with pytest.raises(PendingGroupConflict):
        g2.prepare(
            [
                (c, spark.range(70, 75).withColumnRenamed("id", "k")),
                (a, g.read(a).filter(F.col("k") >= 5)),
            ],
            "SECOND_GROUP",
        )
    assert c.pending_slots() == []  # rolled back, not wedged
    # the first group resolves; writers proceed
    g.abort(gid)
    a.optimize()
    assert sorted(r.k for r in a.read().collect()) == list(range(10))


# -- merge-on-read deletion vectors -------------------------------------------


def test_dv_delete_rewrites_nothing_and_read_subtracts(spark, tmp_path):
    """delete_range_dv commits a position sidecar: the data-file list is
    byte-identical across DV commits, reads subtract the positions, and a
    second DV accumulates on the first. Time travel still sees v0 whole."""
    base = spark.range(0, 800).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("double").alias("v"),
    ).repartitionByRange(8, "k")
    t = TxTable.create(spark, str(tmp_path / "tbl"), base, stats_key="k")
    m0 = t.manifest(0)
    t.delete_range_dv("k", 10, 20)
    t.delete_range_dv("k", 500, 520)
    m2 = t.manifest(2)
    assert m2["files"] == m0["files"], "DV delete must not restage data"
    assert len(m2["dvs"]) >= 2  # both sidecars accumulated
    got = {r.k for r in t.read().collect()}
    assert got == {
        k for k in range(800) if not (10 <= k <= 20 or 500 <= k <= 520)
    }
    assert t.read(0).count() == 800  # snapshot isolation
    # schema-authority read path applies DVs too
    assert t.read(use_log_schema=True).count() == 800 - 11 - 21


def test_dv_purged_by_next_data_rewrite_without_resurrection(spark, tmp_path):
    """A data-writing commit after a DV delete must (a) NOT take the
    raw-file pruned path (which would resurrect DV-deleted rows) and
    (b) publish a DV-free manifest — Delta's compaction cadence."""
    base = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("double").alias("v")
    ).repartitionByRange(4, "k")
    t = TxTable.create(spark, str(tmp_path / "tbl"), base, stats_key="k")
    t.delete_range_dv("k", 0, 49)
    src = spark.createDataFrame([(395, 1.0), (2_000, 2.0)], "k long, v double")
    t.merge(src, "k")
    m = t.manifest(t.latest_visible_version())
    assert not m.get("dvs"), "merge after DV delete must purge the DVs"
    got = {(r.k, r.v) for r in t.read().collect()}
    assert (0, 0.0) not in got and (49, 98.0) not in got  # no resurrection
    assert (395, 1.0) in got and (2_000, 2.0) in got
    # delete_range (copy-on-write) likewise reads through DVs
    t2 = TxTable.create(
        spark,
        str(tmp_path / "tbl2"),
        base,
        stats_key="k",
    )
    t2.delete_range_dv("k", 0, 49)
    t2.delete_range("k", 100, 149)
    assert {r.k for r in t2.read().collect()} == {
        k for k in range(400) if k >= 50 and not (100 <= k <= 149)
    }
    assert not t2.manifest(t2.latest_visible_version()).get("dvs")


def test_dv_survives_restore_clone_and_vacuum(spark, tmp_path):
    """DVs are snapshot state: RESTORE re-references them, SHALLOW_CLONE
    carries them (absolute), and VACUUM treats retained DV sidecars as
    live while reclaiming unretained ones."""
    base = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("double").alias("v")
    ).repartitionByRange(2, "k")
    t = TxTable.create(spark, str(tmp_path / "tbl"), base, stats_key="k")
    t.delete_range_dv("k", 0, 9)  # v1
    t.optimize(1)  # v2: DV-free rewrite
    t.restore(1)  # v3: re-references v1's files + DVs
    m3 = t.manifest(3)
    assert m3.get("dvs"), "restore must carry the snapshot's DVs"
    assert t.read().count() == 190
    clone = TxTable.shallow_clone(spark, str(tmp_path / "clone"), t)
    assert clone.read().count() == 190
    assert all(os.path.isabs(rel) for rel in clone.manifest(0)["dvs"])
    # vacuum with the DV-bearing head retained keeps its sidecars readable
    t.vacuum(keep_latest=1, grace_seconds=0.0)
    assert t.read().count() == 190


# -- write-time change feed (CDF; VERDICT r14 #5) -----------------------------


def _mk_cdf(spark, tmp_path, stats: bool = False):
    """8-row table with the change_feed property on; ``stats=True`` also
    range-partitions into 4 files with footer stats so merge/delete take
    the file-PRUNED path (the change recorder must be exact under both)."""
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) * 10) for i in range(1, 9)],
        "k long, name string, v double",
    )
    if stats:
        df = df.repartitionByRange(4, "k")
    return TxTable.create(
        spark,
        str(tmp_path / "cdf"),
        df,
        stats_key="k" if stats else None,
        change_feed=True,
    )


def _cdf_source(spark):
    # (2, n2, 20.0) is IDENTICAL to the target row -> must record nothing;
    # (3, ...) differs -> update; (100, ...) is absent -> insert
    return spark.createDataFrame(
        [(2, "n2", 20.0), (3, "x", 999.0), (100, "new", 1.0)],
        "k long, name string, v double",
    )


def _python_snapshot_diff(t, v):
    """Independent plain-Python ledger rebuild (VERDICT r14 #6): diff two
    adjacent snapshots with dicts — no Spark joins — and emit the typed
    change rows the write-time recorder must have produced."""
    old = {r[0]: tuple(r) for r in t.read(v - 1).collect()}
    new = {r[0]: tuple(r) for r in t.read(v).collect()}
    out = set()
    for k, row in new.items():
        if k not in old:
            out.add(("insert", *row))
        elif row != old[k]:
            out.add(("update", *row))
    for k, row in old.items():
        if k not in new:
            out.add(("delete", *row))
    return out


@pytest.mark.parametrize("stats", [False, True], ids=["full-rewrite", "pruned"])
def test_change_rows_match_python_snapshot_diff(spark, tmp_path, stats):
    """Every commit's write-time change file equals the adjacent-snapshot
    diff rebuilt in plain Python — under BOTH the full-rewrite fallback
    and the footer-stats pruned path (where the pre-image is only the
    touched files; exactness of stats pruning is what's under test)."""
    t = _mk_cdf(spark, tmp_path, stats=stats)
    t.merge(_cdf_source(spark), "k")  # v1
    t.delete_range("k", 1, 2)  # v2
    for v in t.versions()[1:]:
        recorded = {tuple(r) for r in t.change_rows(v).collect()}
        assert recorded == _python_snapshot_diff(t, v), f"v{v} diverged"
    # the identical source row recorded NO change row
    v1 = {tuple(r) for r in t.change_rows(1).collect()}
    assert v1 == {("update", 3, "x", 999.0), ("insert", 100, "new", 1.0)}
    v2 = {tuple(r) for r in t.change_rows(2).collect()}
    assert v2 == {("delete", 1, "n1", 10.0), ("delete", 2, "n2", 20.0)}


def test_change_feed_never_rereads_snapshot_files(spark, tmp_path):
    """THE mandated pin (VERDICT r14 #5): assembling the full feed from
    change_rows() scans ONLY change files — no data file of any snapshot
    appears among the feed's input files, so read cost is O(changed rows)
    regardless of commit count."""
    t = _mk_cdf(spark, tmp_path, stats=True)
    t.merge(_cdf_source(spark), "k")
    t.delete_range("k", 1, 2)
    feed = None
    for v in t.versions()[1:]:
        ch = t.change_rows(v)
        assert ch is not None, "every commit recorded at write time"
        feed = ch if feed is None else feed.unionByName(ch)
    inputs = set(feed.inputFiles())
    assert inputs, "feed must scan the staged change files"
    assert all("-changes" in p for p in inputs), inputs
    data_files = {
        os.path.abspath(t._abs(rel))
        for m in t.history()
        for rel in m["files"]
    }
    assert not {os.path.abspath(p.removeprefix("file:")) for p in inputs} & data_files


def test_registered_cdc_feed_scans_only_change_files(spark, sf_dir):
    """The same pin on the REGISTERED query: delta_cdc_feed_commits (the
    driver-benched shape) must take the write-time path for every commit —
    zero snapshot re-reads."""
    from tmdb_movie_data_pipeline_spark.operators.merge import cdc_feed_commits

    df = cdc_feed_commits(spark, sf_dir)
    inputs = df.inputFiles()
    assert inputs and all("-changes" in p for p in inputs), inputs


def test_optimize_records_empty_changes_without_fallback(spark, tmp_path):
    """OPTIMIZE on a change-feed table records an EXPLICIT empty change
    list: change_rows() returns an empty frame (never None), so the feed
    never burns a snapshot diff on a compaction."""
    t = _mk_cdf(spark, tmp_path)
    t.merge(_cdf_source(spark), "k")
    v = t.optimize(1)
    ch = t.change_rows(v)
    assert ch is not None and ch.count() == 0
    assert ch.columns[0] == "change_type"


def test_restore_carries_property_but_falls_back_to_diff(spark, tmp_path):
    """RESTORE records no change file (its delta is old-head vs target,
    nothing a write computed) -> change_rows() is None and a feed reader
    falls back to the snapshot diff; the table PROPERTY survives, so the
    next write records again."""
    t = _mk_cdf(spark, tmp_path)
    t.merge(_cdf_source(spark), "k")  # v1
    rv = t.restore(0)  # v2
    assert t.change_rows(rv) is None
    t.delete_range("k", 1, 2)  # v3: property must still be on
    assert {tuple(r) for r in t.change_rows(3).collect()} == {
        ("delete", 1, "n1", 10.0),
        ("delete", 2, "n2", 20.0),
    }


def test_dv_delete_change_rows_skip_already_deleted(spark, tmp_path):
    """MoR (deletion-vector) deletes record change rows too — and a row an
    EARLIER DV already removed must not re-record when a later overlapping
    DV delete scans the same raw files."""
    base = spark.range(1, 11).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    t = TxTable.create(
        spark, str(tmp_path / "tbl"), base, stats_key="k", change_feed=True
    )
    t.delete_range_dv("k", 1, 3)  # v1 deletes 1,2,3
    t.delete_range_dv("k", 1, 5)  # v2 must record ONLY 4,5
    assert {tuple(r) for r in t.change_rows(1).collect()} == {
        ("delete", 1, 1.0),
        ("delete", 2, 2.0),
        ("delete", 3, 3.0),
    }
    assert {tuple(r) for r in t.change_rows(2).collect()} == {
        ("delete", 4, 4.0),
        ("delete", 5, 5.0),
    }
    assert _python_snapshot_diff(t, 2) == {
        ("delete", 4, 4.0),
        ("delete", 5, 5.0),
    }


def test_vacuum_retains_head_change_files_reclaims_old(spark, tmp_path):
    """Change files are table state under VACUUM: retained manifests keep
    theirs readable; unretained commits' change files are reclaimed (the
    feed is bounded by the retention window, exactly like Delta's CDF)."""
    t = _mk_cdf(spark, tmp_path)
    t.merge(_cdf_source(spark), "k")  # v1
    t.delete_range("k", 1, 2)  # v2 (head)
    v1_changes = [t._abs(rel) for rel in t.manifest(1)["changes"]]
    v2_changes = [t._abs(rel) for rel in t.manifest(2)["changes"]]
    assert all(os.path.exists(p) for p in v1_changes + v2_changes)
    t.vacuum(keep_latest=1, grace_seconds=0.0)
    assert all(not os.path.exists(p) for p in v1_changes), "unretained reclaimed"
    assert all(os.path.exists(p) for p in v2_changes), "retained survives"
    assert {tuple(r) for r in t.change_rows(2).collect()} == {
        ("delete", 1, "n1", 10.0),
        ("delete", 2, "n2", 20.0),
    }


def test_change_feed_off_by_default_records_nothing(spark, tmp_path):
    """Tables without the property pay ZERO recording cost: no manifest
    key, no change files on disk — readers fall back to snapshot diffs."""
    t = _mk(spark, tmp_path)
    src = spark.createDataFrame([(3, "c", 30.0)], "k long, name string, v double")
    t.merge(src, "k")
    assert t.change_rows(1) is None
    assert "changes" not in t.manifest(1)
    for root, _dirs, names in os.walk(t.path):
        assert "-changes" not in os.path.basename(root)


def test_group_commit_preserves_change_feed_property(spark, tmp_path):
    """ADVICE r15 #1: TxGroup.prepare published member manifests with only
    its pending-group extras, silently DROPPING the change_feed property —
    every later merge/delete then found nothing on the base manifest and
    permanently stopped recording change files. The property now propagates
    at the _commit choke point: a group commit on a change-feed table keeps
    the property, and the NEXT merge records typed change rows again."""
    from tmdb_movie_data_pipeline_spark.plans.txgroup import TxGroup

    t = _mk_cdf(spark, tmp_path)
    other = TxTable.create(
        spark, str(tmp_path / "other"), spark.range(0, 5).withColumnRenamed("id", "k")
    )
    g = TxGroup(spark, str(tmp_path))
    moved = spark.createDataFrame(
        [(50, "g", 5.0)], "k long, name string, v double"
    )
    gid = g.prepare(
        [(t, t.read().unionByName(moved)), (other, other.read())], "MOVE"
    )
    g.commit(gid, [t.path, other.path])
    # the group-published manifest carries the property forward
    assert t.manifest(t.latest_visible_version()).get("change_feed") is True
    # the group commit itself recorded no typed changes (feed readers fall
    # back to the snapshot diff for it), but the property survived...
    assert t.change_rows(t.latest_visible_version()) is None
    # ...so the NEXT merge records change rows at write time again
    v = t.merge(_cdf_source(spark), "k")
    recorded = {tuple(r) for r in t.change_rows(v).collect()}
    assert recorded == _python_snapshot_diff(t, v)
    assert recorded  # non-empty: the regression silently returned None here
    # a table WITHOUT the property gains nothing from the choke point
    assert not other.manifest(other.latest_visible_version()).get("change_feed")


def test_key_only_merge_records_inserts_only(spark, tmp_path):
    """ADVICE r15 #2: with a key-only schema (no value columns) a matched
    source row can never differ from its target, so the write-time recorder
    must emit ONLY the insert rows — not one spurious 'update' per matched
    key, which would diverge from the snapshot diff (which records
    nothing for them)."""
    base = spark.createDataFrame([(i,) for i in range(1, 5)], "k long")
    t = TxTable.create(spark, str(tmp_path / "keyonly"), base, change_feed=True)
    src = spark.createDataFrame([(2,), (3,), (9,)], "k long")
    v = t.merge(src, "k")
    recorded = {tuple(r) for r in t.change_rows(v).collect()}
    assert recorded == {("insert", 9)}
    assert recorded == _python_snapshot_diff(t, v)


def test_cdf_null_transitions_agree_across_formulations(spark, tmp_path):
    """ADVICE r15 #3: a NULL->value or value->NULL column transition is a
    real update. The write-time recorder (eqNullSafe) always caught it; the
    snapshot-diff fallback used plain != (NULL-valued predicate, row
    dropped) and silently missed it. All formulations must agree under
    NULLs — pinned here on the customer-shaped fallback and the generic
    write-time path."""
    from tmdb_movie_data_pipeline_spark.operators.merge import (
        _commit_snapshot_diff,
    )

    # generic write-time path: NULL->value and value->NULL updates recorded
    base = spark.createDataFrame(
        [(1, None, 10.0), (2, "n2", 20.0), (3, "n3", None)],
        "k long, name string, v double",
    )
    t = TxTable.create(spark, str(tmp_path / "nulls"), base, change_feed=True)
    src = spark.createDataFrame(
        [(1, "now", 10.0), (2, "n2", 20.0), (3, "n3", None)],
        "k long, name string, v double",
    )
    v = t.merge(src, "k")
    recorded = {tuple(r) for r in t.change_rows(v).collect()}
    # row 2 identical -> nothing; row 3 identical incl. its NULL -> nothing
    assert recorded == {("update", 1, "now", 10.0)}
    assert recorded == _python_snapshot_diff(t, v)

    # customer-shaped fallback: the NULL transition must survive the diff
    cust = spark.createDataFrame(
        [(1, None, 1.0, "SEG"), (2, "b", 2.0, "SEG")],
        "c_custkey long, c_name string, c_acctbal double, c_mktsegment string",
    )
    tc = TxTable.create(spark, str(tmp_path / "cust"), cust)  # no property
    tc.merge(
        spark.createDataFrame(
            [(1, "named", 1.0, "SEG"), (2, "b", None, "SEG")],
            "c_custkey long, c_name string, c_acctbal double, c_mktsegment string",
        ),
        "c_custkey",
    )
    assert tc.change_rows(1) is None  # property off: fallback territory
    diffed = {tuple(r) for r in _commit_snapshot_diff(tc, 1).collect()}
    assert diffed == {
        ("update", 1, "named", 1.0),  # NULL -> value
        ("update", 2, "b", None),  # value -> NULL
    }


def test_commit_reuses_base_manifest(spark, tmp_path):
    """ADVICE r16 #2: the change_feed choke-point propagation re-resolved
    latest_visible_version (a log listing + a manifest JSON read) on EVERY
    version>0 commit, even for tables that never enabled the property. The
    property is create-time-constant (no API toggles it), so each TxTable
    handle now resolves it AT MOST ONCE — behavior identical, one fewer
    metadata read per subsequent commit."""
    from tmdb_movie_data_pipeline_spark.plans.txgroup import TxGroup

    t = _mk_cdf(spark, tmp_path)
    assert t._change_feed_prop is True  # the creator seeds the cache

    # fresh handle: lazy, resolved exactly once on its first commit that
    # carries no change_feed extra (the TxGroup.prepare path)
    t2 = TxTable(spark, t.path)
    assert t2._change_feed_prop is None

    reads: list[int] = []
    real_manifest = TxTable.manifest

    def counting_manifest(self, version):
        if self is t2:
            reads.append(version)
        return real_manifest(self, version)

    import tmdb_movie_data_pipeline_spark.plans.acid as acid_mod

    orig = acid_mod.TxTable.manifest
    acid_mod.TxTable.manifest = counting_manifest
    try:
        g = TxGroup(spark, str(tmp_path))
        gid = g.prepare([(t2, t2.read())], "NOOP1")
        g.commit(gid, [t2.path])
        cold_reads = len(reads)
        assert t2._change_feed_prop is True  # resolved on the cold commit

        reads.clear()
        gid = g.prepare([(t2, t2.read())], "NOOP2")
        g.commit(gid, [t2.path])
        warm_reads = len(reads)
    finally:
        acid_mod.TxTable.manifest = orig

    # warm path skips exactly the propagation's two manifest reads (the
    # latest_visible_version scan resolves one manifest, then the property
    # read loads the same head again)
    assert warm_reads == cold_reads - 2, (cold_reads, warm_reads)

    # behavior identical: both group-published manifests carry the property,
    # and the NEXT merge still records write-time change rows that equal the
    # semantic ground truth
    assert t2.manifest(t2.latest_visible_version()).get("change_feed") is True
    v = t2.merge(_cdf_source(spark), "k")
    recorded = {tuple(r) for r in t2.change_rows(v).collect()}
    assert recorded == _python_snapshot_diff(t2, v)
    assert recorded

    # a table created WITHOUT the property caches False and never gains it
    plain = _mk(spark, tmp_path)
    assert plain._change_feed_prop is False
    plain.optimize()
    assert not plain.manifest(plain.latest_visible_version()).get("change_feed")

    # shallow clones inherit the resolved flag with the property
    clone = TxTable.shallow_clone(spark, str(tmp_path / "clone"), t)
    assert clone._change_feed_prop is True
