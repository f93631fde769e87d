"""SnapshotTable unit tests: atomic commits, time travel, and the
crash-rollback reconciliation path (VERDICT r2 / ADVICE r2: orphan
manifests+data must be purged and version ids never reused)."""

import os

from swspark.tables import SnapshotTable


def _commit(spark, t, vals, wave, mode="append"):
    df = spark.createDataFrame([(v, wave) for v in vals], "x int, wave int")
    return t.commit(df, mode=mode, lineage={"wave": wave})


def _xs(spark, t):
    return sorted(r.x for r in t.read(spark).collect())


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    v0 = _commit(spark, t, [1, 2], 0)
    v1 = _commit(spark, t, [3], 1)
    assert _xs(spark, t) == [1, 2, 3]
    assert sorted(r.x for r in t.read(spark, v0).collect()) == [1, 2]
    v2 = _commit(spark, t, [9], 2, mode="overwrite")
    assert _xs(spark, t) == [9]
    assert [m["version"] for m in t.history()] == [v2, v1, v0]


def test_rollback_purges_orphans_and_never_reuses_ids(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    _commit(spark, t, [1], 0)
    v1 = _commit(spark, t, [2], 1)
    # torn wave: wave-2 commit landed, frontier pointer did not
    v2 = _commit(spark, t, [3], 2)
    orphan_dir = t.manifest(v2)["data_dirs"][-1]
    assert t.rollback_to_wave_before(2) == 1
    assert t.current_version() == v1
    assert _xs(spark, t) == [1, 2]
    # orphan manifest and its (unreachable) data dir are gone
    assert not os.path.exists(t._manifest_path(v2))
    assert not os.path.exists(os.path.join(t.root, orphan_dir))
    # shared parent dirs survive the purge
    assert _xs(spark, t) == [1, 2]
    # the next commit does NOT reuse the orphan's id: a lineage value
    # recorded against v2 elsewhere must never resolve to new data
    v_next = _commit(spark, t, [4], 2)
    assert v_next > v2
    assert _xs(spark, t) == [1, 2, 4]


def test_rollback_noop_when_no_orphans(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    _commit(spark, t, [1], 0)
    assert t.rollback_to_wave_before(5) == 0
    assert _xs(spark, t) == [1]


def test_rollback_after_overwrite_keeps_other_chain_dirs(spark, tmp_path):
    """An orphan OVERWRITE snapshot references only its own dir; the
    purge must not touch dirs still referenced by the retained chain."""
    t = SnapshotTable(str(tmp_path / "t"))
    _commit(spark, t, [1], 0)
    v1 = _commit(spark, t, [2], 1)
    _commit(spark, t, [7], 2, mode="overwrite")
    assert t.rollback_to_wave_before(2) == 1
    assert t.current_version() == v1
    assert _xs(spark, t) == [1, 2]
