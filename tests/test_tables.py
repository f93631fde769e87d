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


def test_read_wave_pruning_and_split(spark, tmp_path):
    """read_wave must touch ONLY the requested wave's data (VERDICT r2
    #4): a delta wave reads its own dir; a compacted wave reads the
    base with a partition-pruned filter. read_split returns
    [bucketed base, deltas] for split-strategy joins."""
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "t"))
    B = {"by": ["x"], "n": 2, "sort": ["x"], "partition": ["wave"]}
    for w in range(3):
        _commit(spark, t, [10 * w, 10 * w + 1], w)
    t.compact(spark, B, lineage={"wave": 2, "compacted_through": 2})
    _commit(spark, t, [30, 31], 3)
    _commit(spark, t, [40, 41], 4)

    # post-compaction wave: exactly its own dir
    w4 = t.read_wave(spark, 4)
    assert sorted(r.x for r in w4.collect()) == [40, 41]
    plan = w4._sc._jvm.PythonSQLUtils.explainString(
        w4._jdf.queryExecution(), "formatted"
    )
    assert "swsnap_" not in plan  # not the base: the delta dir alone

    # compacted wave: base read with a wave partition filter
    w1 = t.read_wave(spark, 1)
    assert sorted(r.x for r in w1.collect()) == [10, 11]
    plan1 = w1._sc._jvm.PythonSQLUtils.explainString(
        w1._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan1

    # unknown wave
    assert t.read_wave(spark, 99) is None

    parts = t.read_split(spark)
    assert len(parts) == 2
    assert sorted(r.x for r in parts[0].collect()) == [0, 1, 10, 11, 20, 21]
    assert sorted(r.x for r in parts[1].collect()) == [30, 31, 40, 41]
    # whole-table read still sees everything
    assert len(_xs(spark, t)) == 10


def test_expire_snapshots_reclaims_superseded_dirs(spark, tmp_path):
    import os

    t = SnapshotTable(str(tmp_path / "t"))
    B = {"by": ["x"], "n": 2, "sort": ["x"]}
    for w in range(4):
        _commit(spark, t, [w], w)
    t.compact(spark, B, lineage={"wave": 3, "compacted_through": 3})
    assert t.expire_snapshots(keep_last=1) == 4
    assert _xs(spark, t) == [0, 1, 2, 3]
    # only the compacted dir remains on disk
    assert len(os.listdir(os.path.join(t.root, "data"))) == 1
    assert len(t.history()) == 1
    # version ids still never reused after expiry (HWM survives)
    v = _commit(spark, t, [9], 4)
    assert v > 4  # 5 snapshots existed before expiry


def test_read_refuses_oplog_deltas(spark, tmp_path):
    """ADVICE r3: op-log delta commits (frontier: op/delta_wave columns
    beyond the base schema) must make read()/compact() fail loudly —
    a naive union would surface del markers as data rows."""
    import pytest as _pytest

    t = SnapshotTable(str(tmp_path / "t"))
    base = spark.createDataFrame([(1, 0), (2, 0)], "x int, wave int")
    t.commit(base, mode="overwrite", bucket={"by": ["x"], "n": 2, "sort": ["x"]},
             lineage={"wave": 0})
    ops = spark.createDataFrame(
        [(1, 1, "del", 1)], "x int, wave int, op string, delta_wave int"
    )
    t.commit(ops, mode="append", lineage={"wave": 1})
    with _pytest.raises(ValueError, match="op-log"):
        t.read(spark)
    with _pytest.raises(ValueError, match="op-log"):
        t.compact(spark, {"by": ["x"], "n": 2, "sort": ["x"]})


def test_read_wave_range_prunes_to_window(spark, tmp_path):
    """VERDICT r3 #3: the error-backoff read must touch only the
    window's data dirs — read_wave_range([w0, w1)) collects in-range
    append dirs plus a partition-filtered base slice, never a
    whole-table glob."""
    t = SnapshotTable(str(tmp_path / "t"))
    for w in range(6):
        _commit(spark, t, [10 * w, 10 * w + 1], w)

    rng = t.read_wave_range(spark, 2, 4)
    assert sorted(r.x for r in rng.collect()) == [20, 21, 30, 31]
    # IO gate: exactly the two in-range dirs are scanned
    files = rng.inputFiles()
    waves_touched = {f.split("/data/")[1].split("/")[0] for f in files}
    assert len(waves_touched) == 2, waves_touched

    # empty window
    assert t.read_wave_range(spark, 90, 95) is None

    # window straddling a compaction boundary: base slice (partition-
    # pruned) + post-compaction delta dirs
    B = {"by": ["x"], "n": 2, "sort": ["x"], "partition": ["wave"]}
    t.compact(spark, B, lineage={"wave": 5, "compacted_through": 5})
    _commit(spark, t, [60, 61], 6)
    _commit(spark, t, [70, 71], 7)
    rng2 = t.read_wave_range(spark, 5, 7)
    assert sorted(r.x for r in rng2.collect()) == [50, 51, 60, 61]
    plan = rng2._sc._jvm.PythonSQLUtils.explainString(
        rng2._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan  # base side is partition-pruned


def test_read_wave_range_io_at_100_waves(spark, tmp_path):
    """VERDICT r4 #7: at 100+ committed waves, the backoff-window read
    must touch files PROPORTIONAL to the window, never the table — the
    IO-level gate that keeps the r3 unbounded-backoff-read regression
    class from returning."""
    t = SnapshotTable(str(tmp_path / "t"))
    for w in range(110):
        _commit(spark, t, [10 * w, 10 * w + 1], w)
    rng = t.read_wave_range(spark, 100, 105)
    assert sorted(r.x for r in rng.collect()) == sorted(
        10 * w + i for w in range(100, 105) for i in (0, 1)
    )
    files = rng.inputFiles()
    waves_touched = {f.split("/data/")[1].split("/")[0] for f in files}
    assert len(waves_touched) == 5, waves_touched
    # file count scales with the window, not the 110-wave table
    assert len(files) <= 5 * max(
        1, len(files) // len(waves_touched)
    ), files


def test_read_wave_range_refuses_inrange_overwrite(spark, tmp_path):
    """An overwrite commit's rows are full-state, not a wave delta: a
    window read that would include one must fail loudly (ADVICE r4),
    while windows PAST the overwrite stay readable."""
    import pytest as _pytest

    t = SnapshotTable(str(tmp_path / "t"))
    _commit(spark, t, [1], 0)
    full = spark.createDataFrame(
        [(1, 0, "add", 0), (2, 1, "add", 1)],
        "x int, wave int, op string, delta_wave int",
    )
    t.commit(full, mode="overwrite", lineage={"wave": 1})
    _commit(spark, t, [30], 2)
    # in-range overwrite -> loud refusal
    with _pytest.raises(ValueError, match="overwrite"):
        t.read_wave_range(spark, 0, 2)
    # window entirely after the overwrite -> fine
    assert [r.x for r in t.read_wave_range(spark, 2, 3).collect()] == [30]
