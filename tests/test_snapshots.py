"""Snapshot-table format tests: atomic commits, snapshot isolation, time
travel, incremental reads, manifest file pruning, optimistic concurrency,
retention expiry — and the incremental continuous-aggregate identity
(merge_tier(rollup(prev), rollup(increment)) == rollup(full))."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tsengine.operators import rollup as R
from tsengine.sources.snapshots import CommitConflict, SnapshotTable


def _turns(spark, conv_ids, t0=1_600_000_000, n=40, gap=30):
    rows = []
    for c in conv_ids:
        for i in range(n):
            rows.append((c, i, "user" if i % 2 else "assistant",
                         f"text {c} {i}", "bash" if i % 5 == 0 else None,
                         t0 + i * gap + (hash(c) % 97)))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, e long"
    )
    return df.select("conv_id", "turn_idx", "role", "text", "tool",
                     F.timestamp_seconds("e").alias("ts"))


def _rows(df):
    return sorted(map(tuple, df.select("conv_id", "turn_idx", "role", "text", "tool",
                                       F.col("ts").cast("long")).collect()))


def test_append_read_roundtrip(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    d1 = _turns(spark, ["a", "b"])
    sid = t.append(d1)
    assert sid == 1
    assert _rows(t.read(spark)) == _rows(d1)
    assert t.read(spark).schema == d1.schema


def test_snapshot_isolation_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    d1, d2 = _turns(spark, ["a"]), _turns(spark, ["b"])
    s1 = t.append(d1)
    s2 = t.append(d2)
    # a reader pinned at s1 is unaffected by the later append
    assert _rows(t.read(spark, snapshot_id=s1)) == _rows(d1)
    assert _rows(t.read(spark, snapshot_id=s2)) == _rows(d1.unionByName(d2))
    # as_of resolves by commit time
    at1 = t.snapshot(s1)["committed_at"]
    assert t.as_of(at1) == s1
    assert t.as_of(t.snapshot(s2)["committed_at"]) == s2
    with pytest.raises(ValueError):
        t.as_of(at1 - 1e6)


def test_overwrite_keeps_history(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    d1, d2 = _turns(spark, ["a"]), _turns(spark, ["z"])
    s1 = t.append(d1)
    s2 = t.overwrite(d2)
    assert _rows(t.read(spark)) == _rows(d2)
    assert _rows(t.read(spark, snapshot_id=s1)) == _rows(d1)
    assert [s["operation"] for s in t.snapshots()] == ["append", "overwrite"]
    assert s2 == 2


def test_incremental_reads_only_added_files(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    d1, d2, d3 = _turns(spark, ["a"]), _turns(spark, ["b"]), _turns(spark, ["c"])
    s1 = t.append(d1)
    s2 = t.append(d2)
    s3 = t.append(d3)
    inc = t.incremental(spark, from_id=s1, to_id=s3)
    assert _rows(inc) == _rows(d2.unionByName(d3))
    # files planned = only those added after s1
    added = {os.path.join(t.path, p)
             for sid in (s2, s3) for p in t.snapshot(sid)["added"]}
    assert set(inc.inputFiles()) <= {f"file://{p}" for p in added} | added
    # an overwrite inside the range invalidates the diff
    t.overwrite(d1)
    with pytest.raises(ValueError, match="overwrite"):
        t.incremental(spark, from_id=s1)


def test_uncommitted_data_is_invisible(spark, tmp_path):
    """Crash before the manifest link == clean previous state; crash AFTER
    the manifest link (the commit point) but before the pointer cache write
    == committed and visible (pointer reconciles from manifests on disk)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    d1 = _turns(spark, ["a"])
    t.append(d1)
    # simulate a writer dying after staging data files but before commit:
    # staged files are invisible (readers only open manifest-listed files)
    t._write_data(_turns(spark, ["ghost"]))
    assert _rows(t.read(spark)) == _rows(d1)
    # dying after the manifest link but before the pointer cache write: the
    # link IS the commit point, so the snapshot is durable and visible
    d2 = _turns(spark, ["late"])
    files, schema = t._write_data(d2)
    man = {"snapshot_id": 2, "parent_id": 1, "operation": "append",
           "committed_at": 0, "schema": schema,
           "files": t.snapshot(1)["files"] + files,
           "added": [f["path"] for f in files], "removed": [],
           "added_rows": sum(f["rows"] for f in files), "added_bytes": 0}
    with open(t._snap_path(2), "x") as f:
        json.dump(man, f)
    assert t.current_snapshot_id() == 2  # reconciled, pointer still says 1
    assert _rows(t.read(spark)) == _rows(d1.unionByName(d2))
    # recovery: the next append builds on the reconciled head
    t2 = SnapshotTable(str(tmp_path / "tbl"))
    t2.append(_turns(spark, ["b"]))
    assert t2.current_snapshot_id() == 3


def test_manifest_file_pruning(spark, tmp_path):
    """Disjoint ts ranges per append -> a bounded read opens only matching
    files (Iceberg-style manifest pruning, checked via inputFiles)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    day = 86400
    t.append(_turns(spark, ["a"], t0=1_600_000_000))
    t.append(_turns(spark, ["b"], t0=1_600_000_000 + 10 * day))
    t.append(_turns(spark, ["c"], t0=1_600_000_000 + 20 * day))
    full = t.read(spark)
    bounded = t.read(spark, lo=1_600_000_000 + 10 * day - 100,
                     hi=1_600_000_000 + 10 * day + 100 + 40 * 30)
    assert len(bounded.inputFiles()) < len(full.inputFiles())
    assert sorted(r[0] for r in bounded.select("conv_id").distinct().collect()) == ["b"]
    # residual filter exactness: empty window inside covered range
    assert t.read(spark, lo=1_600_000_001, hi=1_600_000_001).count() <= 1


def test_commit_conflict(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_turns(spark, ["a"]))
    files, schema = t._write_data(_turns(spark, ["b"]))
    # another writer wins the race
    SnapshotTable(t.path).append(_turns(spark, ["c"]))
    with pytest.raises(CommitConflict):
        t._commit("append", files, schema, expected_parent=1)


def test_expire_snapshots(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    s1 = t.append(_turns(spark, ["a"]))
    t.overwrite(_turns(spark, ["b"]))
    t.append(_turns(spark, ["c"]))
    before = _rows(t.read(spark))
    deleted = t.expire_snapshots(keep_last=2)
    assert deleted  # snapshot-1-only files are gone
    assert _rows(t.read(spark)) == before  # live reads unaffected
    with pytest.raises(FileNotFoundError):
        t.snapshot(s1)
    for p in deleted:
        assert not os.path.exists(os.path.join(t.path, p))


def test_incremental_continuous_aggregate_identity(spark, tmp_path):
    """merge_tier(rollup(base), rollup(increment)) == rollup(full) bit-for-bit
    across all three tiers — appends split at conversation boundaries so the
    latency plane is self-contained per input (mid-conversation appends go
    through the streaming state path instead; see merge_tier docstring)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    base_convs, new_convs = ["a", "b", "c"], ["d", "e"]
    s1 = t.append(_turns(spark, base_convs, n=60, gap=45))
    s2 = t.append(_turns(spark, new_convs, n=25, gap=400))

    vocab = dict(role_vocab=["assistant", "user"], tool_vocab=["bash"])
    full_tiers = R.build_all_tiers(R.with_latency(t.read(spark)), **vocab)
    base_tiers = R.build_all_tiers(
        R.with_latency(t.read(spark, snapshot_id=s1)), **vocab
    )
    inc_tiers = R.build_all_tiers(
        R.with_latency(t.incremental(spark, from_id=s1, to_id=s2)), **vocab
    )
    for name in ("1m", "1h", "1d"):
        merged = R.merge_tier(base_tiers[name], inc_tiers[name])
        a = merged.selectExpr("conv_id", "tier", "bucket", "cnt", "cnt_lat",
                              "vmin", "vmax", "vsum", "vmean",
                              "map_entries(role_dist) as rd", "map_entries(tool_dist) as td")
        b = full_tiers[name].selectExpr("conv_id", "tier", "bucket", "cnt", "cnt_lat",
                                        "vmin", "vmax", "vsum", "vmean",
                                        "map_entries(role_dist) as rd", "map_entries(tool_dist) as td")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, name


def test_merge_tier_overlapping_buckets(spark):
    """Two slices of the SAME conversation+bucket merge additively (the
    mid-bucket append case once latencies are resolved)."""
    rows1 = [("c", "1m", 600, 3, 2, 5.0, 9.0, 14.0, 7.0, {"user": 2, "assistant": 1}, {"bash": 1})]
    rows2 = [("c", "1m", 600, 2, 2, 1.0, 4.0, 5.0, 2.5, {"user": 1, "assistant": 1}, None),
             ("c", "1m", 660, 1, 0, None, None, None, None, {"user": 1}, None)]
    schema = ("conv_id string, tier string, bucket long, cnt long, cnt_lat long, "
              "vmin double, vmax double, vsum double, vmean double, "
              "role_dist map<string,bigint>, tool_dist map<string,bigint>")
    m = {r["bucket"]: r for r in
         (row.asDict() for row in R.merge_tier(
             spark.createDataFrame(rows1, schema),
             spark.createDataFrame(rows2, schema)).collect())}
    assert m[600]["cnt"] == 5 and m[600]["cnt_lat"] == 4
    assert m[600]["vmin"] == 1.0 and m[600]["vmax"] == 9.0 and m[600]["vsum"] == 19.0
    assert m[600]["vmean"] == pytest.approx(19.0 / 4)
    assert dict(m[600]["role_dist"]) == {"user": 3, "assistant": 2}
    assert dict(m[600]["tool_dist"]) == {"bash": 1}
    assert m[660]["cnt"] == 1 and m[660]["vmin"] is None


def test_conv_stat_pruning(spark, tmp_path):
    """stat_cols=("conv_id",): manifest tracks per-file conv min/max, and a
    conv-range read plans ONLY the files whose range intersects — the north
    rule's conv_id-range partition pruning at the manifest level."""
    t = SnapshotTable(str(tmp_path / "tbl"), stat_cols=("conv_id",))
    t.append(_turns(spark, ["conv_a1", "conv_a2"]))
    t.append(_turns(spark, ["conv_m1", "conv_m2"]))
    t.append(_turns(spark, ["conv_z1", "conv_z2"]))
    man = t.snapshot(t.current_snapshot_id())
    assert all("stats" in f and "conv_id" in f["stats"] for f in man["files"])

    planned = t._plan_files(man, None, None, where={"conv_id": ("conv_m", "conv_mzz")})
    all_files = t._plan_files(man, None, None)
    assert 0 < len(planned) < len(all_files)
    # every m-file kept, no a/z-only file kept
    for p in planned:
        st = next(f["stats"]["conv_id"] for f in man["files"]
                  if p.endswith(f["path"]))
        assert st[1] >= "conv_m" and st[0] <= "conv_mzz"

    got = t.read(spark, where={"conv_id": ("conv_m", "conv_mzz")})
    exp = _turns(spark, ["conv_m1", "conv_m2"])
    assert _rows(got) == _rows(exp)


def test_compact_bin_packs_small_files(spark, tmp_path):
    """Five tiny same-day appends + one distant-day append: compact must
    rewrite the five into fewer day-aligned files in one commit, keep the
    distant file by reference, and change no rows.  Incremental reads from
    before the compaction must be rejected (replace commit in range)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    for i in range(5):
        t.append(_turns(spark, [f"c{i}"], n=8).coalesce(1))
    t.append(_turns(spark, ["far"], t0=1_600_000_000 + 40 * 86400, n=8).coalesce(1))
    before = t.read(spark)
    rows_before = _rows(before)
    man0 = t.snapshot(t.current_snapshot_id())
    far_paths = {f["path"] for f in man0["files"]
                 if f["min_ts"] >= 1_600_000_000 + 40 * 86400}
    assert len(man0["files"]) == 6 and len(far_paths) == 1

    sid = t.compact(spark, target_bytes=1 << 20)
    assert sid == 7
    man1 = t.snapshot(sid)
    # far file carried by reference; small same-day files merged
    assert far_paths <= {f["path"] for f in man1["files"]}
    assert len(man1["files"]) < len(man0["files"])
    # rows unchanged, day alignment preserved (every new file spans one day)
    assert _rows(t.read(spark)) == rows_before
    for f in man1["files"]:
        assert f["min_ts"] // 86400 == f["max_ts"] // 86400
    # append-diff across a replace commit must refuse
    t.append(_turns(spark, ["post"], t0=1_600_000_000 + 50 * 86400, n=8).coalesce(1))
    with pytest.raises(ValueError, match="incremental diff invalid"):
        t.incremental(spark, 5, 8)
    # nothing left to compact
    assert t.compact(spark, target_bytes=1 << 20) is None


def test_compact_cluster_by_narrows_key_pruning(spark, tmp_path):
    """cluster_by compaction (sort-order rewrite analogue): one messy day
    of many convs interleaved across appends compacts into several
    whole-day files each covering a NARROW conv range, so a conv-filtered
    read plans a fraction of the day's files; rows unchanged."""
    t = SnapshotTable(str(tmp_path / "tbl"), stat_cols=("conv_id",))
    convs = [f"conv_{i:03d}" for i in range(16)]
    # interleave: each append mixes convs from both ends of the key space
    for j in range(4):
        t.append(_turns(spark, convs[j::4], n=12).coalesce(1))
    before = _rows(t.read(spark))
    sid = t.compact(spark, target_bytes=1 << 20,
                    cluster_by="conv_id", files_per_day=4)
    assert sid is not None
    man = t.snapshot(sid)
    assert _rows(t.read(spark)) == before
    # every rewritten file is whole-day AND covers a narrow conv slice
    files = man["files"]
    assert len(files) >= 3
    for f in files:
        assert f["min_ts"] // 86400 == f["max_ts"] // 86400
    spans = sorted((f["stats"]["conv_id"][0], f["stats"]["conv_id"][1])
                   for f in files)
    # sorted-within-day + row split => file key ranges don't interleave
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi <= b_lo or a_lo == b_lo  # touching boundaries allowed
    # conv-filtered planning prunes most of the day's files
    planned = t._plan_files(man, None, None,
                            where={"conv_id": ("conv_000", "conv_003")})
    assert len(planned) < len(files)


def test_interleaved_appends_retry_and_all_land(spark, tmp_path):
    """VERDICT r04 task 2: a writer that loses the commit race RETRIES
    against the new current snapshot — both appends land, each as its own
    snapshot, no lost update."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_turns(spark, ["a"]))
    # writer A stages its data while holding a now-stale parent
    files, schema = t._write_data(_turns(spark, ["b"]))
    # writer B commits in between
    SnapshotTable(t.path).append(_turns(spark, ["c"]))
    sid = t._retrying_commit("append", files, schema, parent=1)
    assert sid == 3
    got = _rows(t.read(spark))
    exp = _rows(_turns(spark, ["a"]).unionByName(_turns(spark, ["b"]))
                .unionByName(_turns(spark, ["c"])))
    assert got == exp


def test_exclusive_manifest_link_arbitrates_same_sid(spark, tmp_path):
    """Two writers that both passed the parent check can never both own a
    snapshot id: the manifest hard-link is exclusive.  Simulated by planting
    a competing manifest for the next sid WITHOUT a pointer update (also the
    crash-after-link shape) — the commit must lose, and the planted commit
    must be visible (pointer reconciles from manifests on disk)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_turns(spark, ["a"]))
    assert t.current_snapshot_id() == 1
    # competing writer linked snap-2 but crashed before the pointer write
    man = dict(t.snapshot(1))
    man.update({"snapshot_id": 2, "parent_id": 1, "added": [], "removed": [],
                "added_rows": 0, "added_bytes": 0})
    with open(t._snap_path(2), "x") as f:
        json.dump(man, f)
    # commit point = manifest link: the planted commit IS the current head
    assert t.current_snapshot_id() == 2
    files, schema = t._write_data(_turns(spark, ["b"]))
    with pytest.raises(CommitConflict):
        t._commit("append", files, schema, expected_parent=1)
    # the retrying path lands cleanly after the conflict
    assert t._retrying_commit("append", files, schema, parent=1) == 3


def test_threaded_writers_serialize(spark, tmp_path):
    """Interleaved-commit pin: N threads appending to the SAME table
    concurrently — every append lands exactly once (row multiset equals the
    union; snapshot ids are distinct and contiguous)."""
    from concurrent.futures import ThreadPoolExecutor

    t = SnapshotTable(str(tmp_path / "tbl"))
    convs = [f"w{i}" for i in range(6)]

    def one(c):
        # each thread uses its own table handle, like separate processes
        return SnapshotTable(t.path).append(_turns(spark, [c], n=10))

    with ThreadPoolExecutor(6) as ex:
        sids = list(ex.map(one, convs))
    assert sorted(sids) == [1, 2, 3, 4, 5, 6]
    got = _rows(t.read(spark))
    exp = []
    for c in convs:
        exp.extend(_rows(_turns(spark, [c], n=10)))
    assert got == sorted(exp)


def test_replace_conflict_with_removed_files_recomputes(spark, tmp_path):
    """A replace commit whose dropped files were already removed by a
    concurrent commit must surface CommitConflict (never resurrect or
    double-drop), while a replace racing a plain APPEND retries through."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_turns(spark, ["a"]))
    t.append(_turns(spark, ["b"]))
    victim = t.snapshot(1)["added"][0]

    # race 1: concurrent append -> retry succeeds
    files, schema = t._write_data(_turns(spark, ["c"]))
    SnapshotTable(t.path).append(_turns(spark, ["d"]))
    sid = t._retrying_commit("replace", files, schema, parent=2,
                             removed_paths={victim})
    assert sid == 4
    live = {f["path"] for f in t.snapshot(sid)["files"]}
    assert victim not in live

    # race 2: the same victim is already gone -> conflict, not silence
    files2, schema2 = t._write_data(_turns(spark, ["e"]))
    with pytest.raises(CommitConflict, match="recompute"):
        t._retrying_commit("replace", files2, schema2, parent=2,
                           removed_paths={victim})
