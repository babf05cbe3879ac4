"""Iceberg-lite manifests + checkpoint/resume (kill-resume semantics)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vectortiles_spark.operators import resume, tiling
from vectortiles_spark.sources.iceberg_lite import IcebergLiteTable
from vectortiles_spark.sources.synth import images_df


def test_iceberg_lite_snapshots_and_manifest(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    df1 = spark.range(0, 100).withColumn("part", F.pmod("id", F.lit(4)))
    s1 = t.append(df1, partition_by="part")
    assert s1 == 1
    assert t.read().count() == 100
    df2 = spark.range(100, 150).withColumn("part", F.pmod("id", F.lit(4)))
    s2 = t.append(df2, partition_by="part")
    assert s2 == 2
    assert t.read().count() == 150
    # time travel: snapshot 1 view unchanged
    assert t.read(snapshot_id=1).count() == 100
    # manifest metadata: per-file row counts sum to the data
    m = t.manifest()
    assert m.row_count.sum() == 150
    assert set(m.partition_key) == {"0", "1", "2", "3"}
    snaps = t.snapshots()
    assert snaps.total_rows.tolist() == [100, 150]
    assert snaps.parent_id.tolist() == [-1, 1]


def test_iceberg_lite_partition_pruned_read(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "tbl2"))
    df = spark.range(0, 80).withColumn("part", F.pmod("id", F.lit(4)))
    t.append(df, partition_by="part")
    files_all = t.files()
    files_one = t.files(partition_values=["2"])
    assert len(files_one) < len(files_all)
    got = t.read(partition_values=["2"])
    assert got.count() == 20


def test_kill_resume_no_recompute(spark, tmp_path):
    """Encode half the tiles, 'crash', resume: the second run must skip
    every completed tile and the union must equal a clean full run."""
    imgs = images_df(spark, 600, seed=42)
    feats = tiling.point_features(
        imgs, z=6, layer="images", feature_id=F.xxhash64("image_id")
    ).cache()
    ckpt = IcebergLiteTable(spark, str(tmp_path / "ckpt"))

    # simulate partial completion: encode only tiles with even tile_x
    partial = feats.filter(F.pmod("tile_x", F.lit(2)) == 0)
    tiles1 = tiling.encode_tiles(partial)
    s1 = resume.checkpoint_tiles(tiles1, ckpt, source_snapshot=0)
    n_done = ckpt.read(s1).count()
    assert n_done > 0

    # resume over the FULL feature set: only odd-x tiles remain
    todo = resume.resume_filter(feats, ckpt)
    remaining_tiles = todo.select("tile_x").distinct().collect()
    assert all(r.tile_x % 2 == 1 for r in remaining_tiles)
    s2 = resume.run_with_resume(feats, ckpt, tiling.encode_tiles)
    assert s2 == s1 + 1

    # the checkpoint table now equals a clean full run (same keys + features)
    full = {
        (r.tile_x, r.tile_y): r.n_features
        for r in tiling.encode_tiles(feats).collect()
    }
    ck = {
        (r.tile_x, r.tile_y): r.n_features
        for r in ckpt.read().select("tile_x", "tile_y", "n_features").collect()
    }
    assert ck == full

    # lineage columns recorded
    row = ckpt.read().select("lineage_stage").first()
    assert row.lineage_stage == "mvt_encode"

    # idempotent: a third resume adds nothing
    s3 = resume.run_with_resume(feats, ckpt, tiling.encode_tiles)
    assert s3 == s2
    assert ckpt.read().count() == len(full)


def test_resume_filter_on_empty_checkpoint(spark, tmp_path):
    imgs = images_df(spark, 50, seed=1)
    feats = tiling.point_features(imgs, z=4, layer="x")
    ckpt = IcebergLiteTable(spark, str(tmp_path / "empty"))
    assert resume.resume_filter(feats, ckpt).count() == feats.count()


def test_iceberg_lite_crashed_commit_invisible(spark, tmp_path):
    """A writer that died between the manifest write and the snapshots
    write must leave no trace for readers: files()/read() only surface
    manifest rows whose snapshot id committed to snapshots.parquet."""
    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    t.append(spark.range(0, 50))
    # simulate the torn commit: phantom manifest rows for snapshot 2
    # without the matching snapshots row
    m = t.manifest()
    phantom = m.iloc[[0]].copy()
    phantom["snapshot_id"] = 2
    phantom["file_path"] = str(tmp_path / "tbl/data/snap-2/nonexistent.parquet")
    pd.concat([m, phantom], ignore_index=True).to_parquet(t._manifest_path, index=False)

    assert t.current_snapshot() == 1
    assert all("snap-2" not in f for f in t.files())
    assert t.read().count() == 50
    # the next append commits cleanly on top
    t.append(spark.range(50, 80))
    assert t.read().count() == 80


def test_iceberg_partition_values_with_special_chars(spark, tmp_path):
    """Hive percent-escapes partition directory names; the manifest must
    store the RAW value so partition_values reads find the files."""
    from vectortiles_spark.sources.iceberg_lite import IcebergLiteTable

    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [("us:east", 1), ("us:east", 2), ("eu west", 3)], "region string, v int"
    )
    t.append(df, partition_by="region")
    got = {r.v for r in t.read(partition_values=["us:east"]).collect()}
    assert got == {1, 2}
    got2 = {r.v for r in t.read(partition_values=["eu west"]).collect()}
    assert got2 == {3}


# ------------------------------------------------------- table maintenance


def _sum_ids(df):
    return df.agg(F.sum("id")).collect()[0][0]


def test_compact_merges_small_files_data_identical(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    for lo in range(0, 400, 100):  # 4 small appends -> many small files
        t.append(
            spark.range(lo, lo + 100).withColumn("part", F.pmod("id", F.lit(2))),
            partition_by="part",
        )
    pre_files = len(t.files())
    pre_sum = _sum_ids(t.read())
    snap = t.compact(target_rows_per_file=1_000_000)
    assert snap == 5
    # data identical, layout collapsed to one file per partition
    assert _sum_ids(t.read()) == pre_sum
    assert t.read().count() == 400
    post = t._live_manifest_rows(t.current_snapshot())
    assert len(post) < pre_files
    assert post.groupby("partition_key").size().max() == 1
    # time travel to pre-compaction snapshots still resolves original files
    assert t.read(snapshot_id=2).count() == 200
    assert t.snapshots().operation.tolist()[-1] == "replace"
    # snapshot log total_rows counts LIVE rows, not manifest duplicates
    assert t.snapshots().total_rows.tolist()[-1] == 400


def test_compact_noop_when_nothing_to_do(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    t.append(spark.range(0, 50).coalesce(1))
    assert t.compact() is None  # every partition already a single file
    assert t.compact(min_files=1) is not None  # forced rewrite works too


def test_compact_respects_target_rows_per_file(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    for lo in (0, 300):
        t.append(spark.range(lo, lo + 300).withColumn("part", F.lit(0)), partition_by="part")
    t.compact(target_rows_per_file=100)
    live = t._live_manifest_rows(t.current_snapshot())
    # 600 rows / 100-target -> >1 output file (hot partition split by
    # buckets), none wildly above target
    assert len(live) > 1
    assert _sum_ids(t.read()) == sum(range(600))


def test_overwrite_partitions_replaces_only_touched(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    base = spark.range(0, 100).withColumn("part", F.pmod("id", F.lit(4)))
    t.append(base, partition_by="part")
    # rewrite partition 1 with entirely new rows (ids shifted by 1000)
    repl = (
        spark.range(1000, 1025)
        .withColumn("part", F.lit(1).cast("bigint"))
    )
    s = t.overwrite_partitions(repl, partition_by="part")
    got = t.read()
    assert got.filter(F.col("part") == 1).count() == 25
    assert got.filter((F.col("part") == 1) & (F.col("id") < 1000)).count() == 0
    # untouched partitions intact
    assert got.filter(F.col("part") != 1).count() == 75
    # time travel to the pre-overwrite state
    assert t.read(snapshot_id=s - 1).filter(
        (F.col("part") == 1) & (F.col("id") < 1000)
    ).count() == 25
    assert t.snapshots().operation.tolist()[-1] == "overwrite"


def test_appends_on_top_of_rewrite_snapshot(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    for lo in (0, 100):
        t.append(spark.range(lo, lo + 100).withColumn("part", F.pmod("id", F.lit(2))),
                 partition_by="part")
    t.compact()
    t.append(spark.range(200, 250).withColumn("part", F.pmod("id", F.lit(2))),
             partition_by="part")
    assert t.read().count() == 250
    assert _sum_ids(t.read()) == sum(range(250))


def test_expire_snapshots_deletes_orphans_keeps_tail(spark, tmp_path):
    import os

    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    for lo in range(0, 300, 100):
        t.append(spark.range(lo, lo + 100).withColumn("part", F.pmod("id", F.lit(2))),
                 partition_by="part")
    t.compact()  # snapshot 4: rewrites everything -> snapshots 1-3 redundant
    pre_sum = _sum_ids(t.read())
    old_files = set(t.files(snapshot_id=3))
    stats = t.expire_snapshots(keep_last=1)
    assert stats["expired"] == 3
    assert stats["deleted_files"] == len(old_files)
    for fp in old_files:
        assert not os.path.exists(fp)
    # the surviving snapshot reads identically
    assert _sum_ids(t.read()) == pre_sum
    assert t.read().count() == 300
    assert len(t.snapshots()) == 1
    # expired history is gone
    with pytest.raises(ValueError):
        t.read(snapshot_id=2)
    # the table keeps working: append after expiry
    t.append(spark.range(300, 350).withColumn("part", F.pmod("id", F.lit(2))),
             partition_by="part")
    assert t.read().count() == 350


def test_expire_keeps_files_any_retained_snapshot_needs(spark, tmp_path):
    import os

    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    t.append(spark.range(0, 100))          # 1
    t.append(spark.range(100, 200))        # 2
    t.compact(min_files=1)                 # 3 (rewrite)
    t.append(spark.range(200, 220))        # 4
    # keep 3 and 4: snapshot-1/2 originals are orphans, compacted files stay
    stats = t.expire_snapshots(keep_last=2)
    assert stats["expired"] == 2
    assert t.read(snapshot_id=3).count() == 200
    assert t.read().count() == 220
    for fp in t.files():
        assert os.path.exists(fp)


def test_partition_spec_is_pinned(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    df = spark.range(0, 10).withColumn("part", F.pmod("id", F.lit(2)))
    t.append(df, partition_by="part")
    assert t.partition_spec() == "part"
    with pytest.raises(ValueError, match="partitioned by"):
        t.append(df, partition_by="id")
    with pytest.raises(ValueError, match="partitioned by"):
        t.append(spark.range(0, 5))  # unpartitioned write to partitioned table


def test_append_rejects_reserved_operations(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    with pytest.raises(ValueError, match="reserved"):
        t.append(spark.range(0, 5), operation="replace")


# -------------------------------------------- manifest stats + Z-order


def test_manifest_stats_prune_files(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    for lo in (0, 100, 200):  # three files with disjoint id ranges
        t.append(spark.range(lo, lo + 100).coalesce(1))
    assert len(t.files()) == 3
    hits = t.files(predicates={"id": (150, 160)})
    assert len(hits) == 1
    got = t.read(where={"id": (150, 160)})
    assert sorted(r.id for r in got.collect()) == list(range(150, 161))
    # open-ended bounds
    assert len(t.files(predicates={"id": (250, None)})) == 1
    assert len(t.files(predicates={"id": (None, 99)})) == 1
    # a predicate pruning everything is an empty result, not an error
    assert t.read(where={"id": (9999, 10000)}).count() == 0
    # unknown column never prunes
    assert len(t.files(predicates={"nope": (0, 1)})) == 3


def test_stats_survive_compaction_and_carry(spark, tmp_path):
    import json

    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    for lo in (0, 100):
        t.append(spark.range(lo, lo + 100).coalesce(1))
    t.compact()
    live = t._live_manifest_rows(t.current_snapshot())
    for cs in live.col_stats:
        assert json.loads(cs)["id"] == [0, 199]
    # pruning keeps working against the rewritten file
    assert t.read(where={"id": (5, 7)}).count() == 3


def test_zorder_compaction_clusters_for_pruning(spark, tmp_path):
    import json

    import numpy as np

    rng = np.random.default_rng(5)
    xs, ys = rng.uniform(0, 100, 4000), rng.uniform(0, 100, 4000)
    pdf = pd.DataFrame({"pid": range(4000), "x": xs, "y": ys})
    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    for s in range(4):  # random spatial order, 4 appends
        t.append(spark.createDataFrame(pdf.iloc[s::4]).repartition(4))
    snap = t.compact(target_rows_per_file=250, zorder_by=["x", "y"])
    assert snap is not None
    live = t._live_manifest_rows(t.current_snapshot())
    assert len(live) >= 8
    # data identical after the clustered rewrite
    got = t.read()
    assert got.count() == 4000
    assert got.agg(F.sum("pid")).collect()[0][0] == sum(range(4000))
    # every file now covers a tight (x, y) rectangle: a 10x10 window query
    # prunes most files via manifest stats alone
    hits = t.files(predicates={"x": (40.0, 50.0), "y": (40.0, 50.0)})
    assert 0 < len(hits) <= max(2, len(live) // 2), (len(hits), len(live))
    # and the pruned read loses no rows vs the full-scan filter
    full = t.read().filter(
        (F.col("x") >= 40) & (F.col("x") <= 50) & (F.col("y") >= 40) & (F.col("y") <= 50)
    )
    pruned = t.read(where={"x": (40.0, 50.0), "y": (40.0, 50.0)})
    assert pruned.count() == full.count()
    # mean per-file bbox area is far below the unclustered expectation
    # (un-clustered random files span ~the whole [0,100]^2 square)
    areas = []
    for cs in live.col_stats:
        st = json.loads(cs)
        areas.append((st["x"][1] - st["x"][0]) * (st["y"][1] - st["y"][0]))
    assert np.mean(areas) < 3000, np.mean(areas)


def test_stats_missing_manifest_column_backward_compat(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    t.append(spark.range(0, 50).coalesce(1))
    # simulate a manifest written before col_stats existed
    m = pd.read_parquet(t._manifest_path).drop(columns=["col_stats"])
    m.to_parquet(t._manifest_path, index=False)
    assert len(t.files(predicates={"id": (0, 1)})) == 1  # no stats -> no prune
    assert t.read(where={"id": (0, 1)}).count() == 2


def test_expire_keep_last_floor_and_incomparable_predicates(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "tbl"))
    t.append(spark.range(0, 10).coalesce(1))
    t.append(spark.range(10, 20).coalesce(1))
    # keep_last=0 must not expire the current snapshot
    t.expire_snapshots(keep_last=0)
    assert t.read().count() == 20
    # string-vs-number predicate mismatch never prunes (and never crashes)
    assert len(t.files(predicates={"id": ("a", "z")})) == len(t.files())


def test_spec_adoption_guards_legacy_layouts(spark, tmp_path):
    import os

    # unpartitioned data, spec file missing: a partitioned write must not
    # adopt a spec over ""-keyed rows (they'd fall outside every partition)
    t = IcebergLiteTable(spark, str(tmp_path / "a"))
    t.append(spark.range(0, 10))
    os.remove(t._spec_path) if os.path.exists(t._spec_path) else None
    df = spark.range(0, 5).withColumn("part", F.lit(1))
    with pytest.raises(ValueError, match="unpartitioned data"):
        t.overwrite_partitions(df, partition_by="part")
    # legacy partitioned table (spec file lost): partitioned write re-adopts,
    # unpartitioned write is rejected
    t2 = IcebergLiteTable(spark, str(tmp_path / "b"))
    t2.append(spark.range(0, 10).withColumn("part", F.pmod("id", F.lit(2))),
              partition_by="part")
    os.remove(t2._spec_path)
    with pytest.raises(ValueError, match="partitioned data"):
        t2.append(spark.range(10, 15))
    t2.append(spark.range(10, 20).withColumn("part", F.pmod("id", F.lit(2))),
              partition_by="part")
    assert t2.read().count() == 20


def test_partition_metrics_rollup(spark, tmp_path):
    """The checkpoint carries per-partition lineage + byte/row metrics,
    and partition_metrics rolls them up consistently with the payload."""
    ckpt = IcebergLiteTable(spark, str(tmp_path / "ckpt_pm"))
    imgs = images_df(spark, n=400, seed=3).repartition(4)
    feats = tiling.point_features(
        imgs, z=6, layer="images", feature_id=F.xxhash64("image_id")
    )
    tiles = tiling.encode_tiles(feats, partitions=4)
    resume.checkpoint_tiles(tiles, ckpt, source_snapshot=7)
    pm = resume.partition_metrics(ckpt).collect()
    assert pm, "no partition metric rows"
    assert {r.lineage_stage for r in pm} == {"mvt_encode"}
    assert {r.lineage_source_snapshot for r in pm} == {7}
    committed = ckpt.read().select(
        F.count("*").alias("t"),
        F.sum("n_features").alias("f"),
        F.sum(F.length("mvt")).alias("b"),
    ).collect()[0]
    assert sum(r.n_tiles for r in pm) == committed.t
    assert sum(r.n_features for r in pm) == committed.f
    assert sum(r.mvt_bytes for r in pm) == committed.b
    # the rollup's plan must never touch the payload column
    from vectortiles_spark.plans import audit
    df = resume.partition_metrics(ckpt)
    schema_line = audit.formatted_plan(df).split("ReadSchema")[-1].split("\n")[0]
    assert "mvt:binary" not in schema_line, schema_line
