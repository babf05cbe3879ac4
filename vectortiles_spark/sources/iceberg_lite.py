"""Iceberg-style table semantics over plain Parquet (no Iceberg jar offline
— SURVEY.md env facts), implementing the pieces the north star needs:
snapshots, per-partition manifests with row counts + lineage, snapshot
reads (time travel), and manifest-pruned scans.

Layout under the table root:
    data/snap-{id}/...parquet      -- data files, immutable per snapshot
    metadata/manifest.parquet      -- one row per (snapshot, file):
        snapshot_id, file_path, partition_key, row_count, operation
    metadata/snapshots.parquet     -- snapshot_id, parent_id, operation,
        total_rows (cumulative live rows)

Commits are atomic at the metadata level: data files land first, the
manifest/snapshots rewrite is last (same ordering Iceberg itself relies
on). Readers resolve a snapshot, list its live files from the manifest,
and hand exactly that file list to the Parquet scan — partition pruning
happens against manifest rows (driver-side metadata, like Iceberg's
planning), not by listing directories.
"""

from __future__ import annotations

import os
from glob import glob

import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession


class IcebergLiteTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.meta_dir = f"{self.path}/metadata"
        os.makedirs(self.meta_dir, exist_ok=True)

    # ---------- metadata ----------

    @property
    def _manifest_path(self) -> str:
        return f"{self.meta_dir}/manifest.parquet"

    @property
    def _snapshots_path(self) -> str:
        return f"{self.meta_dir}/snapshots.parquet"

    def manifest(self) -> pd.DataFrame:
        if os.path.exists(self._manifest_path):
            return pd.read_parquet(self._manifest_path)
        return pd.DataFrame(
            columns=["snapshot_id", "file_path", "partition_key", "row_count", "operation"]
        )

    def snapshots(self) -> pd.DataFrame:
        if os.path.exists(self._snapshots_path):
            return pd.read_parquet(self._snapshots_path)
        return pd.DataFrame(columns=["snapshot_id", "parent_id", "operation", "total_rows"])

    def current_snapshot(self) -> int | None:
        snaps = self.snapshots()
        return int(snaps.snapshot_id.max()) if len(snaps) else None

    # ---------- write ----------

    def append(self, df: DataFrame, partition_by: str | None = None, operation: str = "append") -> int:
        """Append df as a new snapshot; returns the new snapshot id.

        Manifest rows carry per-file row counts (read from Parquet footers —
        exact, no data scan) and the partition value for scan pruning."""
        snap_id = (self.current_snapshot() or 0) + 1
        data_dir = f"{self.path}/data/snap-{snap_id}"
        writer_df = df
        if partition_by:
            # partition by a shadow column so the real column survives in
            # the data files (Hive layout strips partition cols from files,
            # but manifest-listed reads bypass directory discovery)
            from pyspark.sql import functions as F

            writer_df = df.withColumn("__part", F.col(partition_by))
        writer = writer_df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy("__part")
        writer.parquet(data_dir)

        entries = []
        for fp in sorted(glob(f"{data_dir}/**/*.parquet", recursive=True)):
            part_key = ""
            if partition_by:
                seg = [s for s in fp.split("/") if s.startswith("__part=")]
                # Hive percent-escapes special chars in directory names
                # (':' -> '%3A'); store the RAW value so files()'s
                # partition_values comparison matches what callers wrote
                # (NULL keys stay as the literal __HIVE_DEFAULT_PARTITION__)
                from urllib.parse import unquote

                part_key = unquote(seg[0].split("=", 1)[1]) if seg else ""
            entries.append(
                {
                    "snapshot_id": snap_id,
                    "file_path": fp,
                    "partition_key": part_key,
                    "row_count": pq.ParquetFile(fp).metadata.num_rows,
                    "operation": operation,
                }
            )
        # inherit only COMMITTED manifest rows: phantom rows left by a
        # writer that crashed mid-commit (manifest written, snapshots not)
        # must not be legitimized by this commit's snapshot append
        prior = self.manifest()
        committed = set(self.snapshots().snapshot_id.tolist())
        prior = prior[prior.snapshot_id.isin(committed)]
        new_manifest = pd.concat([prior, pd.DataFrame(entries)], ignore_index=True)
        snaps = self.snapshots()
        parent = self.current_snapshot()
        total = int(new_manifest.row_count.sum())
        new_snaps = pd.concat(
            [
                snaps,
                pd.DataFrame(
                    [{
                        "snapshot_id": snap_id,
                        "parent_id": parent if parent is not None else -1,
                        "operation": operation,
                        "total_rows": total,
                    }]
                ),
            ],
            ignore_index=True,
        )
        # metadata commit LAST (atomicity point): write both files to temp
        # paths, then os.rename into place — manifest first, snapshots last,
        # so a crash mid-commit leaves at worst manifest rows whose snapshot
        # id is absent from snapshots.parquet, which files() filters out
        mtmp, stmp = self._manifest_path + ".tmp", self._snapshots_path + ".tmp"
        new_manifest.to_parquet(mtmp, index=False)
        new_snaps.to_parquet(stmp, index=False)
        os.rename(mtmp, self._manifest_path)
        os.rename(stmp, self._snapshots_path)
        return snap_id

    # ---------- read ----------

    def files(self, snapshot_id: int | None = None, partition_values: list[str] | None = None) -> list[str]:
        m = self.manifest()
        # only manifest rows whose snapshot committed (present in
        # snapshots.parquet) are visible — phantom rows from a crashed
        # mid-commit writer are ignored
        committed = set(self.snapshots().snapshot_id.tolist())
        m = m[m.snapshot_id.isin(committed)]
        if snapshot_id is not None:
            m = m[m.snapshot_id <= snapshot_id]
        if partition_values is not None:
            m = m[m.partition_key.isin([str(v) for v in partition_values])]
        return m.file_path.tolist()

    def read(self, snapshot_id: int | None = None, partition_values: list[str] | None = None) -> DataFrame:
        files = self.files(snapshot_id, partition_values)
        if not files:
            raise ValueError(f"no data files for snapshot {snapshot_id} in {self.path}")
        return self.spark.read.parquet(*files)
