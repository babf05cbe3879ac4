"""Iceberg-style table semantics over plain Parquet (no Iceberg jar offline
— SURVEY.md env facts), implementing the pieces the north star needs:
snapshots, per-partition manifests with row counts + lineage, snapshot
reads (time travel), manifest-pruned scans, and table maintenance
(small-file compaction, dynamic partition overwrite, snapshot expiry).

Layout under the table root:
    data/snap-{id}/...parquet      -- data files, immutable per snapshot
    metadata/manifest.parquet      -- one row per (snapshot, file):
        snapshot_id, file_path, partition_key, row_count, operation
    metadata/snapshots.parquet     -- snapshot_id, parent_id, operation,
        total_rows (live rows visible at that snapshot)

Snapshot semantics mirror Iceberg's: "append" snapshots ADD files on top
of the previous state; rewrite-class snapshots ("replace" = compaction,
"overwrite" = dynamic partition overwrite) re-list the COMPLETE live
file set under their own snapshot id (Iceberg rewrites manifest lists on
such commits for the same reason). A reader at snapshot S therefore
resolves: latest rewrite-class snapshot B <= S is the base; live files =
B's entries plus every append entry in (B, S]. Time travel keeps working
across compactions because old snapshots' entries are never mutated —
only expire_snapshots() drops history (and only then deletes data files
no retained snapshot references).

Commits are atomic at the metadata level: data files land first, the
manifest/snapshots rewrite is last (same ordering Iceberg itself relies
on). Readers resolve a snapshot, list its live files from the manifest,
and hand exactly that file list to the Parquet scan — partition pruning
happens against manifest rows (driver-side metadata, like Iceberg's
planning), not by listing directories.
"""

from __future__ import annotations

import math
import os
from glob import glob

import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

# snapshot operations that re-list the full live file set
_REWRITE_OPS = ("replace", "overwrite")


def _footer_stats_json(meta) -> str:
    """Per-file column min/max as a JSON string, harvested from the Parquet
    FOOTER statistics the writer already produced — zero data scan, the
    same free lunch Iceberg's manifests eat. Only top-level scalar columns
    with stats in EVERY row group are recorded (a column missing from the
    JSON simply can't prune). Bytes stats decode as UTF-8 when possible."""
    import json

    agg: dict[str, list] = {}
    ok: dict[str, bool] = {}
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested (list/struct) — not prunable
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                ok[name] = False
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
                except UnicodeDecodeError:
                    ok[name] = False
                    continue
            if not isinstance(lo, (int, float, str, bool)):
                ok[name] = False
                continue
            if name in agg:
                agg[name][0] = min(agg[name][0], lo)
                agg[name][1] = max(agg[name][1], hi)
            else:
                agg[name] = [lo, hi]
            ok.setdefault(name, True)
    return json.dumps(
        {k: v for k, v in agg.items() if ok.get(k)}, sort_keys=True, default=str
    )


def _zorder_key(cols: list[str], bounds: dict, bits: int = 16):
    """Column: Z-order (Morton) key — each column scaled to `bits` bits
    against its global [lo, hi], bits interleaved LSB-first across columns.
    Pure JVM bit algebra (shiftleft/shiftright), no Python in the plan;
    NULLs and degenerate ranges quantize to 0 (sort first, still valid)."""
    from pyspark.sql import functions as F

    top = (1 << bits) - 1
    quantized = []
    for c in cols:
        lo, hi = bounds[c]
        if isinstance(lo, str) or isinstance(hi, str):
            raise ValueError(f"zorder_by column {c!r} is not numeric")
        lo = float(lo) if lo is not None else 0.0
        hi = float(hi) if hi is not None else 0.0
        span = hi - lo
        if span > 0:
            q = F.floor(
                (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(float(top))
            )
            q = F.greatest(F.lit(0), F.least(F.lit(top), q))
        else:
            q = F.lit(0).cast("long")
        quantized.append(F.coalesce(q, F.lit(0)).cast("long"))
    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(quantized):
            key = key + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return key


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
            m = pd.read_parquet(self._manifest_path)
            if "col_stats" not in m.columns:  # tables written before stats
                m["col_stats"] = None
            return m
        return pd.DataFrame(
            columns=[
                "snapshot_id", "file_path", "partition_key", "row_count",
                "col_stats", "operation",
            ]
        )

    def snapshots(self) -> pd.DataFrame:
        if os.path.exists(self._snapshots_path):
            return pd.read_parquet(self._snapshots_path)
        return pd.DataFrame(columns=["snapshot_id", "parent_id", "operation", "total_rows"])

    def current_snapshot(self) -> int | None:
        snaps = self.snapshots()
        return int(snaps.snapshot_id.max()) if len(snaps) else None

    # ---------- write ----------

    def _write_data_files(
        self, df: DataFrame, snap_id: int, partition_by: str | None
    ) -> pd.DataFrame:
        """Materialize df under data/snap-{id} and return its manifest rows
        (per-file row counts read from Parquet footers — exact, no data
        scan — plus the partition value for scan pruning)."""
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
            meta = pq.ParquetFile(fp).metadata
            entries.append(
                {
                    "snapshot_id": snap_id,
                    "file_path": fp,
                    "partition_key": part_key,
                    "row_count": meta.num_rows,
                    "col_stats": _footer_stats_json(meta),
                }
            )
        return pd.DataFrame(
            entries,
            columns=[
                "snapshot_id", "file_path", "partition_key", "row_count", "col_stats",
            ],
        )

    def _commit(self, new_rows: pd.DataFrame, snap_id: int, operation: str) -> int:
        """Append new_rows to the manifest and snap_id to the snapshot log,
        atomically. Data files must already be on disk (commit LAST)."""
        new_rows = new_rows.assign(operation=operation)
        # inherit only COMMITTED manifest rows: phantom rows left by a
        # writer that crashed mid-commit (manifest written, snapshots not)
        # must not be legitimized by this commit's snapshot append
        prior = self.manifest()
        committed = set(self.snapshots().snapshot_id.tolist())
        prior = prior[prior.snapshot_id.isin(committed)]
        new_manifest = pd.concat([prior, new_rows], ignore_index=True)
        snaps = self.snapshots()
        parent = self.current_snapshot()
        total = int(
            self._live_rows(new_manifest, snaps, snap_id, pending=snap_id)
            .row_count.sum()
        )
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
        self._write_metadata(new_manifest, new_snaps)
        return snap_id

    def _write_metadata(self, manifest: pd.DataFrame, snaps: pd.DataFrame) -> None:
        # metadata commit LAST (atomicity point): write both files to temp
        # paths, then os.rename into place — manifest first, snapshots last,
        # so a crash mid-commit leaves at worst manifest rows whose snapshot
        # id is absent from snapshots.parquet, which files() filters out
        mtmp, stmp = self._manifest_path + ".tmp", self._snapshots_path + ".tmp"
        manifest.to_parquet(mtmp, index=False)
        snaps.to_parquet(stmp, index=False)
        os.rename(mtmp, self._manifest_path)
        os.rename(stmp, self._snapshots_path)

    def append(self, df: DataFrame, partition_by: str | None = None, operation: str = "append") -> int:
        """Append df as a new snapshot; returns the new snapshot id. The
        operation label is free-form lineage metadata EXCEPT the rewrite-
        class names, which change reader semantics and only compact()/
        overwrite_partitions() may commit."""
        if operation in _REWRITE_OPS:
            raise ValueError(
                f"operation {operation!r} is reserved for maintenance commits"
            )
        self._register_partition_by(partition_by)
        snap_id = (self.current_snapshot() or 0) + 1
        rows = self._write_data_files(df, snap_id, partition_by)
        return self._commit(rows, snap_id, operation)

    # ---------- table spec ----------

    @property
    def _spec_path(self) -> str:
        return f"{self.meta_dir}/table.json"

    def partition_spec(self) -> str | None:
        """The table's partition column (None = unpartitioned)."""
        import json

        if os.path.exists(self._spec_path):
            return json.load(open(self._spec_path)).get("partition_by")
        return None

    def _register_partition_by(self, partition_by: str | None) -> None:
        """Pin the partition column on first partitioned write; reject a
        conflicting spec later (one partitioning per table, like Iceberg's
        partition spec — evolution is out of scope here)."""
        import json

        current = self.partition_spec()
        if current is None and partition_by is None:
            # legacy partitioned table (pre-spec-file) must not silently
            # accept an unpartitioned write
            live_keys = set(
                self._live_manifest_rows(self.current_snapshot()).partition_key
            )
            if live_keys and live_keys != {""}:
                raise ValueError(
                    "table holds partitioned data; cannot write unpartitioned"
                )
        if current is None and partition_by is not None:
            # tables from before the spec file existed have data but no
            # table.json: only adopt a spec when the existing layout is
            # actually partitioned (non-empty keys) — silently pinning a
            # spec over ""-keyed data would leave those rows permanently
            # outside every partition, e.g. untouchable by overwrite
            live_keys = set(
                self._live_manifest_rows(self.current_snapshot()).partition_key
            )
            if live_keys and live_keys == {""}:
                raise ValueError(
                    "table holds unpartitioned data; cannot adopt "
                    f"partition_by={partition_by!r}"
                )
            tmp = self._spec_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"partition_by": partition_by}, f)
            os.rename(tmp, self._spec_path)
        elif current != partition_by:
            raise ValueError(
                f"table is partitioned by {current!r}; cannot write with "
                f"partition_by={partition_by!r}"
            )

    def overwrite_partitions(self, df: DataFrame, partition_by: str) -> int:
        """Dynamic partition overwrite (Iceberg's replacePartitions /
        Spark's dynamic overwrite mode): partitions PRESENT in df are
        replaced wholesale; untouched partitions carry over. One rewrite-
        class snapshot: new files + carried-over live entries are re-listed
        under the new snapshot id, so readers of THIS snapshot never
        consult older manifest entries and time travel to any prior
        snapshot is untouched."""
        self._register_partition_by(partition_by)
        snap_id = (self.current_snapshot() or 0) + 1
        new_rows = self._write_data_files(df, snap_id, partition_by)
        touched = set(new_rows.partition_key.tolist())
        live = self._live_manifest_rows(self.current_snapshot())
        carried = live[~live.partition_key.isin(touched)]
        carried = carried.assign(snapshot_id=snap_id)[new_rows.columns]
        rows = pd.concat([new_rows, carried], ignore_index=True)
        return self._commit(rows, snap_id, "overwrite")

    # ---------- read ----------

    @staticmethod
    def _live_rows(
        m: pd.DataFrame, snaps: pd.DataFrame, snapshot_id: int, pending: int | None = None
    ) -> pd.DataFrame:
        """Manifest rows live at snapshot_id: entries of the latest
        rewrite-class snapshot <= snapshot_id (the base — it re-listed the
        whole live set) plus every append entry after it. `pending` marks a
        snapshot id being committed right now (present in m, not yet in
        snaps) so _commit can price its own total_rows."""
        committed = set(snaps.snapshot_id.tolist())
        if pending is not None:
            committed.add(pending)
        m = m[m.snapshot_id.isin(committed) & (m.snapshot_id <= snapshot_id)]
        ops = {int(r.snapshot_id): str(r.operation) for r in snaps.itertuples()}
        if pending is not None and pending not in ops:
            # the pending commit's operation is whatever its rows carry
            pm = m[m.snapshot_id == pending]
            if len(pm):
                ops[pending] = str(pm.operation.iloc[0])
        rewrite_ids = [
            s for s, op in ops.items() if op in _REWRITE_OPS and s <= snapshot_id
        ]
        base = max(rewrite_ids, default=None)
        if base is not None:
            m = m[m.snapshot_id >= base]
        return m

    def _live_manifest_rows(self, snapshot_id: int | None) -> pd.DataFrame:
        if snapshot_id is None:
            return self.manifest().iloc[0:0]
        return self._live_rows(self.manifest(), self.snapshots(), snapshot_id)

    def files(
        self,
        snapshot_id: int | None = None,
        partition_values: list[str] | None = None,
        predicates: dict | None = None,
    ) -> list[str]:
        """Live data files, pruned driver-side against manifest metadata:
        partition_values prunes on the partition key; predicates is
        {column: (lo, hi)} inclusive ranges (either bound None = open) that
        prune on the per-file footer min/max stats — a file is skipped ONLY
        when its recorded range provably misses the predicate, so columns
        without stats never lose rows. This is the Iceberg planning story:
        at 10^12 rows a range scan touches the few files whose stats
        overlap, not the table."""
        if snapshot_id is None:
            snapshot_id = self.current_snapshot()
        if snapshot_id is None:
            return []
        m = self._live_manifest_rows(snapshot_id)
        if partition_values is not None:
            m = m[m.partition_key.isin([str(v) for v in partition_values])]
        if not predicates:
            return m.file_path.tolist()
        import json

        out = []
        for r in m.itertuples():
            stats = {}
            if isinstance(r.col_stats, str) and r.col_stats:
                stats = json.loads(r.col_stats)
            hit = True
            for col, (lo, hi) in predicates.items():
                if col not in stats:
                    continue  # no stats -> cannot prune this column
                flo, fhi = stats[col]
                try:
                    if (hi is not None and flo > hi) or (lo is not None and fhi < lo):
                        hit = False
                        break
                except TypeError:
                    continue  # incomparable types (str stats vs numeric
                    # bound, or vice versa) -> never prune on a guess
            if hit:
                out.append(r.file_path)
        return out

    def read(
        self,
        snapshot_id: int | None = None,
        partition_values: list[str] | None = None,
        where: dict | None = None,
    ) -> DataFrame:
        """Snapshot read. ``where`` = {column: (lo, hi)} both file-prunes via
        manifest stats AND applies the residual row filter (stats pruning is
        file-granular; surviving files still carry non-matching rows)."""
        files = self.files(snapshot_id, partition_values, predicates=where)
        if not files:
            # a predicate pruning ALL files is a legitimate empty result;
            # only a genuinely file-less snapshot is an error
            unpruned = self.files(snapshot_id, partition_values)
            if where and unpruned:
                return self.spark.read.parquet(*unpruned).limit(0)
            raise ValueError(f"no data files for snapshot {snapshot_id} in {self.path}")
        df = self.spark.read.parquet(*files)
        if where:
            from pyspark.sql import functions as F

            for col, (lo, hi) in where.items():
                if lo is not None:
                    df = df.filter(F.col(col) >= lo)
                if hi is not None:
                    df = df.filter(F.col(col) <= hi)
        return df

    # ---------- maintenance ----------

    def compact(
        self,
        target_rows_per_file: int = 1_000_000,
        min_files: int = 2,
        zorder_by: list[str] | None = None,
    ) -> int | None:
        """Small-file compaction (Iceberg's rewrite_data_files binpack):
        every partition holding >= min_files live files is rewritten into
        ceil(rows / target_rows_per_file) files; partitions already in one
        file carry over untouched. Commits ONE rewrite-class ("replace")
        snapshot that re-lists the full live set; data is bit-identical,
        only the file layout changes, and time travel to pre-compaction
        snapshots still resolves their original files.

        Scale shape: the plan is built from MANIFEST row counts (driver-
        side metadata, no data scan); the rewrite is one Spark job — one
        scan of the affected files, one shuffle keyed on (partition,
        bucket) where each partition's bucket count is its own
        ceil(rows/target) (broadcast-joined tiny map), so a single hot
        partition spreads over many tasks instead of serializing into one
        writer. Returns the new snapshot id, or None if nothing to do.

        ``zorder_by`` additionally CLUSTERS the rewritten data on a Z-order
        (Morton) key over the given columns (Delta's OPTIMIZE ZORDER):
        each column is scaled to 16 bits against its GLOBAL min/max (taken
        from the manifest's footer stats — still no data scan), the bits
        interleave into one long key, and the rewrite range-partitions +
        sorts on it, so each output file covers a tight hyper-rectangle
        and ``files(predicates=...)`` can skip most of the table on any
        range query over those columns. Clustering changes layout only —
        data stays bit-identical."""
        from pyspark.sql import functions as F

        cur = self.current_snapshot()
        if cur is None:
            return None
        live = self._live_manifest_rows(cur)
        sizes = live.groupby("partition_key").agg(
            n_files=("file_path", "size"), n_rows=("row_count", "sum")
        )
        todo = sizes[sizes.n_files >= min_files]
        if todo.empty:
            return None
        rewrite = live[live.partition_key.isin(set(todo.index))]
        carried = live[~live.partition_key.isin(set(todo.index))]

        snap_id = cur + 1
        partition_by = self.partition_spec()
        df = self.spark.read.parquet(*rewrite.file_path.tolist())
        if zorder_by:
            return self._compact_zorder(
                df, rewrite, carried, snap_id, partition_by, zorder_by,
                target_rows_per_file,
            )
        n_out_total = int(
            sum(max(1, math.ceil(r / target_rows_per_file)) for r in todo.n_rows)
        )
        if partition_by is None:
            out = df.repartition(n_out_total)
            new_rows = self._write_data_files(out, snap_id, None)
        else:
            # per-partition bucket counts from manifest row counts; the
            # Hive NULL sentinel keys the same way _write_data_files stores it
            kmap = self.spark.createDataFrame(
                [(str(k), int(max(1, math.ceil(r / target_rows_per_file))))
                 for k, r in zip(todo.index, todo.n_rows)],
                "___pk string, __nbuckets int",
            )
            key = F.coalesce(
                F.col(partition_by).cast("string"),
                F.lit("__HIVE_DEFAULT_PARTITION__"),
            )
            out = (
                df.join(F.broadcast(kmap), key == F.col("___pk"), "left")
                .withColumn(
                    # salt by INPUT SPLIT, not by row: deterministic under
                    # task retry (a row-level random/mid salt can corrupt a
                    # retried shuffle), and splits of a hot partition still
                    # spread across its buckets because maxPartitionBytes
                    # slices big inputs into many splits
                    "__bucket",
                    F.pmod(
                        F.xxhash64(F.spark_partition_id().cast("long")),
                        F.coalesce(F.col("__nbuckets"), F.lit(1)),
                    ),
                )
                .repartition(n_out_total, key, F.col("__bucket"))
                .drop("___pk", "__nbuckets", "__bucket")
            )
            new_rows = self._write_data_files(out, snap_id, partition_by)
        rows = pd.concat(
            [new_rows, carried.assign(snapshot_id=snap_id)[new_rows.columns]],
            ignore_index=True,
        )
        return self._commit(rows, snap_id, "replace")

    def _compact_zorder(
        self, df, rewrite, carried, snap_id, partition_by, zorder_by,
        target_rows_per_file,
    ) -> int:
        import json

        from pyspark.sql import functions as F

        # global per-column bounds from the manifest's footer stats —
        # driver-side metadata; fall back to one cheap agg job only for a
        # column some file lacks stats for
        bounds: dict[str, list] = {}
        missing = set(zorder_by)
        have_all = set(zorder_by)
        for cs in rewrite.col_stats:
            stats = json.loads(cs) if isinstance(cs, str) and cs else {}
            for c in list(have_all):
                if c not in stats:
                    have_all.discard(c)
                    bounds.pop(c, None)
                    continue
                lo, hi = stats[c]
                if c in bounds:
                    bounds[c][0] = min(bounds[c][0], lo)
                    bounds[c][1] = max(bounds[c][1], hi)
                else:
                    bounds[c] = [lo, hi]
        missing -= set(bounds)
        if missing:
            row = df.agg(
                *[F.min(c).alias(f"lo_{c}") for c in missing],
                *[F.max(c).alias(f"hi_{c}") for c in missing],
            ).first()
            for c in missing:
                bounds[c] = [row[f"lo_{c}"], row[f"hi_{c}"]]
        zkey = _zorder_key(zorder_by, bounds)
        n_out = int(
            sum(
                max(1, math.ceil(r / target_rows_per_file))
                for r in rewrite.groupby("partition_key").row_count.sum()
            )
        )
        keys = ([F.col(partition_by)] if partition_by else []) + [zkey]
        out = df.repartitionByRange(n_out, *keys).sortWithinPartitions(*keys)
        new_rows = self._write_data_files(out, snap_id, partition_by)
        rows = pd.concat(
            [new_rows, carried.assign(snapshot_id=snap_id)[new_rows.columns]],
            ignore_index=True,
        )
        return self._commit(rows, snap_id, "replace")

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop history older than the last keep_last snapshots and delete
        data files no retained snapshot references (Iceberg's
        expire_snapshots). The oldest retained snapshot becomes the new
        base: its full live file set is re-listed under its id and its
        operation flips to "replace", so later snapshots keep resolving
        identically. Metadata commits first (atomic rename), file deletion
        after — a crash in between leaves only harmless orphans, never a
        broken table. Returns {"expired": n, "deleted_files": n}."""
        keep_last = max(1, keep_last)  # the current snapshot is never expirable
        snaps = self.snapshots()
        committed = snaps.sort_values("snapshot_id")
        if len(committed) <= keep_last:
            return {"expired": 0, "deleted_files": 0}
        retained = committed.snapshot_id.tolist()[-keep_last:]
        oldest = int(retained[0])

        manifest = self.manifest()
        manifest = manifest[manifest.snapshot_id.isin(set(committed.snapshot_id))]
        # referenced = union of live file sets across retained snapshots
        referenced: set[str] = set()
        for s in retained:
            referenced.update(
                self._live_rows(manifest, committed, int(s)).file_path.tolist()
            )
        orphans = sorted(set(manifest.file_path) - referenced)

        # rebase: oldest retained re-lists its live set and becomes a
        # rewrite-class snapshot; younger retained snapshots keep their rows
        base_rows = self._live_rows(manifest, committed, oldest).assign(
            snapshot_id=oldest, operation="replace"
        )
        younger = manifest[manifest.snapshot_id > oldest]
        younger = younger[younger.file_path.isin(referenced)]
        new_manifest = pd.concat([base_rows, younger], ignore_index=True)
        new_snaps = committed[committed.snapshot_id.isin(retained)].copy()
        new_snaps.loc[new_snaps.snapshot_id == oldest, "operation"] = "replace"
        new_snaps.loc[new_snaps.snapshot_id == oldest, "parent_id"] = -1
        self._write_metadata(new_manifest, new_snaps.reset_index(drop=True))

        deleted = 0
        for fp in orphans:
            try:
                os.remove(fp)
                deleted += 1
            except OSError:
                pass  # already gone — deletion is idempotent
        return {"expired": len(committed) - keep_last, "deleted_files": deleted}
