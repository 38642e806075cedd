"""Bucketed + incremental + versioned table — the composed layout.

VERDICT r8 item #2: the 100 TB fact table wants BOTH watermark-
incremental refresh (merge cost O(new data), not O(table)) AND a
bucketed layout (downstream joins/aggs on the bucket key plan ZERO
shuffle exchanges). Spark's catalog bucketing can't compose with
incremental merge on its own: ``saveAsTable(mode="overwrite")`` is a
full drop-and-recreate, and there is no public API to replace
individual bucket files of a catalog table (``pipeline.py`` rejected
the combination for exactly this reason through r8).

This module composes all three existing layers instead of fighting the
writer:

- **Bucket files come from Spark's own bucketed writer** (a staging
  ``saveAsTable`` per refresh, entry dropped immediately), so every
  data file carries the bucket id in its NAME
  (``part-…_00007.c000.snappy.parquet``) — the metadata Spark's scan
  uses to plan bucketed joins. Nothing is hand-rolled about the hash:
  the staging write shuffles with the same ``pmod(murmur3, n)``
  Spark's scan assumes (the identity ``bucketing.py`` documents and
  tests pin).
- **Incremental merge is copy-on-write at BUCKET granularity**: the
  updates' bucket ids are computed with the same identity
  (``pmod(hash(keys), n)``), ONLY the touched buckets' files are read
  (direct file-list read — untouched buckets' files are never
  opened), merged (anti-join + union), and re-staged; untouched
  bucket files are HARDLINKED into the new snapshot — O(1) metadata
  per untouched bucket, no data copied. (Hardlinks are the local-fs
  form of Delta/Iceberg's file re-reference; the object-store port is
  a manifest that lists files across version dirs, or a server-side
  copy — same trade as ``versioning.py``'s pointer rename.)
- **Commits are `VersionedTable` commits**: data into a fresh
  ``data/vN``, manifest, then the fsync'd atomic pointer swap — so a
  refresh killed at ANY point leaves the previous snapshot intact and
  readable (crash-safety the plain catalog-bucketed table never had),
  with time travel and vacuum inherited.
- **Bucket-pruned point lookups**: an equality filter on the bucket
  column scans 1 of n bucket files (``SelectedBucketsCount`` in the
  plan) — note Spark's autoBucketedScan optimization (SPARK-32859)
  swaps in a plain scan when no operator needs the distribution,
  which also drops the pruning; set
  ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false`` for
  lookup-style workloads (pinned in tests).
- **Downstream zero-shuffle access**: ``register()`` creates an
  external ``CLUSTERED BY … INTO n BUCKETS`` table over the CURRENT
  snapshot dir. Spark parses each file's bucket id from its name, so
  the mixed-provenance snapshot (files hardlinked from several
  refreshes) scans as a first-class bucketed table: joins and groupBys
  on the bucket key plan zero exchanges (pinned in
  ``tests/test_bucketed_table.py``). Registration pins a snapshot —
  re-register after a commit to advance, exactly snapshot-isolation.

Scale shape of one refresh: one shuffle of the MERGED TOUCHED slice on
the bucket key (the staging write), a bounded collect of touched
bucket ids (≤ num_buckets values), and O(untouched buckets) hardlink
syscalls. A 4-hourly feed whose keys land in b of n buckets costs
b/n of a full rewrite — and a well-chosen bucket key (the join key,
usually time-correlated for event facts) keeps b small.

Replacement invariant: every touched bucket is fully rewritten by the
staging write and contributes EXACTLY ONE file to the new snapshot, so
each bucket always has one file — the precondition for Spark reading
``SORTED BY`` metadata (``bucketing.py`` module doc).

Same key-stability contract as every partition-scoped merge here:
bucket columns must be a subset of (or functionally dependent on) the
merge keys — a key that changed its bucket would leave its old row
alive in an untouched bucket. Enforced at merge time.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from nycitibike_data_transform_spark.versioning import (
    VersionedTable,
    _stats_friendly_writes,
)

# Spark's bucketed writer encodes the bucket id as _NNNNN before the
# file extensions: part-00003-<uuid>_00007.c000.snappy.parquet
# (zero-padded to 5 digits, but ids >= 100000 print wider — hence {5,})
_BUCKET_ID_RE = re.compile(r"_(\d{5,})\.")


def bucket_id_of_file(name: str) -> int:
    m = _BUCKET_ID_RE.search(os.path.basename(name))
    if not m:
        raise ValueError(f"no bucket id in file name {name!r}")
    return int(m.group(1))


class BucketedIncrementalTable(VersionedTable):
    """Versioned parquet table whose every snapshot is a valid Spark
    bucketed layout, refreshed by bucket-granular copy-on-write merge.

    Single-writer-many-readers, local filesystem — inherited contract
    from :class:`VersionedTable` (the root-URI rejection included).
    """

    def __init__(
        self,
        root: str,
        bucket_cols: list[str] | tuple[str, ...],
        num_buckets: int,
        sort_cols: list[str] | tuple[str, ...] | None = None,
        backend=None,
    ):
        super().__init__(root, backend=backend)
        if num_buckets < 1:
            raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
        self.bucket_cols = list(bucket_cols)
        if not self.bucket_cols:
            raise ValueError("bucket_cols must be non-empty")
        self.num_buckets = num_buckets
        self.sort_cols = list(sort_cols) if sort_cols else list(self.bucket_cols)
        cur = self.current_version()
        if cur is not None:
            m = self.manifest(cur)
            # sort_cols is part of the spec check too: a reopen with
            # different sort_cols would stage NEW bucket files sorted
            # one way while hardlinked old files stay sorted the other,
            # and register()'s SORTED BY metadata would then let Spark
            # elide sorts over files that aren't — silently wrong join
            # results, the worst failure class (review finding r9)
            spec = (m.get("bucket_cols"), m.get("num_buckets"), m.get("sort_cols"))
            if spec != (self.bucket_cols, self.num_buckets, self.sort_cols):
                raise ValueError(
                    f"existing table at {root} has layout {spec}, "
                    f"requested ({self.bucket_cols}, {self.num_buckets}, "
                    f"{self.sort_cols}) — changing the layout needs an "
                    "explicit full write_full after constructing with the "
                    "NEW spec and vacuuming"
                )

    # ------------------------------------------------------------ util

    def _bucket_expr(self):
        """The bucket id of a row — the same ``pmod(murmur3, n)``
        Spark's HashPartitioning / bucketed writer uses (the identity
        ``bucketing.py`` pins)."""
        return F.pmod(
            F.hash(*[F.col(c) for c in self.bucket_cols]), F.lit(self.num_buckets)
        )

    def _stage_bucketed(self, spark: SparkSession, df: DataFrame, tag: str) -> str:
        """Write ``df`` through Spark's bucketed writer into a scratch
        dir (catalog entry dropped immediately — the FILES and their
        bucket-id names are what we keep). Returns the staging dir.

        The dir is UNIQUE per attempt (r12 review): a fixed shared
        path (the old ``_staging/full``) re-opens for the bucketed
        writer exactly the zombie-vs-winner window the unique
        ``_attempt_dir`` + fence closed for ``VersionedTable`` — a
        stalled writer's ``finally`` rmtree on a shared path would
        delete a reclaiming winner's in-flight staged files. Unique
        dirs make every cleanup self-scoped; crashed attempts orphan
        under ``_staging`` and vacuum's fenced sweep collects them."""
        stage = f"{self._attempt_dir()}.{tag}"
        table = f"__bkt_stage_{os.getpid()}_{uuid.uuid4().hex[:8]}"
        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        writer = (
            df.repartition(self.num_buckets, *[F.col(c) for c in self.bucket_cols])
            .write.format("parquet")
            .mode("overwrite")
            .bucketBy(self.num_buckets, self.bucket_cols[0], *self.bucket_cols[1:])
            .sortBy(self.sort_cols[0], *self.sort_cols[1:])
            .option("path", stage)
        )
        with _stats_friendly_writes(spark):
            # MICROS timestamps (not stat-less INT96) so parquet
            # row-group skipping works on sorted time columns
            writer.saveAsTable(table)
        spark.sql(f"DROP TABLE `{table}`")  # external: files stay
        # Enforce the one-file-per-bucket invariant the whole layout
        # rests on (ADVICE r9): the repartition above normally yields
        # exactly one file per bucket, but a session conf like
        # spark.sql.files.maxRecordsPerFile splits writes and would
        # silently break both the manifest's single-file replacement
        # and the SORTED BY single-file precondition register() relies
        # on (Spark stops eliding sorts — wrong plans, quiet). Fail
        # loudly at stage time, before anything is committed.
        by_bucket: dict[int, list[str]] = {}
        for f in self._parquet_files(stage):
            by_bucket.setdefault(bucket_id_of_file(f), []).append(f)
        dupes = {b: fs for b, fs in by_bucket.items() if len(fs) > 1}
        if dupes:
            shutil.rmtree(stage, ignore_errors=True)
            raise RuntimeError(
                f"bucketed stage produced multiple files per bucket "
                f"{sorted(dupes)} — a write-splitting session conf "
                "(e.g. spark.sql.files.maxRecordsPerFile) is set; "
                "unset it for BucketedIncrementalTable writes"
            )
        return stage

    def _commit_linked(
        self, links: dict[str, str], schema: StructType
    ) -> int:
        """Assemble the next snapshot from ``{target_name: source_path}``
        hardlinks, then commit with the inherited manifest + pointer
        ordering (data → manifest → atomic swap)."""
        from nycitibike_data_transform_spark.versioning import (
            _STATS_FMT,
            _stats_cols,
            _sweep_footers,
        )

        cur = self.current_version()
        version = (cur or 0) + 1
        # assemble in a unique attempt dir, one atomic rename into the
        # slot (fenced) — nothing ever links into a shared path
        assembly = self._attempt_dir()
        try:
            os.makedirs(assembly)
            for name, src in sorted(links.items()):
                os.link(src, os.path.join(assembly, name))
            self._move_into_slot(assembly, version)
        finally:
            shutil.rmtree(assembly, ignore_errors=True)
        data_dir = self._data_dir(version)
        # commit-time zone-map stats, same posture as write_version:
        # hardlinked bucket files carry their entry forward by name
        # (same inode); only the re-staged buckets get swept — at most
        # num_buckets tiny footer reads, before the pointer swap
        prev_stats = {}
        prev_fields: list[str] = []
        if cur is not None:
            pm = self.manifest(cur)
            prev_fields = [f["name"] for f in pm["schema"]["fields"]]
            if pm.get("stats_fmt") == _STATS_FMT:
                prev_stats = pm.get("stats", {})
        carried = {f: prev_stats[f] for f in links if f in prev_stats}
        from nycitibike_data_transform_spark.versioning import (
            _backfill_added_all_null,
        )

        # evolution-added columns: hardlinked pre-evolution bucket
        # files are provably all-null — stamp the prunable marker
        carried = _backfill_added_all_null(carried, prev_fields, schema)
        fresh = _sweep_footers(
            data_dir,
            [f for f in links if f not in carried],
            _stats_cols(schema),
        )
        manifest = {
            "version": version,
            "schema": schema.jsonValue(),
            "partition_by": [],
            "files": sorted(links),
            "bucket_cols": self.bucket_cols,
            "num_buckets": self.num_buckets,
            "sort_cols": self.sort_cols,
            "stats_fmt": _STATS_FMT,
            "stats": {**carried, **fresh},
        }
        self._ensure_lease()  # see VersionedTable's fence note
        self._put_manifest(version, json.dumps(manifest))
        self._commit_pointer(cur, version)
        return version

    @staticmethod
    def _parquet_files(d: str) -> list[str]:
        return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))

    # ----------------------------------------------------------- writes

    def write_full(self, spark: SparkSession, df: DataFrame) -> int:
        """Bootstrap / full refresh: every bucket rewritten, committed
        as the next snapshot. Locked (single-writer, see
        :meth:`VersionedTable._write_lock`)."""
        missing = [c for c in self.bucket_cols if c not in df.columns]
        if missing:
            raise ValueError(f"bucket columns missing from input: {missing}")
        with self._write_lock():
            stage = self._stage_bucketed(spark, df, "full")
            try:
                links = {
                    f: os.path.join(stage, f)
                    for f in self._parquet_files(stage)
                }
                return self._commit_linked(links, df.schema)
            finally:
                shutil.rmtree(stage, ignore_errors=True)

    def merge(
        self, spark: SparkSession, updates: DataFrame, keys: list[str]
    ) -> list[int]:
        """Bucket-granular copy-on-write MERGE (delete-insert on
        ``keys``): reads and rewrites ONLY the buckets the updates'
        keys hash into; every other bucket's file is hardlinked into
        the new snapshot untouched. Returns the touched bucket ids.

        Key-stability contract enforced structurally: the bucket
        columns must be a subset of ``keys`` (then a key can never
        change its bucket, so delete-insert at bucket scope is exact).

        Locked for the whole read-base → stage → commit span (see
        :meth:`VersionedTable._write_lock`): two concurrent merges
        from the same base would each commit a snapshot missing the
        other's buckets — the classic lost update; the loser now
        raises :class:`ConcurrentWriteError
        <nycitibike_data_transform_spark.versioning.ConcurrentWriteError>`
        instead.
        """
        with self._write_lock():
            return self._merge_locked(spark, updates, keys)

    def _merge_locked(
        self, spark: SparkSession, updates: DataFrame, keys: list[str]
    ) -> list[int]:
        if not keys:
            raise ValueError("merge needs at least one key column")
        not_in_keys = [c for c in self.bucket_cols if c not in keys]
        if not_in_keys:
            raise ValueError(
                f"bucket columns {not_in_keys} are not merge keys: a row "
                "whose bucket column changed would keep its stale copy "
                "alive in an untouched bucket — bucket by (a subset of) "
                "the merge keys"
            )
        cur = self.current_version()
        if cur is None:
            raise ValueError(
                f"empty table at {self.root}: bootstrap with write_full"
            )
        m = self.manifest(cur)
        # additive schema evolution (VERDICT r9 item #2): updates may
        # APPEND nullable columns — untouched buckets keep their old
        # files hardlinked and byte-identical, reading NULL for the
        # added columns under the evolved manifest schema; drops and
        # re-types raise (full rewrite territory). The evolved schema
        # is committed-fields-first + added fields in updates order,
        # so every pre-evolution reader's column layout is a prefix.
        from nycitibike_data_transform_spark.versioning import (
            _additive_evolution,
        )

        # narrowing="widen": the committed schema below is rebuilt
        # from the manifest, preserving committed nullability — an
        # updates plan with non-nullable columns never narrows it
        added = set(
            _additive_evolution(m["schema"], updates.schema, narrowing="widen")
        )
        schema = StructType.fromJson(m["schema"])
        for f in updates.schema.fields:
            if f.name in added:
                schema = schema.add(f.name, f.dataType, nullable=True)
        updates = updates.select(*[f.name for f in schema.fields])
        # checkpoint BEFORE the touched-bucket collect (review finding
        # r9, the flag_contaminated lesson): the collect below and the
        # merge would otherwise each re-run the updates plan — paying
        # the build twice, and worse, a nondeterministic source could
        # emit rows into a bucket the collect didn't see, committing
        # TWO files for one bucket (stale duplicates + a broken
        # one-file-per-bucket invariant)
        updates = updates.localCheckpoint(eager=True)

        # bounded metadata collect: ≤ num_buckets distinct ids
        touched = sorted(
            r[0]
            for r in updates.select(self._bucket_expr().alias("__b"))
            .distinct()
            .collect()
        )
        data_dir = self._data_dir(cur)
        prev = {f: bucket_id_of_file(f) for f in m["files"]}
        touched_set = set(touched)
        touched_files = [
            os.path.join(data_dir, f) for f, b in prev.items() if b in touched_set
        ]

        if touched_files:
            existing = spark.read.schema(schema).parquet(*touched_files)
            merged = existing.join(
                updates.select(*keys), keys, "left_anti"
            ).unionByName(updates)
        else:  # all-new buckets (or an empty previous snapshot)
            merged = updates
        # lineage break: the staging write must not re-run the merge
        # plan per task, and (unlike overwrite-in-place merges) we
        # also want the touched-file read finished before any linking
        merged = merged.localCheckpoint(eager=True)

        stage = self._stage_bucketed(spark, merged, "merge")
        try:
            links = {
                f: os.path.join(data_dir, f)
                for f, b in prev.items()
                if b not in touched_set
            }
            for f in self._parquet_files(stage):
                links[f] = os.path.join(stage, f)
            self._commit_linked(links, schema)
            return touched
        finally:
            shutil.rmtree(stage, ignore_errors=True)

    # ---------------------------------------------------- guarded paths

    def write_version(self, df: DataFrame, partition_by: tuple[str, ...] = ()) -> int:
        """Blocked: a plain-parquet commit would produce files without
        bucket ids in their names, silently breaking every later
        bucketed scan and merge. Snapshots go through
        :meth:`write_full` / :meth:`merge`."""
        raise TypeError(
            "BucketedIncrementalTable snapshots must be written with "
            "write_full()/merge() — write_version() would commit an "
            "unbucketed snapshot"
        )

    def rewrite_full(
        self,
        spark: SparkSession,
        transform,
        partition_by: tuple[str, ...] | None = None,
    ) -> int:
        """Blocked for the same reason as :meth:`write_version`: the
        inherited full-rewrite commits plain part-files with no bucket
        ids and a manifest without the bucket spec — every later
        bucketed scan and merge would silently break (register() would
        even emit CLUSTERED BY metadata over unsorted files). Migrate
        a bucketed table by constructing with the NEW spec and
        ``write_full(transform(read_current(spark)))``."""
        raise TypeError(
            "BucketedIncrementalTable snapshots must be rewritten with "
            "write_full() under the (possibly new) bucket spec — "
            "rewrite_full() would commit an unbucketed snapshot"
        )

    def compact(self, spark: SparkSession, target_file_mb: int = 128,
                cluster_by: tuple[str, ...] = (),
                zorder_by: tuple[str, ...] = ()) -> int:
        """Blocked: every snapshot already holds exactly one file per
        bucket (the replacement invariant), so there is nothing to
        compact; file sizing is governed by ``num_buckets``. To change
        the layout, construct with the new spec and
        ``write_full(read_current())``."""
        raise TypeError(
            "BucketedIncrementalTable is always one file per bucket; "
            "re-layout via write_full under a new bucket spec"
        )

    # ------------------------------------------------------------ reads

    @contextmanager
    def bucket_pruned(self, spark: SparkSession):
        """Pin bucket pruning ON for the lookup pattern (VERDICT r10
        item #4): Spark's autoBucketedScan optimization (SPARK-32859)
        swaps the bucketed scan for a plain one whenever no operator
        in the query needs the hash distribution — a filter-only point
        lookup is exactly that shape, so it silently LOSES
        ``SelectedBucketsCount`` pruning and reads all n bucket files
        for a 1-bucket answer. This context manager pins
        ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false``
        and restores the previous value on exit.

        The conf is read at PLAN time, which Spark defers to the
        ACTION — so the collect/write must happen INSIDE this block,
        not just the DataFrame construction. :meth:`point_lookup`
        wraps the whole fetch for the common case."""
        key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        prev = spark.conf.get(key)
        spark.conf.set(key, "false")
        try:
            yield
        finally:
            spark.conf.set(key, prev)

    def _key_condition(self, vals: list):
        """The residual row filter for a point lookup: bucket pruning
        narrows to files, this narrows to rows (a bucket holds many
        keys)."""
        if len(self.bucket_cols) == 1:
            return F.col(self.bucket_cols[0]).isin(vals)
        cond = None
        for tup in vals:
            if len(tup) != len(self.bucket_cols):
                raise ValueError(
                    f"each key tuple must have {len(self.bucket_cols)} "
                    f"values (bucket columns {self.bucket_cols}), got "
                    f"{tup!r}"
                )
            one = F.lit(True)
            for c, v in zip(self.bucket_cols, tup):
                one = one & (F.col(c) == F.lit(v))
            cond = one if cond is None else (cond | one)
        return cond

    def point_lookup(self, spark: SparkSession, table: str, values) -> list:
        """Fetch the rows whose bucket key is in ``values`` from the
        REGISTERED catalog table (:meth:`register`), scanning only the
        buckets those keys hash into — the O(|keys| buckets) GET the
        layout exists for. Single-bucket-column tables take a list of
        key values; multi-column tables a list of key TUPLES (bounded
        OR-of-ANDs — point lookups are short lists by definition).
        Executes (collects) under :meth:`bucket_pruned` so the pinned
        conf is live at plan time; returns the driver-side rows."""
        vals = list(values)
        if not vals:
            return []
        cond = self._key_condition(vals)
        with self.bucket_pruned(spark):
            return spark.table(table).filter(cond).collect()

    def point_lookup_df(self, spark: SparkSession, values,
                        version: int | None = None) -> DataFrame:
        """The COMPOSABLE point lookup (r11 VERDICT item #6): the same
        O(|keys| buckets) pruned scan as :meth:`point_lookup`, returned
        as a DataFrame safe to feed into joins/aggregations with the
        pruning intact — no driver-side collect, no context-manager
        footgun.

        Why not the catalog route: ``autoBucketedScan`` is a PLANNER
        flag read at action time, so a DataFrame built under
        :meth:`bucket_pruned` silently loses its pruning when composed
        into a larger plan executed outside the block. This variant
        prunes at the FILE level instead — the snapshot keeps exactly
        one file per bucket, so the keys' bucket ids name the files —
        and a file list is part of the plan itself: no later
        re-planning can widen it.

        The keys' bucket ids come from Spark's OWN ``pmod(murmur3, n)``
        over a 1-job LocalTableScan of the key values cast to the
        table's exact key schema (hash semantics are type-sensitive:
        an int and a long hash differently) — never a hand-rolled
        re-implementation of Spark's hash. Bounded driver work:
        ≤ |keys| local rows, no table I/O. The residual key filter
        keeps the answer exact within the kept files."""
        vals = list(values)
        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"empty versioned table at {self.root}")
        if not vals:
            return self._pruned_scan(spark, v, [])
        cond = self._key_condition(vals)
        schema = StructType.fromJson(self.manifest(v)["schema"])
        key_schema = StructType([schema[c] for c in self.bucket_cols])
        rows = (
            [(x,) for x in vals]
            if len(self.bucket_cols) == 1
            else [tuple(t) for t in vals]
        )
        ids = {
            r["__b"]
            for r in spark.createDataFrame(rows, key_schema)
            .select(self._bucket_expr().alias("__b"))
            .collect()
        }
        files = [
            f
            for f in self._parquet_files(self._data_dir(v))
            if bucket_id_of_file(f) in ids
        ]
        return self._pruned_scan(spark, v, files).filter(cond)

    def register(self, spark: SparkSession, table: str) -> int:
        """(Re-)create catalog table ``table`` as an external bucketed
        table over the CURRENT snapshot. The registration is pinned to
        that snapshot (snapshot isolation for its readers); call again
        after a commit to advance. Returns the registered version."""
        cur = self.current_version()
        if cur is None:
            raise ValueError(f"empty versioned table at {self.root}")
        schema = StructType.fromJson(self.manifest(cur)["schema"])
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        bcols = ", ".join(f"`{c}`" for c in self.bucket_cols)
        scols = ", ".join(f"`{c}`" for c in self.sort_cols)
        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        spark.sql(
            f"CREATE TABLE `{table}` ({cols}) USING PARQUET "
            f"CLUSTERED BY ({bcols}) SORTED BY ({scols}) "
            f"INTO {self.num_buckets} BUCKETS "
            f"LOCATION '{self._data_dir(cur)}'"
        )
        return cur
