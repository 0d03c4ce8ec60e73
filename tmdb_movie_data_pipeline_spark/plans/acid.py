"""Transactional versioned Parquet table — the moral equivalent of a Delta
table for an image without Delta/Iceberg jars (SURVEY.md §2.8 W4/W5 scaled
up; VERDICT r1 "What's missing" #2).

Layout (all under one table root)::

    <root>/_log/00000000000.json   one manifest per committed version
    <root>/data/v<N>-<token>/      immutable parquet data, one dir/version

Protocol — the same core ideas as the Delta log, reduced to a filesystem:

* **Snapshot isolation**: a manifest pins the exact file list of a version;
  readers resolve a manifest once and only ever read immutable files, so a
  concurrent writer can never tear a read.
* **Atomic commit / optimistic concurrency**: a writer stages data files in
  a fresh ``data/`` dir (invisible — no manifest references them), writes
  the manifest to a tmp name, then publishes with put-if-absent
  (``os.link`` fails with EEXIST if the version was taken). Two racing
  writers of version N: exactly one wins; the loser rebase-retries against
  the new snapshot. This is Delta's mutual-exclusion-on-log-entry, with
  hard-link-create standing in for the object store's conditional put.
* **Time travel**: ``read(version=K)`` resolves manifest K.
* **OPTIMIZE**: compaction = a new version with identical logical content
  and fewer files; readers of old versions are unaffected.

At 100 TB the manifest holds partition-level stats for pruning and lives in
an object store with conditional-put; the commit path (stage invisible →
publish one small object atomically) is unchanged — that's precisely why
Delta scales, and why this emulation keeps the shape.

Reference parity: the atomic tmp+rename checkpoint doc
(/root/reference/src/movie.py:208-222) is the single-version ancestor of
this log; acid.py generalizes it to multi-version with concurrency control.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TxTable", "CommitConflict", "PendingGroupConflict"]

_LOG_DIR = "_log"
_DATA_DIR = "data"


class CommitConflict(Exception):
    """Another writer committed this version first; rebase and retry."""


class PendingGroupConflict(CommitConflict):
    """A prepared-but-unresolved group transaction holds a version slot
    above the visible head. Committing above it would shadow this member's
    group update if the group later commits — applied on the other members,
    silently lost here (ADVICE r6). Retry after the group commits or
    aborts. A prepare that fails MID-PREPARE tombstones itself
    (TxGroup.abort); a coordinator that crashes BETWEEN prepare and
    commit leaves the classic 2PC in-doubt state — writers keep refusing
    until an operator (or a lease/watchdog policy) resolves it via
    ``TxTable.pending_groups()`` + ``TxGroup.commit``/``abort``. That
    wait is deliberate: an automatic timeout abort could roll back a
    merely-slow coordinator that then commits, resurrecting the lost
    update this exception exists to prevent."""


def _manifest_name(version: int) -> str:
    return f"{version:011d}.json"


def _optimized_write(df: "DataFrame") -> "DataFrame":
    """Delta-style optimized write (guide §6 small-files; r21): a REBALANCE
    hint ahead of the stage write lets AQE size the output partitions to the
    advisory target, so a MERGE/DELETE rewrite lands as few right-sized
    files instead of one near-empty file per upstream task (the benched
    merge's anti-join ∪ source union produced 48 files of ~15 k total rows
    — 48 task commits + 48 footers every downstream read then pays).
    Applied ONLY to the merge/delete rewrite relations — never to
    CREATE/OPTIMIZE paths, whose callers may pass an explicit layout
    (range-clustered creates must keep their per-file key locality).
    Parameterised: SPARK_GRAFT_OPTIMIZED_WRITES=false restores the r20
    behavior; at 100 TB the hint stays correct (the rebalance shuffle
    carries only the touched-file rewrite, the same price Delta's
    optimizeWrite pays for the same reason)."""
    import os

    if os.environ.get("SPARK_GRAFT_OPTIMIZED_WRITES", "true").lower() == "false":
        return df
    return df.hint("rebalance")


def _overlap_commit_jobs() -> bool:
    """Whether independent Spark jobs inside one logical commit (the data
    rewrite and its CDF change-file sidecar; a group's member prepares) may
    run CONCURRENTLY from driver threads (guide §2.6: Spark's scheduler
    happily runs several jobs at once — actions are only sequential because
    driver code calls them sequentially; the second job's tasks back-fill
    executors the first job's tail leaves idle). Pure scheduling overlap:
    every job's plan, its output files, and the published manifest are
    byte-identical either way — only wall-clock changes. Parameterised:
    SPARK_GRAFT_CONCURRENT_COMMIT_JOBS=false restores strictly sequential
    job submission (and is how the A/B in OPTIMIZATION_r21.md was run)."""
    return (
        os.environ.get("SPARK_GRAFT_CONCURRENT_COMMIT_JOBS", "true").lower()
        != "false"
    )


class TxTable:
    """A versioned parquet table with atomic commits and time travel."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        # change_feed table-property flag, lazily resolved at most once per
        # instance (ADVICE r16 #2): the property is set at CREATE and only
        # ever propagated thereafter (no API toggles it), so the first read
        # is authoritative for the table's lifetime. None = not yet read.
        self._change_feed_prop: bool | None = None

    # -- log ------------------------------------------------------------

    def _log_path(self) -> str:
        return os.path.join(self.path, _LOG_DIR)

    def versions(self) -> list[int]:
        try:
            names = os.listdir(self._log_path())
        except FileNotFoundError:
            return []
        return sorted(
            int(n[:-5]) for n in names if n.endswith(".json") and n[:-5].isdigit()
        )

    def latest_version(self) -> int:
        """Highest CLAIMED version slot — including group-pending manifests
        whose transaction has not committed. Writers claim slots above
        this; readers must use :meth:`latest_visible_version`."""
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no committed versions at {self.path}")
        return vs[-1]

    @staticmethod
    def _group_state(manifest: dict) -> str:
        """Tri-state of a manifest's group transaction, resolved from the
        group record whose path the manifest carries (plans/txgroup.py):

        * ``"visible"`` — no group, or the record exists and is a commit;
        * ``"pending"`` — the record does not exist yet: the transaction
          may still commit OR abort, so the slot is live (invisible to
          readers, blocking to transactional writers, unreclaimable);
        * ``"aborted"`` — the record exists and says ``aborted``:
          permanently invisible, never blocks a writer, and VACUUM may
          reclaim its files.

        Enforced HERE so every reader and writer shares one rule."""
        rec = manifest.get("group_record")
        if rec is None:
            return "visible"
        if not os.path.exists(rec):
            return "pending"
        try:
            with open(rec) as f:
                record = json.load(f)
        except (OSError, ValueError):
            # record unreadable mid-race: treat as pending (safe — stays
            # invisible and unreclaimed until the record resolves)
            return "pending"
        return "aborted" if record.get("aborted") else "visible"

    @classmethod
    def _is_visible(cls, manifest: dict) -> bool:
        return cls._group_state(manifest) == "visible"

    def latest_visible_version(self) -> int:
        for v in reversed(self.versions()):
            if self._is_visible(self.manifest(v)):
                return v
        raise FileNotFoundError(f"no visible versions at {self.path}")

    def pending_slots(self) -> list[int]:
        """Version slots above the visible head held by PREPARED-but-
        unresolved group transactions. Transactional writers must refuse
        to commit while this is non-empty (see PendingGroupConflict);
        aborted slots are excluded — they are dead and never block.
        Empty-table tolerant (a CREATE has nothing to conflict with)."""
        try:
            head = self.latest_visible_version()
        except FileNotFoundError:
            return []
        return [
            v
            for v in self.versions()
            if v > head and self._group_state(self.manifest(v)) == "pending"
        ]

    def pending_groups(self) -> list[tuple[int, str, str]]:
        """(version, gid, group-record path) for every pending slot — the
        IN-DOUBT transaction list. This is the recovery hook when a
        coordinator crashed between prepare and commit: an operator (or a
        watchdog applying a lease policy) inspects these and resolves each
        via TxGroup.commit or TxGroup.abort; until then writers keep
        refusing, which is 2PC's deliberate in-doubt behavior — an
        automatic timeout abort could kill a merely-slow coordinator."""
        return [
            (
                v,
                self.manifest(v).get("pending_group", ""),
                self.manifest(v).get("group_record", ""),
            )
            for v in self.pending_slots()
        ]

    def _refuse_pending(self, op: str) -> None:
        pending = self.pending_slots()
        if pending:
            gids = [g for _, g, _ in self.pending_groups()]
            raise PendingGroupConflict(
                f"in-flight group transaction(s) {gids} hold slot(s) "
                f"{pending} at {self.path}: {op} would shadow the group's "
                "update to this member; retry after the group commits or "
                "aborts (recovery: TxTable.pending_groups + TxGroup.abort)"
            )

    def _abs(self, rel: str) -> str:
        """Manifest file entries are normally RELATIVE to the table root;
        shallow clones reference another table's files by ABSOLUTE path
        (metadata-only clone — same caveat as Delta's: vacuuming the
        SOURCE can orphan a clone's references)."""
        return rel if os.path.isabs(rel) else os.path.join(self.path, rel)

    def manifest(self, version: int) -> dict:
        with open(os.path.join(self._log_path(), _manifest_name(version))) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        return [self.manifest(v) for v in self.versions()]

    # -- read -----------------------------------------------------------

    def read(
        self, version: int | None = None, use_log_schema: bool = False
    ) -> DataFrame:
        """Snapshot read: resolve one manifest, read only its (immutable)
        files. Concurrent commits can never change what this returns.

        ``use_log_schema=True`` applies the manifest's schema to the scan —
        the log, not the file footers, is the schema authority (how every
        log-based format reads after schema evolution): files written
        before a column existed surface it as NULL, with no mergeSchema
        footer sweep. Off by default so pre-evolution readers keep their
        exact plan."""
        v = self.latest_visible_version() if version is None else version
        m = self.manifest(v)
        files = [self._abs(rel) for rel in m["files"]]
        if not files:
            return self.spark.createDataFrame([], m["schema_ddl"])
        if use_log_schema:
            df = self.spark.read.schema(m["schema_ddl"]).parquet(*files)
        else:
            df = self.spark.read.parquet(*files)
        dvs = m.get("dvs") or []
        if dvs:
            # merge-on-read: subtract deletion-vector positions. Staged part
            # file names carry a per-write uuid, so (file_name, row_index)
            # addresses a row uniquely within the table; the DV relation is
            # deleted-rows-sized and broadcasts (Delta's DV bitmap reduced
            # to its relational essence — the scan itself is untouched,
            # which is the whole point of MoR deletes).
            from pyspark.sql import functions as F

            dv = (
                self.spark.read.parquet(*[self._abs(rel) for rel in dvs])
                .select("file_name", "row_index")
                .distinct()
            )
            src = df.select(
                F.col("_metadata.file_name").alias("_dv_file"),
                F.col("_metadata.row_index").alias("_dv_pos"),
                "*",
            )
            df = src.join(
                F.broadcast(dv),
                (src["_dv_file"] == dv["file_name"])
                & (src["_dv_pos"] == dv["row_index"]),
                "left_anti",
            ).drop("_dv_file", "_dv_pos")
        return df

    def change_rows(self, version: int) -> DataFrame | None:
        """Typed change rows (``change_type`` + the table's columns)
        recorded at commit time for ``version`` — the read side of the
        change feed (Delta's ``readChangeFeed`` per-commit slice).

        Returns ``None`` when the commit recorded no change file (table
        property off at commit time, or a RESTORE): the caller falls back
        to diffing the two adjacent snapshots, which is the semantic
        ground truth this fast path must agree with. An explicit empty
        recording (``"changes": []`` — e.g. OPTIMIZE, or a commit that
        matched zero rows) returns an EMPTY DataFrame, not None, so no
        snapshot diff ever runs for it."""
        m = self.manifest(version)
        rels = m.get("changes")
        if rels is None:
            return None
        if not rels:
            return self.spark.createDataFrame(
                [], "change_type string, " + m["schema_ddl"]
            )
        return self.spark.read.parquet(*[self._abs(rel) for rel in rels])

    # -- write ----------------------------------------------------------

    def _stage(self, df: DataFrame, version: int, suffix: str = "") -> list[str]:
        """Write data files into a fresh, manifest-invisible directory.
        ``suffix`` distinguishes sidecar stages (change files) from data
        stages; both live under ``data/v<N>-…`` so VACUUM's in-flight
        protection (slot number above every claimed slot → live stage)
        covers them identically."""
        token = uuid.uuid4().hex[:12]
        rel_dir = os.path.join(_DATA_DIR, f"v{version}-{token}{suffix}")
        df.write.mode("error").parquet(os.path.join(self.path, rel_dir))
        out = []
        for name in sorted(os.listdir(os.path.join(self.path, rel_dir))):
            if name.endswith(".parquet"):
                out.append(os.path.join(rel_dir, name))
        return out

    def _file_stats(self, rel: str, col: str) -> dict | None:
        """Per-file [min, max] of ``col`` straight from the parquet footer —
        no data scan. Returns None when stats are unusable (empty file,
        missing statistics, non-integer key), which disables pruning for
        that file (it is then always treated as touched: safe, not wrong)."""
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(self._abs(rel))
        try:
            idx = pf.schema_arrow.names.index(col)
        except ValueError:
            return None
        mins: list[int] = []
        maxs: list[int] = []
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            if not isinstance(st.min, int) or not isinstance(st.max, int):
                return None
            mins.append(st.min)
            maxs.append(st.max)
        if not mins:
            return None
        return {"min": min(mins), "max": max(maxs)}

    def _publish(self, manifest: dict) -> None:
        """Put-if-absent commit: hard-link-create the manifest name; EEXIST
        means another writer took this version."""
        log_dir = self._log_path()
        os.makedirs(log_dir, exist_ok=True)
        final = os.path.join(log_dir, _manifest_name(manifest["version"]))
        tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, final)  # atomic create-exclusive
        except FileExistsError:
            raise CommitConflict(
                f"version {manifest['version']} already committed at {self.path}"
            ) from None
        finally:
            os.unlink(tmp)

    def _commit(
        self,
        df: DataFrame,
        version: int,
        op: str,
        stats_key: str | None = None,
        carry: list[tuple[str, dict | None]] | None = None,
        extra: dict | None = None,
        changes: DataFrame | None = None,
    ) -> int:
        """Stage ``df``, then publish a manifest holding the staged files
        plus any ``carry`` files referenced (not rewritten) from a previous
        version. When ``stats_key`` is set, each staged file gets footer
        min/max stats for that column, enabling file-pruned MERGE.

        Pending-slot refusal is enforced HERE, at the one choke point
        every write path shares (create/merge/delete/optimize/
        optimize_clustered/the streaming sink/TxGroup.prepare itself) —
        the first cut guarded only merge/delete call-sites, and the two
        unguarded writers each reconstructed the lost-update hole
        (review r7). TxGroup.prepare needs no opt-out: each member table
        appears once per group, so the only pending slots it can see
        belong to OTHER transactions — exactly the coordinator-vs-
        coordinator shadowing that must also refuse (prepare's
        self-abort then rolls back its earlier members)."""
        self._refuse_pending(op)
        # Stage the CDF sidecar CONCURRENTLY with the data rewrite when both
        # exist (guide §2.6): the two writes are independent jobs over
        # disjoint output dirs, and sequential submission left the cluster
        # idle through each one's task tail (measured r21 session 2: the
        # benched merge's 1.4 s data stage + 1.0 s changes stage ran back to
        # back). The staged files, manifest content, and commit point are
        # identical either way — only the submission overlaps.
        changes_fut = None
        pool = None
        if changes is not None and _overlap_commit_jobs():
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=1)
            changes_fut = pool.submit(self._stage, changes, version, "-changes")
        try:
            staged = self._stage(df, version)
            files = list(staged)
            stats: dict[str, dict | None] = {}
            if stats_key is not None and staged:
                # footer reads are IO-bound and release the GIL inside
                # pyarrow; a thread pool turns the per-file metadata pass
                # into ~one slowest-file latency instead of a serial sum (at
                # real scale the writer computes stats inline with the write
                # — this is the collector for files staged by Spark's
                # committer).
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=min(16, len(staged))) as ex:
                    for rel, st in zip(
                        staged,
                        ex.map(lambda r: self._file_stats(r, stats_key), staged),
                    ):
                        stats[rel] = st
            for rel, st in carry or []:
                files.append(rel)
                if stats_key is not None:
                    stats[rel] = st
            manifest = {
                "version": version,
                "op": op,
                "files": files,
                "schema_ddl": ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in df.schema.fields
                ),
            }
            if stats_key is not None:
                manifest["stats_key"] = stats_key
                manifest["stats"] = stats
            if changes is not None:
                # CDF sidecar (VERDICT r14 #5): the typed change rows this
                # commit causes, staged alongside the data so the change feed
                # is a SCAN of change files instead of a per-commit snapshot
                # diff — Delta's _change_data directory, reduced to manifest
                # entries. Presence of the "changes" key (even as []) means
                # "recorded at write time"; absence means a reader must fall
                # back to diffing adjacent snapshots for this commit.
                manifest["changes"] = (
                    changes_fut.result()
                    if changes_fut is not None
                    else self._stage(changes, version, "-changes")
                )
        finally:
            # drain the sidecar writer on EVERY exit (a failure anywhere
            # above must not leave its job racing a caller's cleanup)
            if pool is not None:
                pool.shutdown(wait=True)
        if version > 0 and not (extra and extra.get("change_feed")):
            # Persistent table properties propagate at THE choke point, not
            # per call site (ADVICE r15 #1): TxGroup.prepare published member
            # manifests with only its pending-group extras, silently dropping
            # change_feed — every later merge/delete then checked the base
            # manifest, found nothing, and permanently stopped recording
            # change files (the feed degraded to the snapshot-diff fallback).
            # Reading the property from the latest VISIBLE manifest here makes
            # every _commit writer (group prepares, the streaming sink, any
            # future caller) property-preserving by construction; the direct
            # paths that bypass _commit (restore / delete_range_dv / clone)
            # keep their explicit propagation. The read resolves AT MOST ONCE
            # per instance (ADVICE r16 #2: re-resolving latest_visible_version
            # per commit added a log listing + manifest JSON read even for
            # tables that never enabled the property) — sound because the
            # property is create-time-constant, never toggled.
            if self._change_feed_prop is None:
                self._change_feed_prop = bool(
                    self.manifest(self.latest_visible_version()).get("change_feed")
                )
            if self._change_feed_prop:
                manifest["change_feed"] = True
        if extra:
            # e.g. TxGroup's pending-group marker (plans/txgroup.py): fields
            # the manifest carries verbatim for cross-table protocols
            manifest.update(extra)
        self._publish(manifest)
        return version

    # -- public operations ----------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        stats_key: str | None = None,
        change_feed: bool = False,
    ) -> "TxTable":
        """Commit v0. With ``stats_key`` set, every staged file records
        footer min/max of that column in the manifest — the file-skipping
        metadata every log-based format keeps, here enabling MERGE to
        rewrite only the files whose key range intersects the source.

        ``change_feed=True`` is Delta's ``delta.enableChangeDataFeed``
        table property: subsequent MERGE/DELETE/OPTIMIZE commits record
        their typed change rows at WRITE time (manifest key ``changes``),
        so :meth:`change_rows` is a scan of change files — O(changed rows)
        per commit regardless of commit count — instead of a snapshot diff.
        Off by default: recording costs one extra change-row write per
        commit, so tables nobody tails shouldn't pay it (the same reason
        Delta's property is opt-in). The v0 CREATE itself records no
        change file — a feed consumer reads changes SINCE a version, and
        the initial content is that version's snapshot, not a change."""
        t = cls(spark, path)
        extra = {"change_feed": True} if change_feed else None
        t._commit(df, 0, "CREATE", stats_key=stats_key, extra=extra)
        t._change_feed_prop = change_feed  # seed the cache: creator knows
        return t

    @classmethod
    def shallow_clone(
        cls, spark: SparkSession, path: str, source: "TxTable"
    ) -> "TxTable":
        """Metadata-only clone: v0 references the source's current files by
        absolute path — zero data copied, O(manifest) cost (Delta's
        SHALLOW CLONE). The clone then diverges copy-on-write: its own
        commits stage new files under ITS root, so writes on either side
        never touch the other. Caveat shared with Delta: VACUUM on the
        source can delete files the clone still references — production
        retention must account for clones."""
        m = source.manifest(source.latest_visible_version())
        t = cls(spark, path)
        manifest = {
            "version": 0,
            "op": f"SHALLOW_CLONE {source.path}",
            "files": [source._abs(rel) for rel in m["files"]],  # noqa: SLF001
            "schema_ddl": m["schema_ddl"],
        }
        if m.get("dvs"):  # deletion vectors travel with the snapshot
            manifest["dvs"] = [source._abs(rel) for rel in m["dvs"]]  # noqa: SLF001
        if m.get("change_feed"):  # the table property travels with the clone
            manifest["change_feed"] = True
        if "stats_key" in m:
            manifest["stats_key"] = m["stats_key"]
            manifest["stats"] = {
                source._abs(rel): st  # noqa: SLF001
                for rel, st in (m.get("stats") or {}).items()
            }
        t._publish(manifest)
        t._change_feed_prop = bool(m.get("change_feed"))  # travels with clone
        return t

    def _touched_files(
        self, manifest: dict, source: DataFrame, key: str
    ) -> tuple[list[str], list[str]] | None:
        """Split the snapshot's files into (touched, untouched) by joining
        DISTINCT source keys against per-file [min, max] footer stats — the
        manifest-level file-skipping join (Delta/Iceberg do the identical
        pruning against their stats columns). Returns None when stats are
        absent/unusable, falling back to a full rewrite.

        The stats relation has one row per FILE (tiny by construction — at
        100 TB a manifest is ~1e5 rows), so collecting the pruned file list
        to the driver is bounded metadata, not data."""
        from pyspark.sql import functions as F

        if manifest.get("stats_key") != key:
            return None
        if manifest.get("dvs"):
            # deletion vectors pending: the pruned path reads raw files,
            # which would resurrect DV-deleted rows in BOTH the touched
            # rewrite and the carried-by-reference files. Fall back to the
            # full DV-applied read (whose commit also purges the DVs).
            return None
        stats = manifest.get("stats") or {}
        files = manifest["files"]
        if not all(stats.get(rel) for rel in files):
            return None
        rows = [(rel, stats[rel]["min"], stats[rel]["max"]) for rel in files]
        fdf = self.spark.createDataFrame(rows, "rel string, kmin long, kmax long")
        skeys = source.select(F.col(key).cast("long").alias("_k")).distinct()
        touched = {
            r.rel
            for r in fdf.join(
                skeys,
                (F.col("_k") >= F.col("kmin")) & (F.col("_k") <= F.col("kmax")),
                "left_semi",
            ).collect()
        }
        return (
            [rel for rel in files if rel in touched],
            [rel for rel in files if rel not in touched],
        )

    @staticmethod
    def _merge_changes(old: DataFrame, source: DataFrame, key: str) -> DataFrame:
        """Typed change rows a full-row upsert causes, computed against the
        pre-image: INSERTs are source rows whose key is absent (stats
        pruning keeps this exact — any file holding a source key is in the
        touched set, so absent-from-touched equals absent-from-table), and
        UPDATEs are source rows whose key matches but whose row DIFFERS
        (null-safe, column by column). A source row identical to its
        target row produces NO change row — the same no-op rule the
        snapshot diff applies, which is what keeps the write-time feed
        hash-identical to the diff-reconstructed one."""
        from pyspark.sql import functions as F

        cols = list(source.columns)
        val_cols = [c for c in cols if c != key]
        inserts = source.join(old.select(key), key, "left_anti").select(
            F.lit("insert").alias("change_type"), *cols
        )
        s, o = source.alias("s"), old.alias("o")
        differs = None
        for c in val_cols:
            p = ~F.col(f"s.{c}").eqNullSafe(F.col(f"o.{c}"))
            differs = p if differs is None else (differs | p)
        if differs is None:
            # key-only schema (ADVICE r15 #2): a source row holding nothing
            # but the key can never differ from its matched target row, so
            # the upsert's only possible changes are inserts — emitting the
            # unfiltered matches as "update" rows would diverge from the
            # snapshot-diff ground truth, which records nothing for them.
            return inserts
        updates = s.join(
            o, F.col(f"s.{key}") == F.col(f"o.{key}"), "inner"
        ).filter(differs)
        updates = updates.select(
            F.lit("update").alias("change_type"),
            *[F.col(f"s.{c}").alias(c) for c in cols],
        )
        return inserts.unionByName(updates)

    def merge(
        self,
        source: DataFrame,
        key: str,
        max_retries: int = 3,
        _test_hook=None,
    ) -> int:
        """MERGE (upsert) as a transaction: read the current snapshot, apply
        the relational upsert, commit as the next version. On a concurrency
        conflict, rebase on the winner's snapshot and retry — the optimistic
        loop every log-based table format runs.

        When the table carries footer stats on the merge key, only files
        whose [min, max] intersects a source key are rewritten; all other
        files are carried into the new manifest BY REFERENCE (VERDICT r2
        "What's wrong" #3 — a 0.1%-of-rows merge no longer rewrites 100% of
        the table). Correctness: every file holding a source key is in the
        touched set (stats ranges are conservative), so matching inside the
        touched subset equals matching inside the whole table, and source
        rows with no match anywhere insert exactly once.

        Refuses (PendingGroupConflict) while a prepared group transaction
        holds a slot above the visible head: basing on the visible snapshot
        but committing above the claimed slot would silently discard the
        group's update to this member if the group later commits — the
        lost-update hazard the streaming sink already refuses (ADVICE r6).
        Retry after the group resolves; failed prepares self-abort."""
        from ..operators.merge import merge_upsert

        for _ in range(max_retries + 1):
            pending = self.pending_slots()
            if pending:
                raise PendingGroupConflict(
                    f"in-flight group transaction holds slot(s) {pending} at "
                    f"{self.path}: merge would shadow the group's update to "
                    "this member; retry after it commits or aborts"
                )
            base_v = self.latest_visible_version()
            slot = self.latest_version() + 1  # aborted slots stay claimed
            m = self.manifest(base_v)
            split = self._touched_files(m, source, key)
            if split is None:
                rewrite = self.read(base_v)
                carry: list[tuple[str, dict | None]] = []
                stats_key = m.get("stats_key")
            else:
                touched, untouched = split
                if touched:
                    rewrite = self.spark.read.parquet(
                        *[self._abs(rel) for rel in touched]
                    )
                else:
                    rewrite = self.spark.createDataFrame([], m["schema_ddl"])
                carry = [(rel, m["stats"].get(rel)) for rel in untouched]
                stats_key = key
            merged = merge_upsert(rewrite, source, key)
            changes = None
            extra = None
            if m.get("change_feed"):
                # write-time CDF (VERDICT r14 #5): the change rows come
                # from the SAME pruned pre-image the merge itself reads,
                # so recording costs one extra pass over touched files +
                # source — never a second full-table scan. (Delta computes
                # both outputs in one job; two jobs keep this emulation
                # readable at the cost of re-scanning the touched subset.)
                changes = self._merge_changes(rewrite, source, key)
                extra = {"change_feed": True}
            if _test_hook is not None:
                _test_hook()  # test seam: interleave a competing commit here
            try:
                return self._commit(
                    _optimized_write(merged),
                    slot,
                    f"MERGE key={key}",
                    stats_key=stats_key,
                    carry=carry,
                    extra=extra,
                    changes=None if changes is None else _optimized_write(changes),
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up after {max_retries} rebases at {self.path}")

    def delete_range(
        self, key: str, lo: int, hi: int, max_retries: int = 3
    ) -> int:
        """DELETE WHERE ``key BETWEEN lo AND hi`` as a transaction.

        The same footer-stats skipping as :meth:`merge`: only files whose
        [min, max] intersects the delete range are rewritten (minus their
        matching rows); every other file is carried into the new manifest
        by reference. A range predicate against range stats is exact
        pruning — a file whose range misses [lo, hi] provably holds no
        matching row. Falls back to a full rewrite when stats are absent,
        same as merge (safe, not wrong). Refuses over a prepared group
        slot exactly like :meth:`merge` (PendingGroupConflict)."""
        from pyspark.sql import functions as F

        for _ in range(max_retries + 1):
            pending = self.pending_slots()
            if pending:
                raise PendingGroupConflict(
                    f"in-flight group transaction holds slot(s) {pending} at "
                    f"{self.path}: delete would shadow the group's update to "
                    "this member; retry after it commits or aborts"
                )
            base_v = self.latest_visible_version()
            slot = self.latest_version() + 1
            m = self.manifest(base_v)
            stats_key = m.get("stats_key")
            stats = m.get("stats") or {}
            files = m["files"]
            usable = (
                stats_key == key
                and all(stats.get(rel) for rel in files)
                and not m.get("dvs")  # see _touched_files: raw-file reads
                # would resurrect DV-deleted rows
            )
            if usable:
                touched = [
                    rel
                    for rel in files
                    if stats[rel]["min"] <= hi and stats[rel]["max"] >= lo
                ]
                untouched = set(files) - set(touched)
                carry = [(rel, stats.get(rel)) for rel in files if rel in untouched]
                if touched:
                    rewrite = self.spark.read.parquet(
                        *[self._abs(rel) for rel in touched]
                    )
                else:
                    rewrite = self.spark.createDataFrame([], m["schema_ddl"])
            else:
                rewrite = self.read(base_v)
                carry = []
            kept = rewrite.filter(~F.col(key).between(lo, hi))
            changes = None
            extra = None
            if m.get("change_feed"):
                # deleted rows are exactly the predicate's matches inside
                # the touched files (range-vs-range pruning is exact, so
                # untouched files provably contribute none)
                changes = rewrite.filter(F.col(key).between(lo, hi)).select(
                    F.lit("delete").alias("change_type"), *rewrite.columns
                )
                extra = {"change_feed": True}
            try:
                return self._commit(
                    _optimized_write(kept),
                    slot,
                    f"DELETE {key} IN [{lo}, {hi}]",
                    stats_key=stats_key,
                    carry=carry,
                    extra=extra,
                    changes=None if changes is None else _optimized_write(changes),
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up after {max_retries} rebases at {self.path}")

    def delete_range_dv(
        self, key: str, lo: int, hi: int, max_retries: int = 3
    ) -> int:
        """DELETE WHERE ``key BETWEEN lo AND hi`` as a MERGE-ON-READ
        transaction: instead of rewriting data files (:meth:`delete_range`,
        copy-on-write), commit a DELETION-VECTOR sidecar — the set of
        (file_name, row_index) positions the predicate hits — and leave
        every data file untouched (Delta deletion vectors / Iceberg
        position deletes). :meth:`read` subtracts the positions via a
        broadcast anti-join; the next data-rewriting commit (merge /
        delete_range / optimize) reads through the DVs and publishes a
        DV-free manifest, which is exactly Delta's DV-compaction cadence.

        The trade this implements: a delete costs O(matching rows) instead
        of O(files touched × file size) — at 100 TB a GDPR-style scattered
        delete rewrites nothing — paid for by one tiny anti-join per read
        until the next compaction. Positions come from the scan-time
        ``_metadata.row_index`` column, so no row-id column pollutes the
        schema. Footer stats still bound WHICH files are scanned for
        positions. Refuses over pending group slots like every writer."""
        from pyspark.sql import functions as F

        for _ in range(max_retries + 1):
            pending = self.pending_slots()
            if pending:
                raise PendingGroupConflict(
                    f"in-flight group transaction holds slot(s) {pending} at "
                    f"{self.path}: DV delete would shadow the group's update "
                    "to this member; retry after it commits or aborts"
                )
            base_v = self.latest_visible_version()
            slot = self.latest_version() + 1
            m = self.manifest(base_v)
            self._refuse_pending(f"DELETE DV {key} IN [{lo}, {hi}]")
            stats = m.get("stats") or {}
            files = m["files"]
            if m.get("stats_key") == key and all(stats.get(rel) for rel in files):
                probe = [
                    rel
                    for rel in files
                    if stats[rel]["min"] <= hi and stats[rel]["max"] >= lo
                ]
            else:
                probe = list(files)
            dv_rels: list[str] = []
            if probe:
                dv_df = (
                    self.spark.read.parquet(*[self._abs(rel) for rel in probe])
                    .select(
                        F.col("_metadata.file_name").alias("file_name"),
                        F.col("_metadata.row_index").alias("row_index"),
                        F.col(key).alias("_k"),
                    )
                    .filter(F.col("_k").between(lo, hi))
                    .select("file_name", "row_index")
                )
                token = uuid.uuid4().hex[:12]
                rel_dir = os.path.join(_DATA_DIR, f"v{slot}-{token}")
                dv_df.write.mode("error").parquet(os.path.join(self.path, rel_dir))
                dv_rels = [
                    os.path.join(rel_dir, name)
                    for name in sorted(
                        os.listdir(os.path.join(self.path, rel_dir))
                    )
                    if name.endswith(".parquet")
                ]
            manifest = {
                "version": slot,
                "op": f"DELETE DV {key} IN [{lo}, {hi}]",
                "files": list(files),
                "schema_ddl": m["schema_ddl"],
                "dvs": list(m.get("dvs") or []) + dv_rels,
            }
            if m.get("change_feed"):
                # MoR delete still records its change rows eagerly: the
                # probe scan already materializes the matching rows, so
                # the change file is the same filter minus the _metadata
                # columns (a feed reader must never need to apply DVs).
                # Rows an EARLIER DV already removed must not re-record —
                # the raw probe read resurrects them, so subtract existing
                # DV positions first (deleted-rows-sized broadcast, same
                # device as read()).
                change_rels: list[str] = []
                if probe:
                    src = self.spark.read.parquet(
                        *[self._abs(rel) for rel in probe]
                    )
                    data_cols = src.columns
                    src = src.select(
                        F.col("_metadata.file_name").alias("_cf_file"),
                        F.col("_metadata.row_index").alias("_cf_pos"),
                        "*",
                    ).filter(F.col(key).between(lo, hi))
                    prior = m.get("dvs") or []
                    if prior:
                        dv_old = (
                            self.spark.read.parquet(
                                *[self._abs(rel) for rel in prior]
                            )
                            .select("file_name", "row_index")
                            .distinct()
                        )
                        src = src.join(
                            F.broadcast(dv_old),
                            (src["_cf_file"] == dv_old["file_name"])
                            & (src["_cf_pos"] == dv_old["row_index"]),
                            "left_anti",
                        )
                    deleted = src.select(
                        F.lit("delete").alias("change_type"), *data_cols
                    )
                    change_rels = self._stage(deleted, slot, "-changes")
                manifest["change_feed"] = True
                manifest["changes"] = change_rels
            if "stats_key" in m:
                manifest["stats_key"] = m["stats_key"]
                manifest["stats"] = dict(stats)
            try:
                self._publish(manifest)
                return slot
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up after {max_retries} rebases at {self.path}")

    def restore(self, version: int, max_retries: int = 3) -> int:
        """RESTORE: make an old snapshot the new head — a metadata-only
        commit whose manifest re-references ``version``'s exact files
        (Delta's RESTORE TABLE ... TO VERSION). History stays append-only
        and auditable: the bad intermediate versions remain readable via
        time travel; nothing is rewritten or deleted (VACUUM retention
        governs their files separately).

        Guards (matching Delta's RESTORE errors): the target must be a
        VISIBLE version (re-heading onto an uncommitted group prepare is
        refused) and every referenced file must still exist — restoring
        past a VACUUM would otherwise corrupt the head silently. Slot
        conflicts rebase-retry like every other write path."""
        m = self.manifest(version)
        if not self._is_visible(m):
            raise ValueError(
                f"cannot restore v{version}: pending group transaction"
            )
        missing = [
            rel
            for rel in [*m["files"], *(m.get("dvs") or [])]
            if not os.path.exists(self._abs(rel))
        ]
        if missing:
            raise FileNotFoundError(
                f"cannot restore v{version}: {len(missing)} file(s) vacuumed,"
                f" e.g. {missing[0]}"
            )
        for _ in range(max_retries + 1):
            # RESTORE publishes without _commit's staging path, so it makes
            # its own pending-slot refusal: re-heading above a prepared
            # group slot would shadow the group exactly like a data write
            self._refuse_pending(f"RESTORE v{version}")
            manifest = {
                "version": self.latest_version() + 1,
                "op": f"RESTORE v{version}",
                "files": list(m["files"]),
                "schema_ddl": m["schema_ddl"],
            }
            if m.get("dvs"):
                manifest["dvs"] = list(m["dvs"])
            if m.get("change_feed"):
                # the property survives a RESTORE, but the restore commit
                # itself records NO change file (its logical delta is
                # old-head vs target, not something a write computed) —
                # feed readers fall back to the snapshot diff for it
                manifest["change_feed"] = True
            if "stats_key" in m:
                manifest["stats_key"] = m["stats_key"]
                manifest["stats"] = dict(m.get("stats") or {})
            try:
                self._publish(manifest)
                return manifest["version"]
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up restoring v{version} at {self.path}")

    def _noop_change_extra(self, base_manifest: dict) -> dict | None:
        """Manifest fields for a commit that changes NO logical content
        (OPTIMIZE) on a change-feed table: an explicit empty ``changes``
        list, so the feed reader knows "recorded, zero changes" and never
        falls back to a pointless snapshot diff of a compaction."""
        if not base_manifest.get("change_feed"):
            return None
        return {"change_feed": True, "changes": []}

    def optimize(self, target_files: int = 1) -> int:
        """Compaction: same logical content, fewer files, new version."""
        v = self.latest_visible_version()
        m = self.manifest(v)
        return self._commit(
            self.read(v).coalesce(target_files),
            self.latest_version() + 1,
            f"OPTIMIZE n={target_files}",
            stats_key=m.get("stats_key"),
            extra=self._noop_change_extra(m),
        )

    def optimize_clustered(self, key: str, target_files: int = 8) -> int:
        """Layout OPTIMIZE: rewrite the snapshot range-partitioned and
        sorted on ``key`` — Delta's OPTIMIZE ZORDER / liquid clustering
        reduced to its one-dimension essence. Same logical content, but
        every new file covers a DISJOINT key range, so the manifest's
        per-file [min, max] stats (the same ones file-pruned MERGE reads)
        let a range query touch only the files its range intersects
        instead of all of them. At 100 TB this is the difference between
        a point lookup scanning the table and scanning one file; the
        rewrite costs one range shuffle, paid once per OPTIMIZE cadence."""
        from pyspark.sql import functions as F

        v = self.latest_visible_version()
        clustered = (
            self.read(v)
            .repartitionByRange(target_files, F.col(key))
            .sortWithinPartitions(key)
        )
        return self._commit(
            clustered,
            self.latest_version() + 1,
            f"OPTIMIZE CLUSTERED BY {key} n={target_files}",
            stats_key=key,
            extra=self._noop_change_extra(self.manifest(v)),
        )

    def files_touched_by_range(self, key: str, lo: int, hi: int) -> tuple[int, int]:
        """(files whose [min, max] stats intersect [lo, hi], total files)
        for the latest visible snapshot — the manifest-only pruning probe
        behind delete_range/merge, exposed for layout diagnostics. Files
        without usable stats count as touched (safe, not wrong)."""
        m = self.manifest(self.latest_visible_version())
        stats = m.get("stats") or {}
        files = m["files"]
        touched = sum(
            1
            for rel in files
            if m.get("stats_key") != key
            or not stats.get(rel)
            or (stats[rel]["min"] <= hi and stats[rel]["max"] >= lo)
        )
        return touched, len(files)

    def vacuum(self, keep_latest: int = 1, grace_seconds: float = 600.0) -> dict:
        """Physically delete data files referenced ONLY by versions older
        than the ``keep_latest`` most recent — Delta's VACUUM with a
        version-count retention instead of a wall-clock one (deterministic
        for tests; production retention is just a different predicate over
        the same manifest scan).

        Safety argument, same as Delta's: data files are immutable and a
        manifest pins an exact file list, so the set "files referenced by
        any retained version" is computable from the (tiny) log alone;
        anything outside it can never be read again through a retained
        snapshot. Readers of retained versions are unaffected mid-vacuum
        because deletion only touches unreferenced files. Manifests of
        vacuumed versions stay in the log (history stays auditable) but
        their reads fail once their files are gone — exactly Delta's
        behavior past the retention window.

        ``grace_seconds`` protects CONCURRENTLY-STAGING writers: a file no
        manifest has ever referenced is either a live in-flight stage or
        debris from a lost slot race — and the version token alone cannot
        tell them apart (a competitor can publish the same slot number
        while the loser is still mid-write, review r7), so unreferenced
        files younger than the grace window are always skipped (Delta's
        retention-age guard applied to stages). Files some manifest DOES
        reference were fully published — age is irrelevant for them, so
        aborted-group and expired-snapshot files reclaim immediately and
        the deterministic tests stay deterministic.

        The grace comparison runs entirely in the FILESYSTEM's clock
        domain (ADVICE r7): "now" is the mtime of a probe file written at
        vacuum start, not the local wall clock — on NFS or between
        containers the vacuuming host's clock can run ahead of the clock
        that stamped a concurrent writer's stage files, which would make
        a freshly staged file look older than ``grace_seconds`` and get
        deleted. Comparing an FS-stamped mtime against another FS-stamped
        mtime removes the local clock from the decision; if the probe
        cannot be written the local clock is the (documented, same-host
        only) fallback.

        Returns {"n_deleted", "n_kept", "bytes_deleted"}."""
        import time as _time
        import uuid as _uuid

        manifests = {v: self.manifest(v) for v in self.versions()}
        visible = [v for v, m in manifests.items() if self._is_visible(m)]
        retained = set(visible[-keep_latest:])
        latest_slot = max(manifests) if manifests else -1
        keep: set[str] = set()
        referenced: set[str] = set()
        for v, m in manifests.items():
            # retained visible snapshots, plus every PENDING group version:
            # a prepared-but-unresolved transaction may still commit.
            # ABORTED versions are dead (their group record says so) and
            # their files ARE reclaimable — without this, one failed
            # prepare would pin its staged files forever (ADVICE r6).
            # DV sidecars and CHANGE files are table state exactly like
            # data files: unretained ones are reclaimable, retained ones
            # must survive. (Reclaiming an old commit's change file bounds
            # the feed by the retention window — Delta's CDF behaves the
            # same way past its retention.)
            referenced.update(m["files"])
            referenced.update(m.get("dvs") or [])
            referenced.update(m.get("changes") or [])
            if v in retained or self._group_state(m) == "pending":
                keep.update(m["files"])
                keep.update(m.get("dvs") or [])
                keep.update(m.get("changes") or [])
        n_deleted = 0
        bytes_deleted = 0
        # fs-clock "now" (see docstring): stamp a probe next to the log
        # (outside the data dir, so the walk below never sees it) and use
        # ITS mtime as the reference the stage-file mtimes compare against
        probe = os.path.join(self.path, f".vacuum-probe-{_uuid.uuid4().hex[:12]}")
        try:
            with open(probe, "w"):
                pass
            now = os.path.getmtime(probe)
        except OSError:
            now = _time.time()  # unwritable table root: same-host fallback
        finally:
            try:
                os.remove(probe)
            except OSError:
                pass
        for root, _dirs, names in os.walk(os.path.join(self.path, _DATA_DIR)):
            # In-flight writer protection (ADVICE r6): a concurrent writer
            # stages into data/v<N>-<token>/ BEFORE publishing a manifest.
            # Dirs with N above every claimed slot are certainly live
            # stages (writers stage at latest_version()+1) — skip without
            # looking at mtimes.
            base = os.path.basename(root)
            if base.startswith("v"):
                head = base[1:].split("-", 1)[0]
                if head.isdigit() and int(head) > latest_slot:
                    continue
            for name in names:
                if not name.endswith(".parquet"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, self.path)
                if rel in keep:
                    continue
                if rel not in referenced:
                    # never published: live stage vs lost-race debris is
                    # decided by age, not slot number (see docstring)
                    try:
                        age = now - os.path.getmtime(full)
                    except OSError:
                        continue  # vanished mid-walk: its writer owns it
                    if age < grace_seconds:
                        continue
                bytes_deleted += os.path.getsize(full)
                os.remove(full)
                n_deleted += 1
        # prune now-empty staging dirs so the layout stays clean
        for root, dirs, names in list(os.walk(os.path.join(self.path, _DATA_DIR), topdown=False)):
            if not dirs and not names and os.path.basename(root) != _DATA_DIR:
                os.rmdir(root)
        return {
            "n_deleted": n_deleted,
            # count only LOCAL references: a clone's absolute refs to
            # another table's files are outside this walk and would
            # overstate kept-on-disk counts
            "n_kept": sum(1 for rel in keep if not os.path.isabs(rel)),
            "bytes_deleted": bytes_deleted,
        }
