"""Multi-table atomic transactions over TxTables (cross-table ACID).

A warehouse move — "take these rows out of table A and put them in table
B" — must be all-or-nothing across BOTH tables; two independent TxTable
commits leave a window where a reader sees the rows in neither (or both).
The group protocol closes that window with ONE atomic commit point:

    <group_root>/_txlog/<gid>.json        the group record

1. **Prepare**: each member table stages its data files and publishes a
   normal put-if-absent manifest that additionally carries
   ``pending_group: <gid>``. The version slot is claimed (concurrent
   writers conflict exactly as for single-table commits), but the version
   is NOT yet visible.
2. **Commit point**: one atomic create-exclusive of the group record.
   Readers treat a pending manifest as visible IFF its group record
   exists — so every member version becomes visible at the same instant,
   by the existence of one small immutable object.

Crash anywhere before step 2: every prepared version is invisible on
every member — readers fall back to each table's previous visible
version; neither table shows partial state (tests inject exactly this).
Crash after step 2: fully committed. This is the same shape as Delta's
multi-statement transaction log / Iceberg's multi-table catalog commit:
stage everything invisibly, then flip one conditional-put object.

Concurrent SINGLE-table writers and an in-flight group serialize on the
version slots (a pending prepare keeps its slot; later writers commit
above it, basing on the latest VISIBLE snapshot). A group that commits
after such a writer surfaces as the older version — the standard
last-writer-wins outcome optimistic logs give without a global lock;
serializing the two workloads needs the same external coordination Delta
applications use. Aborted prepares occupy version slots permanently (like any failed Delta
commit attempt's staged files) — a VACUUM-style sweep can reclaim the
data dirs of pending manifests whose group record never appeared;
readers already skip them.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from .acid import TxTable

__all__ = ["TxGroup"]

_TXLOG = "_txlog"


class TxGroup:
    """Coordinator for atomic commits spanning multiple TxTables."""

    def __init__(self, spark: SparkSession, group_root: str):
        self.spark = spark
        self.group_root = group_root

    def _record_path(self, gid: str) -> str:
        return os.path.join(self.group_root, _TXLOG, f"{gid}.json")

    def group_committed(self, gid: str) -> bool:
        return os.path.exists(self._record_path(gid))

    # -- the two-phase commit -------------------------------------------

    def prepare(self, updates: list[tuple[TxTable, DataFrame]], op: str) -> str:
        """Phase 1: claim the next version of every member with a pending
        manifest. Returns the group id; nothing is visible yet."""
        gid = uuid.uuid4().hex
        record = self._record_path(gid)
        for table, df in updates:
            v = table.latest_version() + 1
            table._commit(  # noqa: SLF001 — coordinator is package-internal
                df,
                v,
                op,
                # the manifest carries its own commit-point location, so
                # EVERY TxTable reader/writer (not just TxGroup) applies
                # the visibility rule — see TxTable._is_visible
                extra={"pending_group": gid, "group_record": record},
            )
        return gid

    def commit(self, gid: str, members: list[str]) -> None:
        """Phase 2 — THE commit point: create the group record atomically.
        After this single link exists, every member's pending version is
        visible; before it, none is."""
        log_dir = os.path.join(self.group_root, _TXLOG)
        os.makedirs(log_dir, exist_ok=True)
        final = self._record_path(gid)
        tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump({"gid": gid, "members": members}, f)
        try:
            os.link(tmp, final)  # atomic create-exclusive, as in TxTable
        except FileExistsError:
            pass  # recovery re-running the commit point: already committed
        finally:
            os.unlink(tmp)

    def transact(self, updates: list[tuple[TxTable, DataFrame]], op: str) -> str:
        gid = self.prepare(updates, op)
        self.commit(gid, [t.path for t, _ in updates])
        return gid

    # -- group-aware reads ----------------------------------------------

    def visible_version(self, table: TxTable) -> int:
        """Latest visible version — now simply TxTable's own rule, since
        manifests carry their group-record path."""
        return table.latest_visible_version()

    def read(self, table: TxTable) -> DataFrame:
        return table.read(self.visible_version(table))
