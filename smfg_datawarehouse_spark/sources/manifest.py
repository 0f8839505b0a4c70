"""Manifest-committed parquet tables — the OBJECT-STORE-safe commit
protocol (Delta/Iceberg's core idea on plain parquet).

:mod:`.lake`'s ``compact()`` swaps directories with rename — atomic
enough on a POSIX local fs, but object stores have no atomic directory
rename, and even locally a reader listing the directory mid-swap races
the writer. Table formats solve this with an indirection: data files are
IMMUTABLE and never renamed or deleted by a commit; what changes is a
tiny MANIFEST (the list of files that make up the table), and the only
mutation in the whole protocol is an atomic single-object swap of the
``CURRENT`` pointer (``os.replace`` here; a conditional PUT / ETag swap
on S3/GCS). Readers resolve CURRENT → manifest → file list once, then
read a consistent snapshot no matter what commits land meanwhile:

- ``write(df)``  — stage new files under ``data/batch-N/``, write
  ``manifest/v{N}.json`` naming (prior files +) new files, swap CURRENT.
  A crash before the swap leaves orphan files readers never see.
- ``append(df)`` — same, manifest = previous manifest's files + staged.
- ``compact()``  — rewrite the CURRENT file set into size-targeted
  files, commit a manifest naming only the new files. The OLD files
  stay on disk, so an in-flight reader of the old manifest is
  unaffected — the compaction race :func:`.lake.compact` documents is
  structurally gone.
- ``vacuum()``   — delete files referenced by NO retained manifest;
  the only destructive step, explicitly decoupled from commits.

Scale: manifests are file lists (KBs per thousand files — at true table
scale this becomes a manifest tree like Iceberg's, same protocol);
commits are O(1) driver-side metadata; data reads/writes stay fully
distributed. Reference intent: the DW load stage's transactional table
(``1. Metadata Creation.sql:133,146``), re-expressed as the commit
protocol modern lakehouse formats actually use.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def nullable_copy(schema):
    """Detached, all-nullable copy of a StructType.

    Parquet inference always yields nullable columns (Spark relaxes
    nullability on read), so a schema CACHE that declares what the writer
    handed it can flip read-side nullability vs the prior inference
    behavior — and aliasing the caller's live StructType invites the
    mutation bugs ``StructType.add`` makes easy. Normalizing on store
    keeps declared reads bit-identical to inference. Applied recursively:
    the reader relaxes nested struct/array/map nullability too."""
    from pyspark.sql.types import StructType

    def relax(node):
        if isinstance(node, dict):
            return {
                k: True
                if k in ("nullable", "containsNull", "valueContainsNull")
                else relax(v)
                for k, v in node.items()
            }
        if isinstance(node, list):
            return [relax(v) for v in node]
        return node

    return StructType.fromJson(relax(schema.jsonValue()))


class CommitConflict(RuntimeError):
    """Another writer moved CURRENT since this commit's base snapshot."""


class ManifestTable:
    """Parquet table with manifest commits and snapshot-isolated reads."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, "manifest"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        # Schema cache (r9 optimization — the Iceberg "schema lives in
        # table metadata" posture): every _stage records the staged
        # DataFrame's schema; snapshot reads then declare it instead of
        # re-running parquet footer inference per read (~50-200 ms of
        # driver work per call, several reads per lifecycle cert). If
        # two stages ever disagree (schema evolution), the cache
        # DISABLES itself and reads fall back to inference — behavior
        # identical to before. The cache is metadata only: every read
        # still scans the data files.
        self._schema = None
        self._schema_mixed = False

    # -- commit protocol ---------------------------------------------------

    def _current_path(self) -> str:
        return os.path.join(self.path, "manifest", "CURRENT")

    def current_version(self) -> int | None:
        try:
            with open(self._current_path()) as fh:
                return int(json.load(fh)["version"])
        except (OSError, ValueError, KeyError):
            return None

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, "manifest", f"v{version}.json")

    def manifest(self, version: int | None = None) -> list[str]:
        """File list (relative paths) of a committed snapshot."""
        v = self.current_version() if version is None else version
        if v is None:
            return []
        with open(self._manifest_path(v)) as fh:
            return json.load(fh)["files"]

    def _commit(
        self,
        files: list[str],
        expected_version: int | None = None,
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Write manifest v{N+1} then atomically swap CURRENT to it.

        The swap is the ONLY mutation of shared state: ``os.replace`` is
        atomic on POSIX (object stores: conditional PUT). Everything
        before it is invisible to readers; a crash at any point leaves
        the previous snapshot intact and readable.

        ``expected_version`` makes the commit CONDITIONAL (optimistic
        concurrency): raise :class:`CommitConflict` instead of publishing
        when CURRENT no longer points at the version this commit's file
        list was derived from. On an object store the check-and-swap is
        one conditional PUT (If-Match on CURRENT's ETag); the local twin
        checks then replaces, which is race-free for the single-driver
        certification and documents the contract.

        ``txn=(writer_id, batch_id)`` rides INSIDE the manifest json as a
        cumulative per-writer high-water map, so an idempotent-append
        marker and the file list it guards are published by the SAME
        atomic swap — there is no window where the files are committed
        but the transaction marker is not (Delta's txnAppId/txnVersion
        shape). The map is copied forward on every commit, so it
        survives :meth:`vacuum` dropping old manifests."""
        if expected_version is not None:
            cur = self.current_version() or 0
            if cur != expected_version:
                raise CommitConflict(
                    f"commit based on v{expected_version}, CURRENT is v{cur}"
                )
        txns = self.txns()
        if txn is not None:
            txns[txn[0]] = int(txn[1])
        v = (self.current_version() or 0) + 1
        with open(self._manifest_path(v), "w") as fh:
            json.dump({"version": v, "files": sorted(files), "txns": txns}, fh)
        tmp = self._current_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": v}, fh)
        os.replace(tmp, self._current_path())
        return v

    def txns(self, version: int | None = None) -> dict[str, int]:
        """Per-writer committed-batch high-water map of a snapshot (the
        idempotence state :func:`append_once` checks). Atomic with the
        file list: both live in the same manifest json."""
        v = self.current_version() if version is None else version
        if v is None:
            return {}
        with open(self._manifest_path(v)) as fh:
            return {k: int(x) for k, x in json.load(fh).get("txns", {}).items()}

    def _next_batch(self) -> int:
        """Allocate a batch number past EVERY existing data dir — version
        counters don't work here: a WAP-staged (uncommitted) batch or a
        concurrent writer's staging dir would collide with a
        version-derived number and be silently overwritten."""
        data_root = os.path.join(self.path, "data")
        existing = [
            int(d.split("-", 1)[1])
            for d in os.listdir(data_root)
            if d.startswith("batch-") and d.split("-", 1)[1].isdigit()
        ]
        return max(existing, default=0) + 1

    def _stage(self, df: DataFrame, batch: int) -> list[str]:
        """Write df's files under data/batch-{batch}/ (immutable once
        committed); return their table-relative paths."""
        rel = os.path.join("data", f"batch-{batch}")
        out = os.path.join(self.path, rel)
        df.write.mode("overwrite").parquet(out)
        staged = nullable_copy(df.schema)
        if self._schema is None and not self._schema_mixed:
            self._schema = staged
        elif self._schema is not None and staged != self._schema:
            self._schema, self._schema_mixed = None, True
        return [
            os.path.join(rel, f)
            for f in os.listdir(out)
            if f.endswith(".parquet")
        ]

    def _read_files(self, files: list[str]) -> DataFrame:
        """Read exactly ``files``, declaring the cached schema when every
        staged batch agreed on one (skips per-read footer inference)."""
        paths = [os.path.join(self.path, f) for f in files]
        if self._schema is not None:
            return self.spark.read.schema(self._schema).parquet(*paths)
        return self.spark.read.parquet(*paths)

    # -- table operations --------------------------------------------------

    def write(self, df: DataFrame) -> int:
        """Replace the table content (manifest = the staged files only)."""
        return self._commit(self._stage(df, self._next_batch()))

    def append(self, df: DataFrame, txn: tuple[str, int] | None = None) -> int:
        """Append (manifest = previous files + staged files). ``txn``
        publishes an idempotent-append marker in the same atomic swap."""
        prior = self.manifest()
        return self._commit(
            prior + self._stage(df, self._next_batch()), txn=txn
        )

    def append_optimistic(
        self, df: DataFrame, max_retries: int = 3
    ) -> tuple[int, int]:
        """Append under OPTIMISTIC CONCURRENCY CONTROL — the Delta/Iceberg
        multi-writer protocol: stage files once (immutable, invisible),
        then try to commit ``base-manifest + staged`` conditionally on
        CURRENT still being the base version. On :class:`CommitConflict`
        (another writer won the race) re-resolve the NEW current manifest
        and retry with the same staged files — appends commute on the
        file level, so a rebase is just re-reading the prior file list;
        no data is rewritten. Returns ``(version, n_conflicts)``.

        This is why manifest tables scale to many concurrent writers:
        the data plane (staging) is fully parallel and conflict-free;
        only the O(1) pointer swap serializes."""
        staged = self.stage(df)
        for attempt in range(max_retries + 1):
            base = self.current_version() or 0
            prior = self.manifest(base) if base else []
            try:
                return self._commit(
                    prior + staged, expected_version=base
                ), attempt
            except CommitConflict:
                if attempt == max_retries:
                    raise
        raise AssertionError("unreachable")

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read: resolve a manifest once, read exactly its files.
        Immune to concurrent commits (their files are disjoint) and to
        compaction (old files persist until vacuum)."""
        files = self.manifest(version)
        if not files:
            raise FileNotFoundError(f"no committed snapshot in {self.path}")
        return self._read_files(files)

    def compact(self, target_file_bytes: int = 256 * 1024 * 1024) -> int:
        """Rewrite the current file set into size-targeted files and
        commit a manifest of ONLY the new files. Old files remain on disk
        for in-flight readers; space is reclaimed by :meth:`vacuum`."""
        files = self.manifest()
        total = sum(
            os.path.getsize(os.path.join(self.path, f)) for f in files
        )
        n_files = max(1, total // target_file_bytes)
        df = self.read().coalesce(int(n_files))
        return self._commit(self._stage(df, self._next_batch()))

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Delete data files referenced by none of the last ``keep_last``
        manifests (and drop older manifests). Returns removed rel-paths.
        The only destructive operation; runs strictly AFTER commits, so a
        reader that resolved a retained manifest never loses a file."""
        cur = self.current_version()
        if cur is None:
            return []
        keep_versions = [v for v in range(cur - keep_last + 1, cur + 1) if v >= 1]
        referenced: set[str] = set()
        for v in keep_versions:
            referenced.update(self.manifest(v))
        removed = []
        data_root = os.path.join(self.path, "data")
        for sub in sorted(os.listdir(data_root)):
            subdir = os.path.join(data_root, sub)
            for f in sorted(os.listdir(subdir)):
                rel = os.path.join("data", sub, f)
                if f.endswith(".parquet") and rel not in referenced:
                    os.remove(os.path.join(self.path, rel))
                    removed.append(rel)
            if not any(fn.endswith(".parquet") for fn in os.listdir(subdir)):
                # only marker/_SUCCESS debris left — drop the batch dir
                import shutil

                shutil.rmtree(subdir)
        for name in os.listdir(os.path.join(self.path, "manifest")):
            if name.startswith("v") and name.endswith(".json"):
                v = int(name[1:-5])
                if v not in keep_versions:
                    os.remove(os.path.join(self.path, "manifest", name))
        return removed

    # -- write-audit-publish (WAP) ------------------------------------------

    def stage(self, df: DataFrame) -> list[str]:
        """WAP step 1: write a batch's files WITHOUT publishing. The files
        exist on disk but no manifest references them — invisible to every
        reader until :meth:`publish_append`. Batch numbers are allocated
        past any existing dir, so staged-but-never-published batches can't
        collide with later commits."""
        return self._stage(df, self._next_batch())

    def read_staged(self, files: list[str]) -> DataFrame:
        """WAP step 2 input: read EXACTLY a staged file set (for audits)."""
        return self._read_files(files)

    def publish_append(self, files: list[str]) -> int:
        """WAP step 3: append the audited staged files to the table in one
        atomic manifest swap. A batch that never reaches this call costs
        nothing to roll back — vacuum reclaims its files eventually."""
        return self._commit(self.manifest() + files)

    def publish_replace(self, files: list[str]) -> int:
        """Commit a manifest of EXACTLY ``files`` (retention/TTL shape:
        dropping a file group is a pointer move, not a delete — expired
        files stay on disk for in-flight readers until vacuum)."""
        return self._commit(list(files))


class MultiTableCatalog:
    """ATOMIC MULTI-TABLE snapshots — the capability single-table commit
    protocols (Delta, classic Iceberg) lack: a catalog-level pointer maps
    every table name to a pinned manifest version, and a transaction
    touching N tables becomes N per-table commits (invisible to catalog
    readers) followed by ONE atomic swap of the catalog pointer. A crash
    after some table commits but before the catalog swap leaves readers
    on the previous CONSISTENT version set — table-level pointers may run
    ahead, but the catalog never exposes a torn multi-table state. This
    is the fact/detail-consistency guarantee a warehouse load of
    orders+lineitem needs (reference: the multi-table curated load of
    SMFG_DW_ETL_DAG's table list, made transactional)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, "catalog"), exist_ok=True)
        self._tables: dict[str, ManifestTable] = {}

    def table(self, name: str) -> ManifestTable:
        if name not in self._tables:
            self._tables[name] = ManifestTable(
                self.spark, os.path.join(self.path, "tables", name)
            )
        return self._tables[name]

    def _current_path(self) -> str:
        return os.path.join(self.path, "catalog", "CURRENT")

    def current(self) -> dict[str, int] | None:
        try:
            with open(self._current_path()) as fh:
                doc = json.load(fh)
            return {k: int(v) for k, v in doc["tables"].items()}
        except (OSError, ValueError, KeyError):
            return None

    def transaction(self, writes: dict[str, DataFrame], mode: str = "append") -> dict[str, int]:
        """Commit all ``writes`` atomically AT THE CATALOG LEVEL: each
        table stages+publishes its own version first (catalog readers
        keep resolving the old pinned set), then one ``os.replace`` swaps
        the catalog pointer to the new version map. Tables absent from
        ``writes`` keep their pinned version."""
        pinned = dict(self.current() or {})
        # Per-table commits are independent until the swap: run them
        # concurrently (FAIR scheduler overlaps the write jobs — the same
        # posture a cluster load uses). The catalog pointer moves only
        # after EVERY table committed, so a failure in any write leaves
        # readers on the old pinned set with at worst a run-ahead
        # table-level pointer — exactly the torn-write crash window the
        # protocol tolerates by design.
        from concurrent.futures import ThreadPoolExecutor

        def _commit(item):
            name, df = item
            mt = self.table(name)
            return name, (mt.append(df) if mode == "append" else mt.write(df))

        with ThreadPoolExecutor(max_workers=max(1, len(writes))) as pool:
            pinned.update(dict(pool.map(_commit, writes.items())))
        tmp = self._current_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"tables": pinned}, fh)
        os.replace(tmp, self._current_path())
        return pinned

    def read(self, name: str) -> DataFrame:
        """Snapshot read at the CATALOG-pinned version (never the table's
        own, possibly-further-ahead pointer)."""
        pinned = self.current()
        if pinned is None or name not in pinned:
            raise FileNotFoundError(f"{name} not in any committed catalog snapshot")
        return self.table(name).read(version=pinned[name])


def shallow_clone(source: ManifestTable, dest_path: str) -> ManifestTable:
    """ZERO-COPY table clone (Delta SHALLOW CLONE shape): the clone's first
    manifest references the SOURCE's committed data files by relative
    path — no bytes move — and the clone diverges on its own writes
    (copy-on-write at commit granularity: new files land under the
    clone's data dir; the source never sees them). The clone's vacuum
    walks only its OWN data dir, so it can never reclaim source bytes;
    dropping a clone is rmdir. At 100 TB a dev/test clone is O(manifest)
    — this is why manifest-pointer tables make experimentation free."""
    dest = ManifestTable(source.spark, dest_path)
    files = source.manifest()
    if not files:
        raise FileNotFoundError(f"no committed snapshot to clone in {source.path}")
    rebased = [
        os.path.relpath(os.path.join(source.path, f), dest.path) for f in files
    ]
    dest._commit(rebased)
    return dest


class ManifestTree:
    """TWO-LEVEL manifest (Iceberg's manifest-list shape) — how commit
    metadata itself scales past the flat file list :class:`ManifestTable`
    uses: each committed batch writes a BRANCH manifest (its file list +
    min/max stats of a chosen prune column), and the root manifest is a
    list of branch manifests with their stats. A reader with a predicate
    on the prune column loads the O(1) root, PRUNES whole branches whose
    [min, max] cannot match, and only then opens the surviving branch
    manifests — file listing cost scales with matching data, not table
    history. At 100 TB with daily commits, a one-day probe opens one
    branch manifest instead of 10⁵ file entries.

    Commit protocol is unchanged from :class:`ManifestTable`: branch
    manifests and data files are immutable once written; the only shared
    mutation is the atomic CURRENT swap of the root pointer.
    """

    def __init__(self, spark: SparkSession, path: str, prune_col: str):
        self.spark = spark
        self.path = path
        self.prune_col = prune_col
        os.makedirs(os.path.join(path, "manifest"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        self._table = ManifestTable(spark, path)  # reuse staging + swap

    def _root_path(self) -> str:
        return os.path.join(self.path, "manifest", "ROOT")

    def _root(self) -> list[dict]:
        try:
            with open(self._root_path()) as fh:
                return json.load(fh)["branches"]
        except (OSError, ValueError, KeyError):
            return []

    @staticmethod
    def _enc(v):
        """Order-preserving JSON encoding of a prune-column value:
        numbers and strings stay NATIVE (numeric stats compared
        numerically — ``str()`` storage made '9' > '11' and pruned a
        matching branch), date/datetime become ISO-8601 strings
        (zero-padded, so lexicographic == chronological). Probe bounds
        go through the same encoder, so stored and probed values always
        compare in the column's own order."""
        import datetime as _dt
        import decimal as _dec

        if isinstance(v, bool) or v is None:
            return v
        if isinstance(v, (int, float)):
            return v
        if isinstance(v, _dec.Decimal):
            return float(v)
        if isinstance(v, (_dt.datetime, _dt.date)):
            return v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()
        return str(v)

    def append(self, df: DataFrame) -> dict:
        """Stage the batch, write its branch manifest (files + prune-col
        min/max computed from the STAGED data — one footer-sized agg),
        atomically swap a new root listing all branches."""
        from pyspark.sql import functions as F

        files = self._table.stage(df)
        staged = self._table.read_staged(files)
        lo, hi = staged.agg(
            F.min(self.prune_col), F.max(self.prune_col)
        ).first()
        branch_id = len(self._root()) + 1
        branch = {
            "branch": f"b{branch_id}.json",
            "min": self._enc(lo),
            "max": self._enc(hi),
            "n_files": len(files),
        }
        with open(os.path.join(self.path, "manifest", branch["branch"]), "w") as fh:
            json.dump({"files": sorted(files)}, fh)
        tmp = self._root_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"branches": self._root() + [branch]}, fh)
        os.replace(tmp, self._root_path())
        return branch

    def read_pruned(self, lo, hi) -> tuple[DataFrame, int, int]:
        """Snapshot read of rows whose prune column may lie in [lo, hi]:
        branch-level stats pruning first, file reads only from surviving
        branches. Returns (df, branches_total, branches_opened) so a
        certification can RAISE when pruning was vacuous. Branch stats
        are conservative (pruning never drops a matching row): probe
        bounds are passed through the SAME order-preserving encoder the
        stats were stored with, so numeric columns prune numerically and
        temporal columns prune on ISO order. The exact predicate is
        re-applied by the caller."""
        elo, ehi = self._enc(lo), self._enc(hi)
        branches = self._root()
        surviving = [b for b in branches if b["min"] <= ehi and b["max"] >= elo]
        files: list[str] = []
        for b in surviving:
            with open(os.path.join(self.path, "manifest", b["branch"])) as fh:
                files.extend(json.load(fh)["files"])
        if not files:
            raise FileNotFoundError("no branch overlaps the probe range")
        df = self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in files]
        )
        return df, len(branches), len(surviving)


def append_once(
    table: ManifestTable, df: DataFrame, writer_id: str, batch_id: int
) -> int | None:
    """IDEMPOTENT append — the exactly-once sink contract a streaming
    ``foreachBatch`` needs on top of at-least-once delivery (Delta's
    txnAppId/txnVersion idea): each manifest carries a per-writer
    high-water map of committed batch ids (``ManifestTable.txns``), and
    the marker for this batch is written INSIDE the same manifest json
    the commit swaps in — one atomic CURRENT swap publishes the files
    and the idempotence marker together, so there is NO window in which
    the files are committed but a redelivery of the same batch id would
    re-append. A replayed batch (same writer, batch id ≤ the snapshot's
    marker) is a NO-OP returning None; a crash before the swap leaves
    only invisible staged files the next attempt re-stages."""
    if batch_id <= table.txns().get(writer_id, -1):
        return None
    return table.append(df, txn=(writer_id, batch_id))
