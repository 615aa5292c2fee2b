"""Multi-table catalog: consistent, reproducible snapshots across tables.

A training run over transcripts rarely reads ONE table — it reads the
conversations table, the documents corpus, a token index, a near-dup
index.  Reproducing that run later needs every table pinned at the exact
snapshot it was read at, and publishing a coordinated update to N tables
needs readers to see all-or-nothing.  Single-table refs (tags, branches)
cannot express either.

``TableCatalog`` is the Nessie/LakeFS-shaped answer rebuilt on this
engine's own primitives: a catalog is a directory holding a parent-linked
chain of immutable version manifests plus an atomically-swapped VERSION
pointer (exactly the table commit pattern, reused at the catalog level).
Each catalog version maps table name → (table dir, pinned snapshot id).

* ``snapshot()`` captures every registered table at its current head —
  one new catalog version.  Readers that resolve through the catalog get
  the whole set at once; a reader of version N is immune to later table
  commits (reproducibility), and flipping VERSION is the single atomic
  publication point (all-or-nothing visibility across N tables).
* ``snapshot(pins={...})`` pins named tables at explicit refs — combined
  with per-table WAP branches this is atomic multi-table publish: stage
  N tables on audit branches, audit, then ONE catalog commit pins all N
  branch heads; catalog readers never observe a partial publish.
* Retention composes with table maintenance: every pin is protected by
  an engine tag (``cat-<catalog_id>-v<version>`` on the pinned table),
  and table expiry retains tagged snapshots with their reachable chain
  (local_snapshot.py expire_snapshots ref-retention).  Expiring catalog
  versions drops their tags, releasing the history.

Reference analog: the registry/recipe layer (``/root/reference/src/
fetchez/fetches.py`` module registry; recipes span many sources) — the
reference groups many sources into one named job; here the grouping is
versioned and time-travelable.  All driver-side metadata: no Spark job
is involved in catalog operations; reads delegate to the pinned table.
"""
from __future__ import annotations

import contextlib
import json
import os
import re
import time
import uuid
from typing import Any

from fetchez_spark.sinks.local_snapshot import LocalSnapshotSink

_NAME_RE = re.compile(r"[A-Za-z0-9._-]+")


class TableCatalog:
    """A versioned name → (table dir, pinned snapshot) mapping.

    Create with ``TableCatalog(path)`` — bootstraps an empty catalog on
    first use, loads the existing one otherwise (the catalog is durable:
    any process can open it from the dir alone).
    """

    def __init__(self, catalog_dir: str) -> None:
        self.catalog_dir = catalog_dir
        os.makedirs(os.path.join(catalog_dir, "manifests"), exist_ok=True)
        if self._version() is None:
            with self._lock():
                if self._version() is None:  # re-check under the lock
                    root = {
                        "id": "v-0000000000",
                        "version": 0,
                        "parent": None,
                        "catalog_id": uuid.uuid4().hex[:8],
                        "committed_at": time.time(),
                        "note": "catalog bootstrap",
                        "tables": {},
                    }
                    self._write_manifest(root)
                    self._set_version(root["id"])

    # ------------------------------------------------------------- plumbing
    @contextlib.contextmanager
    def _lock(self):
        import fcntl

        fd = os.open(
            os.path.join(self.catalog_dir, "COMMIT.lock"), os.O_CREAT | os.O_RDWR
        )
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def _version_path(self) -> str:
        return os.path.join(self.catalog_dir, "VERSION")

    def _version(self) -> str | None:
        try:
            with open(self._version_path()) as f:
                return f.read().strip()
        except FileNotFoundError:
            return None

    def _set_version(self, vid: str) -> None:
        tmp = self._version_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(vid)
        os.replace(tmp, self._version_path())

    def _manifest_path(self, vid: str) -> str:
        return os.path.join(self.catalog_dir, "manifests", f"{vid}.json")

    def _write_manifest(self, m: dict) -> None:
        path = self._manifest_path(m["id"])
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, path)

    def manifest(self, version: int | str | None = None) -> dict:
        """The catalog manifest for ``version`` (int version number,
        ``v-…`` id, or None = current)."""
        if version is None:
            vid = self._version()
        elif isinstance(version, int):
            vid = f"v-{version:010d}"
        else:
            vid = version
        try:
            with open(self._manifest_path(vid)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"catalog version {version!r} does not exist (expired, or "
                f"never committed); retained: {self._retained_ids()}"
            ) from None

    def _retained_ids(self) -> list[str]:
        return sorted(
            fn[:-5]
            for fn in os.listdir(os.path.join(self.catalog_dir, "manifests"))
            if fn.endswith(".json") and ".tmp." not in fn
        )

    @property
    def catalog_id(self) -> str:
        return self.manifest()["catalog_id"]

    # ------------------------------------------------------------- commits
    def _tag_name(self, version: int) -> str:
        return f"cat-{self.catalog_id}-v{version}"

    @staticmethod
    def _open_table(table_dir: str) -> LocalSnapshotSink:
        """Open a registered table for a catalog operation, refusing to
        BOOTSTRAP: the sink constructor creates an empty table in a
        missing dir, and a catalog op on a vanished dir would then
        silently pin a fresh 0-row root — loud failure instead."""
        if not os.path.exists(os.path.join(table_dir, "VERSION")):
            raise ValueError(
                f"registered table dir {table_dir!r} has no VERSION pointer "
                "(deleted, or its mount is absent); refusing to pin"
            )
        return LocalSnapshotSink(table_dir)

    def _pin_table(
        self, sink: LocalSnapshotSink, ref: str | None, tag: str
    ) -> str:
        """Resolve ``ref`` (None = current main head) on ``sink`` and tag
        the resolved snapshot so table expiry retains it.  Retries through
        the one benign race: a count-only table expire removing the head
        we just read (the fresh head is always live).  A leftover tag of
        the same name (a crash between tagging and the catalog commit —
        its version was never published, so the tag is ours to replace)
        is dropped and re-created in place."""
        last_err: Exception | None = None
        for attempt in range(5):
            sid = sink.resolve_ref(ref or "main")
            try:
                sink.create_tag(tag, sid)
                return sid
            except FileNotFoundError as e:
                if ref is not None or attempt == 4:
                    raise
                last_err = e
            except ValueError as e:
                existing = sink.tags().get(tag)
                if existing == sid:
                    return sid
                if existing is None:
                    # the name collides with a BRANCH, not a leftover tag:
                    # nothing of ours to replace, surface the real error
                    raise
                sink.drop_tag(tag)
                sink.create_tag(tag, sid)  # ours now; races excluded by lock
                return sid
        raise RuntimeError(
            f"could not pin {sink.table_dir!r}: the main head kept expiring "
            f"under us across 5 attempts (last: {last_err})"
        )

    def _commit(
        self,
        tables: dict[str, dict[str, str]],
        note: str | None,
        extra_stats: dict[str, Any] | None = None,
    ) -> dict:
        parent = self.manifest()
        ver = int(parent["version"]) + 1
        # EVERY pin of the new version gets the new version's tag —
        # including pins carried forward unchanged.  Each version is then
        # self-protecting: expiring an older catalog version drops only
        # that version's tags, never the protection of a sid a newer
        # version still references.  Carried-forward sids cannot vanish
        # mid-commit (the parent version's tags protect them until these
        # land, and catalog commits serialize under the lock); idempotent
        # when the caller already tagged an entry at this version.
        tag = self._tag_name(ver)
        for entry in tables.values():
            sink = self._open_table(entry["dir"])
            try:
                sink.create_tag(tag, entry["snapshot_id"])
            except ValueError:
                if sink.tags().get(tag) != entry["snapshot_id"]:
                    sink.drop_tag(tag)
                    sink.create_tag(tag, entry["snapshot_id"])
        m = {
            "id": f"v-{ver:010d}",
            "version": ver,
            "parent": parent["id"],
            "catalog_id": parent["catalog_id"],
            # monotone along the chain even under writer clock skew
            "committed_at": max(time.time(), float(parent["committed_at"])),
            "note": note,
            "tables": tables,
        }
        if extra_stats:
            m.update(extra_stats)
        self._write_manifest(m)
        self._set_version(m["id"])
        return m

    def register(
        self, name: str, table_dir: str, ref: str | None = None,
        note: str | None = None,
    ) -> dict:
        """Add ``name`` → ``table_dir`` to the catalog, pinned at ``ref``
        (default: the table's current main head).  Existing pins carry
        FORWARD unchanged — registering a table never moves what other
        readers see.  One catalog commit."""
        if not _NAME_RE.fullmatch(name):
            raise ValueError(f"invalid table name {name!r}")
        if not os.path.exists(os.path.join(table_dir, "VERSION")):
            raise ValueError(
                f"{table_dir!r} is not an engine table (no VERSION pointer)"
            )
        with self._lock():
            cur = self.manifest()
            if name in cur["tables"]:
                raise ValueError(
                    f"table {name!r} already registered "
                    f"(at {cur['tables'][name]['dir']}); unregister first"
                )
            ver = int(cur["version"]) + 1
            sink = self._open_table(table_dir)
            sid = self._pin_table(sink, ref, self._tag_name(ver))
            tables = dict(cur["tables"])
            tables[name] = {"dir": os.path.abspath(table_dir), "snapshot_id": sid}
            return self._commit(tables, note or f"register {name}")

    def unregister(self, name: str, note: str | None = None) -> dict:
        """Remove ``name`` going forward (older versions still resolve it)."""
        with self._lock():
            cur = self.manifest()
            if name not in cur["tables"]:
                raise ValueError(
                    f"no table {name!r} registered "
                    f"(registered: {sorted(cur['tables'])})"
                )
            tables = {k: v for k, v in cur["tables"].items() if k != name}
            return self._commit(tables, note or f"unregister {name}")

    def snapshot(
        self, note: str | None = None, pins: dict[str, str] | None = None
    ) -> dict:
        """Capture a new catalog version: every registered table re-pins
        at its current main head, except tables named in ``pins`` which
        pin at the given ref (snapshot id, tag, or branch head — branch
        heads make this atomic multi-table WAP publish).  One commit;
        catalog readers see the whole set flip at once."""
        pins = dict(pins or {})
        with self._lock():
            cur = self.manifest()
            unknown = set(pins) - set(cur["tables"])
            if unknown:
                raise ValueError(
                    f"pins name unregistered tables {sorted(unknown)} "
                    f"(registered: {sorted(cur['tables'])})"
                )
            ver = int(cur["version"]) + 1
            tag = self._tag_name(ver)
            tables: dict[str, dict[str, str]] = {}
            for name, entry in cur["tables"].items():
                sink = self._open_table(entry["dir"])
                sid = self._pin_table(sink, pins.get(name), tag)
                tables[name] = {"dir": entry["dir"], "snapshot_id": sid}
            return self._commit(tables, note, {"pins": pins} if pins else None)

    def pin(
        self, name: str, ref: str | None = None, note: str | None = None
    ) -> dict:
        """Re-pin ONE registered table at ``ref`` (default: its current
        main head), carrying every other pin forward unchanged — the
        after-a-run bookkeeping step (``snapshot()`` re-pins everything;
        ``pin()`` moves only the table the run produced)."""
        with self._lock():
            cur = self.manifest()
            if name not in cur["tables"]:
                raise ValueError(
                    f"no table {name!r} registered "
                    f"(registered: {sorted(cur['tables'])})"
                )
            ver = int(cur["version"]) + 1
            entry = cur["tables"][name]
            sink = self._open_table(entry["dir"])
            sid = self._pin_table(sink, ref, self._tag_name(ver))
            tables = dict(cur["tables"])
            tables[name] = {"dir": entry["dir"], "snapshot_id": sid}
            return self._commit(tables, note or f"pin {name}")

    def pin_tables(
        self, entries: dict[str, dict[str, Any]], note: str | None = None
    ) -> dict:
        """Register-or-re-pin SEVERAL tables in ONE catalog commit — the
        atomic publish step after a routed run (N tables produced by one
        stream must flip together for catalog readers; two ``pin()``
        calls would expose a version with one route advanced and the
        other stale).  Each entry: ``{"dir": table_dir, "ref":
        ref_or_None}`` (ref default = that table's current main head).
        Unregistered names register; a name already registered at a
        DIFFERENT dir is a loud error; other pins carry forward."""
        if not entries:
            raise ValueError("pin_tables needs at least one entry")
        with self._lock():
            cur = self.manifest()
            ver = int(cur["version"]) + 1
            tag = self._tag_name(ver)
            tables = dict(cur["tables"])
            for name in sorted(entries):
                spec = entries[name]
                if not _NAME_RE.fullmatch(name):
                    raise ValueError(f"invalid table name {name!r}")
                tdir = os.path.abspath(spec["dir"])
                prev = tables.get(name)
                if prev is not None and prev["dir"] != tdir:
                    raise ValueError(
                        f"table {name!r} already registered at a different "
                        f"dir ({prev['dir']}); unregister first"
                    )
                if not os.path.exists(os.path.join(tdir, "VERSION")):
                    raise ValueError(
                        f"{tdir!r} is not an engine table (no VERSION pointer)"
                    )
                sink = self._open_table(tdir)
                sid = self._pin_table(sink, spec.get("ref"), tag)
                tables[name] = {"dir": tdir, "snapshot_id": sid}
            return self._commit(
                tables, note or f"pin {sorted(entries)}"
            )

    # --------------------------------------------------------------- reads
    def _entry(self, name: str, version: int | str | None) -> dict[str, str]:
        m = self.manifest(version)
        try:
            return m["tables"][name]
        except KeyError:
            raise ValueError(
                f"no table {name!r} in catalog version {m['version']} "
                f"(has: {sorted(m['tables'])})"
            ) from None

    def table(
        self, name: str, version: int | str | None = None
    ) -> tuple[LocalSnapshotSink, str]:
        """(sink, pinned snapshot id) for ``name`` at catalog ``version``."""
        entry = self._entry(name, version)
        return self._open_table(entry["dir"]), entry["snapshot_id"]

    def read(self, spark, name: str, version: int | str | None = None, **kw):
        """Read table ``name`` pinned at catalog ``version`` (None =
        current).  ``kw`` passes through to ``LocalSnapshotSink.read``
        (bucket pruning, key hints, … all apply to the pinned state)."""
        sink, sid = self.table(name, version)
        return sink.read(spark, snapshot_id=sid, **kw)

    def versions(self, limit: int | None = None) -> list[dict[str, Any]]:
        """The retained version chain, newest first."""
        out: list[dict[str, Any]] = []
        vid: str | None = self._version()
        while vid is not None and (limit is None or len(out) < limit):
            try:
                m = self.manifest(vid)
            except ValueError:
                break  # expired past this point
            out.append(
                {
                    "version": m["version"],
                    "committed_at": m["committed_at"],
                    "note": m.get("note"),
                    "tables": {
                        k: v["snapshot_id"] for k, v in m["tables"].items()
                    },
                }
            )
            vid = m.get("parent")
        return out

    def as_of(self, ts) -> int:
        """The newest catalog version committed at-or-before ``ts``
        (epoch seconds, ISO string, or datetime) — TIMESTAMP AS OF at the
        catalog grain.  Loud error past the retained horizon."""
        target = LocalSnapshotSink._as_epoch(ts)
        vid: str | None = self._version()
        last_seen: float | None = None
        while vid is not None:
            try:
                m = self.manifest(vid)
            except ValueError:
                break
            if float(m["committed_at"]) <= target:
                return int(m["version"])
            last_seen = float(m["committed_at"])
            vid = m.get("parent")
        raise ValueError(
            f"no retained catalog version at or before {ts!r} "
            f"(oldest retained committed_at={last_seen})"
        )

    # ----------------------------------------------------------- retention
    def expire(self, keep_last: int) -> dict[str, Any]:
        """Drop catalog versions beyond the newest ``keep_last``, and
        release their table tags so table expiry can reclaim the history.
        The current chain is walked from VERSION; only manifests OFF the
        kept prefix are removed."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        dropped: list[int] = []
        released: list[str] = []
        with self._lock():
            chain: list[dict] = []
            vid: str | None = self._version()
            while vid is not None:
                try:
                    m = self.manifest(vid)
                except ValueError:
                    break
                chain.append(m)
                vid = m.get("parent")
            for m in chain[keep_last:]:
                tag = self._tag_name(int(m["version"]))
                for entry in m["tables"].values():
                    try:
                        # never bootstrap: a vanished dir has nothing to drop
                        if os.path.exists(
                            os.path.join(entry["dir"], "VERSION")
                        ):
                            self._open_table(entry["dir"]).drop_tag(tag)
                            released.append(f"{entry['dir']}:{tag}")
                    except (ValueError, FileNotFoundError, OSError):
                        pass  # tag never created (version 0) or already gone
                os.remove(self._manifest_path(m["id"]))
                dropped.append(int(m["version"]))
        return {"dropped_versions": dropped, "released_tags": released}
