"""Minimal manifest-commit table protocol over plain parquet (VERDICT r7
Next #2).

``stream_upsert_merge`` and ``maintenance_compact`` previously rewrote
their stores by deleting + renaming files inside a live directory —
correct single-writer, but a reader listing the directory mid-rewrite
sees a torn table, and a crash between the delete and the rename loses
the old snapshot entirely. Real lake formats (Delta, Iceberg, Hudi)
close that seam the same way: data files are immutable and
write-once-never-overwritten; a tiny MANIFEST names the exact file set
of each table version; publishing a version is ONE atomic
create-if-absent of the next manifest; readers resolve the newest
manifest and read exactly the files it names. This module is that
protocol reduced to its load-bearing core:

    <root>/
      data/<writer-uuid>/part-*.parquet     immutable, staged by writers
      _sbp_manifests/v000000000042.json     {"version", "base", "files"}

* **Crash safety** — a writer that dies after staging data but before
  the manifest link leaves only invisible orphans; the previous
  snapshot stays fully readable, and re-running the job converges
  (``vacuum`` reclaims orphans).
* **Concurrency** — commits are optimistic: version N+1 publishes via
  ``os.link`` (atomic fail-if-exists on POSIX), so two writers racing
  the same base get exactly one winner; the loser sees
  :class:`CommitConflict` and retries against the new snapshot.
* **Scale seam** — the commit primitive is "put-if-absent on the
  manifest path". POSIX link and HDFS create-no-overwrite provide it
  natively; S3-class object stores do not, which is exactly why Delta
  ships a LogStore abstraction (DynamoDB mutex) and Iceberg a catalog
  with atomic swap. :class:`ManifestTable` therefore refuses non-local
  roots rather than pretending rename is atomic there; plugging an
  object-store commit service in means overriding ``_publish`` only.
* **Manifest scale (round 10)** — manifests are DELTA-encoded: each
  version's JSON names only the files its commit added/removed (plus
  the small table metadata in full), and every ``_CKPT_EVERY`` commits
  a parquet CHECKPOINT (one row per live file: path, bucket, stats)
  snapshots the full state — Delta's checkpoint + log-segment shape.
  Snapshot resolution reads the nearest checkpoint (columnar, no JSON
  parse of the file list) plus at most ``_CKPT_EVERY`` delta JSONs, so
  a million-file table resolves in O(checkpoint + recent deltas), not
  O(full file list as JSON) per version; per-file zone-map stats are
  likewise collected only for ADDED files and carried forward.
  Pre-round-10 self-contained manifests (a ``files`` key) still
  resolve — the reader treats them as their own checkpoint.

Readers load ``spark.read.parquet(*files)`` — partition pruning, filter
pushdown, and column pruning behave exactly as on a directory scan, and
the file list itself enables the next-level optimization (data skipping
by per-file stats) that a bare directory listing cannot.
"""

from __future__ import annotations

import json
import math
import os
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_sbp_manifests"
_DATA_DIR = "data"
_V_DIGITS = 12
# a parquet checkpoint of the full live-file state lands every N commits;
# snapshot resolution therefore reads <= N delta JSONs + one checkpoint
_CKPT_EVERY = 10
# per-file keys of a resolved snapshot — delta-encoded on disk, never
# stored whole in a v2 manifest JSON
_PER_FILE_KEYS = (
    "add",
    "remove",
    "add_buckets",
    "add_stats",
    "add_blooms",
    "add_sizes",
    "fmt",
    "n_files",
)


def _bloom_build(
    values, bits_per_value: int = 10, k: int = 7, max_bits: int = 1 << 17
) -> tuple[int, str]:
    """(n_bits, hex bitset) Bloom filter over ``values`` with a PORTABLE
    hash family (md5-prefix, like the minhash family) — the filter must
    verify identically on any future reader. n_bits is the next power
    of two of ``bits_per_value × |values|`` (≈1% false positives at
    k=7), capped so a single file's filter stays ≤16 KiB."""
    import hashlib

    n = max(64, min(max_bits, 1 << (bits_per_value * max(1, len(values))).bit_length()))
    bits = bytearray(n // 8)
    for v in values:
        for i in range(k):
            h = (
                int.from_bytes(
                    hashlib.md5(f"{i}|{v}".encode()).digest()[:8], "big"
                )
                % n
            )
            bits[h >> 3] |= 1 << (h & 7)
    return n, bytes(bits).hex()


def _bloom_may_contain(n_bits: int, hexstr: str, value, k: int = 7) -> bool:
    import hashlib

    bits = bytes.fromhex(hexstr)
    for i in range(k):
        h = (
            int.from_bytes(hashlib.md5(f"{i}|{value}".encode()).digest()[:8], "big")
            % n_bits
        )
        if not (bits[h >> 3] >> (h & 7)) & 1:
            return False
    return True


def _bloom_canon(value) -> str:
    """Canonical string form hashed into a file bloom. Restricted to the
    types whose text form is unambiguous across engines — point lookups
    on floats would need an epsilon anyway, which a bloom cannot serve."""
    if isinstance(value, bool) or not isinstance(value, (int, str)):
        raise TypeError(
            f"bloom index supports int/string columns; got {type(value).__name__}"
        )
    return str(value)


class CommitConflict(RuntimeError):
    """Another writer published the version this commit targeted."""


def _bucket_of(key_cols: tuple[str, ...], n_buckets: int):
    """Deterministic key -> bucket expression (pmod over xxhash64). The
    SAME expression plans writes and routes merges, so a key's bucket
    never drifts between versions."""
    from pyspark.sql import functions as F

    return F.pmod(
        F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(n_buckets)
    ).cast("int")


def _zorder_key(df: DataFrame, cols: tuple[str, ...], bits: int = 8):
    """Morton (interleaved-bit) key over rank-quantized columns — the
    multi-dimensional clustering curve (Delta OPTIMIZE ZORDER BY's
    shape). Each column is quantized to ``2^bits`` cells by its OWN
    approximate quantiles (so skew cannot collapse the grid: every cell
    holds ~equal rows regardless of the value distribution), then the
    cell numbers' bits interleave. Sorting by the key gives every file a
    small hyper-rectangle of the value space, so per-file [min, max]
    zone maps prune on ANY clustered dimension — linear clustering
    prunes only its leading column. One approxQuantile pass (driver,
    |cuts| scalars) + a per-row JVM fold over the cut array; no
    shuffle beyond the final range partition."""
    from pyspark.sql import functions as F

    # The interleave must stay inside a 64-bit long: bit positions run
    # up to bits*len(cols)-1 and Java shiftleft wraps its distance mod
    # the operand width, so 32-bit cells put bit 31 in the SIGN position
    # (high cells sort first) and >=5 columns collide bits entirely.
    if bits * len(cols) > 63:
        raise ValueError(
            f"zorder key needs {bits * len(cols)} interleaved bits; "
            f"only 63 fit a long — lower bits or cluster fewer columns"
        )
    n_cells = 1 << bits
    qs = [i / n_cells for i in range(1, n_cells)]
    cutlists = df.stat.approxQuantile(
        [c for c in cols], qs, 0.001
    ) if len(cols) > 1 else [df.stat.approxQuantile(cols[0], qs, 0.001)]
    def cell_of(col: str, cuts: list[float]):
        arr = F.array(*[F.lit(float(c)) for c in cuts])
        return F.aggregate(
            arr,
            F.lit(0),
            lambda acc, c: acc
            + F.when(F.col(col).cast("double") > c, 1).otherwise(0),
        )

    cells = [
        cell_of(col, cuts).cast("long") for col, cuts in zip(cols, cutlists)
    ]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, cell in enumerate(cells):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cell, b).bitwiseAND(F.lit(1)),
                    b * len(cells) + i,
                )
            )
    return z.cast("long")


def _mtime_or_none(path: str) -> float | None:
    """mtime, or None when the file vanished (a concurrently vacuumed
    manifest) — history()'s legacy-timestamp fallback must not crash a
    reader mid-race."""
    try:
        return os.path.getmtime(path)
    except OSError:
        return None


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


class ManifestTable:
    """A versioned parquet table rooted at a local/POSIX directory."""

    def __init__(self, root: str):
        scheme = root.split("://", 1)[0] if "://" in root else "file"
        if scheme != "file":
            raise NotImplementedError(
                f"ManifestTable commit primitive needs put-if-absent; "
                f"scheme {scheme!r} requires an external commit service "
                f"(the Delta-LogStore / Iceberg-catalog seam) — override "
                f"_publish to supply one"
            )
        self.root = root.split("://", 1)[-1]
        os.makedirs(os.path.join(self.root, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(self.root, _DATA_DIR), exist_ok=True)
        # resolved-snapshot memo: versions are immutable once published,
        # so a resolution never goes stale (vacuum clears it — expiry is
        # the one event that invalidates time travel)
        self._snap_cache: dict[int, dict] = {}
        self._ts_cache: dict[int, float] = {}  # version -> in-commit publish ts

    # -- snapshot resolution ------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(
            self.root, _MANIFEST_DIR, f"v{version:0{_V_DIGITS}d}.json"
        )

    def _ckpt_path(self, version: int) -> str:
        return os.path.join(
            self.root, _MANIFEST_DIR, f"ckpt_v{version:0{_V_DIGITS}d}.parquet"
        )

    def _read_manifest_json(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def _write_checkpoint(self, version: int, snap: dict) -> None:
        """Materialize the resolved state at ``version`` as one parquet
        file (path, bucket, stats-JSON per live file). Deterministic
        content — racing writers of the same version produce identical
        bytes, so a plain atomic replace suffices."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        files = snap["files"]
        fb = snap.get("file_buckets", {})
        fs = snap.get("file_stats", {})
        fbl = snap.get("file_blooms", {})
        fsz = snap.get("file_sizes", {})
        table = pa.table(
            {
                "path": pa.array(files, type=pa.string()),
                "size": pa.array(
                    [fsz.get(f) for f in files], type=pa.int64()
                ),
                "bucket": pa.array(
                    [fb.get(f) for f in files], type=pa.int64()
                ),
                "stats": pa.array(
                    [json.dumps(fs[f]) if f in fs else None for f in files],
                    type=pa.string(),
                ),
                "blooms": pa.array(
                    [json.dumps(fbl[f]) if f in fbl else None for f in files],
                    type=pa.string(),
                ),
            }
        )
        final = self._ckpt_path(version)
        tmp = final + "." + uuid.uuid4().hex + ".tmp"
        pq.write_table(table, tmp)
        # durability like the manifest path: fsync file + dir, or a
        # crash could leave a PRESENT-but-torn checkpoint — readers do
        # fall back to the delta chain on a bad checkpoint, but vacuum
        # deletes that chain past the pinned version
        fd = os.open(tmp, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        os.replace(tmp, final)
        _fsync_dir(os.path.dirname(final))

    def _read_checkpoint(self, version: int) -> dict:
        """Full per-file state at a checkpointed version — columnar read,
        no JSON parse of the file list."""
        import pyarrow.parquet as pq

        t = pq.read_table(self._ckpt_path(version))
        files = t.column("path").to_pylist()
        buckets = t.column("bucket").to_pylist()
        stats = t.column("stats").to_pylist()
        blooms = (
            t.column("blooms").to_pylist()
            if "blooms" in t.schema.names
            else [None] * len(files)
        )
        sizes = (
            t.column("size").to_pylist()
            if "size" in t.schema.names
            else [None] * len(files)
        )
        return {
            "files": files,
            "file_buckets": {
                f: int(b) for f, b in zip(files, buckets) if b is not None
            },
            "file_stats": {
                f: json.loads(s) for f, s in zip(files, stats) if s is not None
            },
            "file_blooms": {
                f: json.loads(s) for f, s in zip(files, blooms) if s is not None
            },
            "file_sizes": {
                f: int(s) for f, s in zip(files, sizes) if s is not None
            },
        }

    def _resolve(self, v: int) -> dict:
        """Resolve version ``v`` to a full snapshot dict (files +
        per-file maps + metadata). Legacy self-contained manifests (a
        ``files`` key) return as-is; v2 delta manifests replay from the
        nearest checkpoint or legacy base — at most ``_CKPT_EVERY``
        O(delta) JSON reads plus one columnar checkpoint read."""
        m = self._read_manifest_json(v)
        if "files" in m:
            return m
        if os.path.exists(self._ckpt_path(v)):
            # checkpointed at v itself (vacuum pins the oldest retained
            # version this way): the checkpoint already includes v's delta
            try:
                state = self._read_checkpoint(v)
            except Exception:
                state = None  # torn/unreadable: try the delta chain below
        else:
            state = None
        if state is not None:
            out0 = {k: val for k, val in m.items() if k not in _PER_FILE_KEYS}
            out0["files"] = list(state["files"])
            if out0.get("n_buckets"):
                out0["file_buckets"] = state["file_buckets"]
            if out0.get("stat_cols"):
                out0["file_stats"] = state["file_stats"]
            if out0.get("bloom_cols"):
                out0["file_blooms"] = state["file_blooms"]
            if state.get("file_sizes"):
                out0["file_sizes"] = state["file_sizes"]
            return out0
        chain = [m]
        state = None
        base = m["base"]
        while base > 0:
            if os.path.exists(self._ckpt_path(base)):
                try:
                    state = self._read_checkpoint(base)
                    break
                except Exception:
                    pass  # torn checkpoint: keep walking the delta chain
            mb = self._read_manifest_json(base)
            if "files" in mb:
                state = {
                    "files": list(mb["files"]),
                    "file_buckets": dict(mb.get("file_buckets", {})),
                    "file_stats": dict(mb.get("file_stats", {})),
                    "file_blooms": dict(mb.get("file_blooms", {})),
                    "file_sizes": dict(mb.get("file_sizes", {})),
                }
                break
            chain.append(mb)
            base = mb["base"]
        if state is None:
            state = {
                "files": [],
                "file_buckets": {},
                "file_stats": {},
                "file_blooms": {},
                "file_sizes": {},
            }
        files: dict[str, None] = dict.fromkeys(state["files"])
        fb = dict(state["file_buckets"])
        fs = dict(state["file_stats"])
        fbl = dict(state.get("file_blooms", {}))
        fsz = dict(state.get("file_sizes", {}))
        for d in reversed(chain):
            for f in d.get("remove", ()):
                files.pop(f, None)
                fb.pop(f, None)
                fs.pop(f, None)
                fbl.pop(f, None)
                fsz.pop(f, None)
            for f in d.get("add", ()):
                files[f] = None
            fb.update(d.get("add_buckets", {}))
            fs.update(d.get("add_stats", {}))
            fbl.update(d.get("add_blooms", {}))
            fsz.update(d.get("add_sizes", {}))
        out = {k: val for k, val in m.items() if k not in _PER_FILE_KEYS}
        out["files"] = list(files)
        if out.get("n_buckets"):
            out["file_buckets"] = {f: fb[f] for f in files if f in fb}
        if out.get("stat_cols"):
            out["file_stats"] = {f: fs[f] for f in files if f in fs}
        if out.get("bloom_cols"):
            out["file_blooms"] = {f: fbl[f] for f in files if f in fbl}
        if fsz:
            out["file_sizes"] = {f: fsz[f] for f in files if f in fsz}
        return out

    def latest_version(self) -> int:
        """Newest committed version, 0 if the table is empty. Torn or
        in-flight manifests are invisible by construction (only the
        atomic link creates ``v*.json`` names)."""
        best = 0
        for name in os.listdir(os.path.join(self.root, _MANIFEST_DIR)):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    best = max(best, int(name[1 : 1 + _V_DIGITS]))
                except ValueError:
                    continue
        return best

    def snapshot(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        if v == 0:
            return {"version": 0, "base": 0, "files": []}
        hit = self._snap_cache.get(v)
        # validate hits against manifest existence (ADVICE r10): this
        # instance's own vacuum clears the cache, but ANOTHER process
        # vacuuming the same root cannot — a stale hit would let time
        # travel to an expired version fail later at scan time with
        # deleted data files instead of failing explicitly here, as the
        # vacuum docstring promises. One os.stat per snapshot() call.
        if hit is not None and not os.path.exists(self._manifest_path(v)):
            self._snap_cache.pop(v, None)
            hit = None
        if hit is None:
            if len(self._snap_cache) > 64:
                self._snap_cache.clear()
            hit = self._snap_cache[v] = self._resolve(v)
        # shallow-copy the mutable top level; nested maps are treated as
        # read-only by every consumer
        out = dict(hit)
        out["files"] = list(hit["files"])
        return out

    def version_at(self, timestamp) -> int:
        """Largest retained version published at or before ``timestamp``
        (unix seconds, or ISO ``YYYY-MM-DD[ HH:MM:SS]`` local time) —
        Delta's timestamp travel. The publish instant is the ``ts`` the
        manifest itself records at commit time (ADVICE r10: in-commit
        timestamps survive rsync/backup-restore, which resets the mtimes
        a directory-listing approach would read); legacy manifests
        without ``ts`` fall back to file mtime. Versions are published
        in order, so the scan is one directory listing plus one tiny
        delta-sized JSON per retained manifest. Raises if the timestamp
        predates the oldest RETAINED version (vacuum expired the
        history) or the table is empty."""
        import datetime

        ts = (
            datetime.datetime.fromisoformat(timestamp).timestamp()
            if isinstance(timestamp, str)
            else float(timestamp)
        )
        mdir = os.path.join(self.root, _MANIFEST_DIR)
        best, oldest = 0, None
        for name in os.listdir(mdir):
            if not (name.startswith("v") and name.endswith(".json")):
                continue
            try:
                v = int(name[1 : 1 + _V_DIGITS])
            except ValueError:
                continue
            # manifests are immutable once committed, so the publish ts
            # caches per (table handle, version): repeated time travel
            # pays one full-JSON parse per retained version per process,
            # not per call (ADVICE r11 — manifests also carry per-file
            # stats/bloom deltas, so the parse is not tiny on wide
            # commits; a ts sidecar/filename stamp is the structural fix
            # if retained-version counts ever grow past local scales)
            if v in self._ts_cache:
                oldest = (
                    self._ts_cache[v]
                    if oldest is None
                    else min(oldest, self._ts_cache[v])
                )
                if self._ts_cache[v] <= ts:
                    best = max(best, v)
                continue
            try:
                mtime = float(self._read_manifest_json(v)["ts"])
            except (KeyError, ValueError, json.JSONDecodeError):
                try:
                    mtime = os.path.getmtime(os.path.join(mdir, name))
                except OSError:
                    # vanished between listing and stat: concurrently
                    # vacuumed, so no longer retained — skip (r11
                    # reader-race matrix)
                    continue
            except OSError:
                continue  # manifest vanished mid-scan: same as above
            else:
                # only in-commit timestamps cache: an mtime fallback for
                # a legacy manifest is filesystem state, not content
                self._ts_cache[v] = mtime
            oldest = mtime if oldest is None else min(oldest, mtime)
            if mtime <= ts:
                best = max(best, v)
        if best == 0:
            raise ValueError(
                f"no retained version at or before {timestamp!r}"
                + (
                    f" (oldest retained manifest was published at {oldest})"
                    if oldest is not None
                    else " (table has no committed version)"
                )
            )
        return best

    def data_files(self, version: int | None = None) -> list[str]:
        return [
            os.path.join(self.root, f) for f in self.snapshot(version)["files"]
        ]

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        merge_schema: bool = False,
        timestamp=None,
    ) -> DataFrame:
        """Load a snapshot. ``merge_schema=True`` reconciles data files
        written under different (widened) schemas — columns absent from
        older files read as null. Off by default: schema merging pays a
        footer-union per read and an evolved table only needs it until
        compaction rewrites every file under the widest schema.
        ``timestamp`` (unix seconds or ISO string) resolves the version
        via :meth:`version_at` — mutually exclusive with ``version``."""
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass version OR timestamp, not both")
            version = self.version_at(timestamp)
        files = self.data_files(version)
        if not files:
            raise ValueError(f"ManifestTable {self.root} has no committed version")
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*files)

    # -- writer protocol ----------------------------------------------
    def _validate(self, df: DataFrame) -> DataFrame:
        """Enforce the table's CHECK constraints on data about to be
        staged — the write boundary, so bad rows are rejected BEFORE a
        commit can name them (a reader never sees a violating row, and
        the error points at the writer that produced it). One combined
        O(batch) pass with take(1) early-exit; existing rows pass by
        induction (they were validated when staged). Raises with the
        names of every violated constraint for the first bad row."""
        from pyspark.sql import functions as F

        cons = self.snapshot().get("constraints", {})
        if not cons:
            return df
        combined = F.lit(True)
        probes = []
        for name, expr in cons.items():
            ok = F.coalesce(F.expr(expr), F.lit(False))
            combined = combined & ok
            probes.append(ok.alias(f"__c_{name}"))
        bad = (
            df.filter(~combined)
            .select(F.struct(*df.columns).alias("__row"), *probes)
            .take(1)
        )
        if bad:
            failed = [name for name in cons if not bad[0][f"__c_{name}"]]
            raise ValueError(
                f"constraint violation {failed}: first bad row "
                f"{bad[0]['__row'].asDict()!r}"
            )
        return df

    def set_constraint(
        self, name: str, expr: str, spark: SparkSession | None = None
    ) -> int:
        """Add a CHECK constraint (SQL boolean expression over the
        table's columns; NULL counts as a violation, as in SQL CHECK
        with Delta's stricter null handling). Existing data is
        validated FIRST — a constraint the table already violates is
        rejected, never recorded. The constraint rides the manifest and
        every later append / merge / overwrite enforces it on the data
        it writes. Returns the metadata-only commit's version."""
        from pyspark.sql import functions as F

        snap = self.snapshot()
        if snap["files"]:
            spark = spark or SparkSession.getActiveSession()
            if spark is None:
                raise ValueError(
                    "set_constraint on a non-empty table needs a spark "
                    "session to validate existing data"
                )
            bad = (
                self.read(spark)
                .filter(~F.coalesce(F.expr(expr), F.lit(False)))
                .take(1)
            )
            if bad:
                raise ValueError(
                    f"existing data violates {name!r}: {bad[0].asDict()!r}"
                )
        cons = dict(snap.get("constraints", {}))
        cons[name] = expr
        return self._metadata_commit(snap, {"constraints": cons})

    def drop_constraint(self, name: str) -> int:
        snap = self.snapshot()
        cons = dict(snap.get("constraints", {}))
        cons.pop(name, None)
        return self._metadata_commit(snap, {"constraints": cons})

    def _metadata_commit(self, snap: dict, extra: dict) -> int:
        """Commit the current file set unchanged with updated metadata,
        preserving bucket shape and stat columns."""
        meta = {
            k: snap[k]
            for k in ("n_buckets", "bucket_keys", "file_buckets")
            if k in snap
        }
        meta.update(extra)
        return self.commit(
            snap["files"],
            snap["version"],
            bucket_meta=meta,
            stat_cols=tuple(snap.get("stat_cols", ())),
        )

    def restore(self, version: int) -> int:
        """RESTORE: make an earlier snapshot current by committing its
        file set (and bucket/constraint metadata) as a NEW version —
        history is never rewritten, so readers of intermediate versions
        are unaffected and the bad versions stay inspectable. The
        restored files must still exist (i.e. the version is inside the
        vacuum retention window); zero data movement otherwise."""
        old = self.snapshot(version)
        for f in old["files"]:
            if not os.path.exists(os.path.join(self.root, f)):
                raise ValueError(
                    f"cannot restore v{version}: data file {f} was vacuumed"
                )
        cur = self.snapshot()
        meta = {
            k: old[k]
            for k in ("n_buckets", "bucket_keys", "file_buckets")
            if k in old
        }
        # pin the OLD constraint set (possibly none) — restore reverts
        # metadata too, and commit's carry-forward must not resurrect
        # constraints added after the restored version
        meta["constraints"] = old.get("constraints", {})
        return self.commit(
            old["files"],
            cur["version"],
            bucket_meta=meta,
            stat_cols=tuple(old.get("stat_cols", ())),
        )

    def stage_bucketed(
        self, df: DataFrame, key_cols: tuple[str, ...], n_buckets: int
    ) -> dict[str, int]:
        """Stage ``df`` hash-bucketed by key: rows land under
        ``__sbp_bucket=N`` subdirs of a writer-unique dir, and the
        returned {relative path: bucket} map travels in the manifest so
        a later MERGE can rewrite ONLY the buckets its keys touch. The
        bucket column is derived (pmod(xxhash64(keys), n)), never
        stored — readers see exactly the user's columns."""
        from pyspark.sql import functions as F

        sub = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        out = os.path.join(self.root, sub)
        bucketed = df.withColumn("__sbp_bucket", _bucket_of(key_cols, n_buckets))
        # co-locate each bucket into one task -> one file per present
        # bucket (a MERGE stages only its touched buckets, so this stays
        # proportional to the delta, and compaction gets its target
        # file count for free)
        bucketed = bucketed.repartition(n_buckets, F.col("__sbp_bucket"))
        bucketed.write.partitionBy("__sbp_bucket").parquet(out)
        mapping: dict[str, int] = {}
        for dirpath, _dirs, names in os.walk(out):
            base = os.path.basename(dirpath)
            if not base.startswith("__sbp_bucket="):
                continue
            bucket = int(base.split("=", 1)[1])
            for name in names:
                if name.endswith(".parquet"):
                    rel = os.path.relpath(os.path.join(dirpath, name), self.root)
                    mapping[rel] = bucket
        return mapping

    def stage(self, df: DataFrame, n_files: int | None = None) -> list[str]:
        """Write ``df`` as immutable data files under a writer-unique
        subdir and return their root-relative paths. NOT visible to
        readers until a commit names them."""
        sub = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        out = os.path.join(self.root, sub)
        (df.repartition(n_files) if n_files else df).write.parquet(out)
        return sorted(
            os.path.join(sub, f)
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )

    def _publish(self, tmp: str, final: str) -> None:
        """Atomic put-if-absent of a fully-written manifest. POSIX
        ``link`` fails with EEXIST if another writer won the version —
        the one primitive an object-store backend must replace."""
        try:
            os.link(tmp, final)
        except FileExistsError as exc:
            raise CommitConflict(os.path.basename(final)) from exc
        finally:
            os.unlink(tmp)
        _fsync_dir(os.path.dirname(final))

    def txn_version(self, app_id: str, version: int | None = None) -> int:
        """Highest transaction id committed under ``app_id`` as of the
        snapshot (-1 if the app never committed). The idempotence check
        an exactly-once writer performs before re-applying a batch."""
        return int(self.snapshot(version).get("txns", {}).get(app_id, -1))

    def commit(
        self,
        files: list[str],
        base_version: int,
        bucket_meta: dict | None = None,
        stat_cols: tuple[str, ...] = (),
        txn: tuple[str, int] | None = None,
        bloom_cols: tuple[str, ...] = (),
        bloom_max_bits: int | None = None,
    ) -> int:
        """Publish ``files`` as version ``base_version + 1``. Raises
        :class:`CommitConflict` if that version already exists (the
        caller re-reads the new snapshot and retries its merge).
        ``bucket_meta`` (bucketed tables) carries {n_buckets,
        bucket_keys, file_buckets} so merges can plan partial rewrites;
        ``stat_cols`` records per-file [min, max] zone maps for those
        columns so read_range/prune_files can skip files without
        opening them.

        ``txn=(app_id, txn_id)`` records a writer transaction in the
        manifest (the Delta ``txn`` action): the table remembers, per
        application id, the highest transaction id it has absorbed —
        carried forward through every later commit — so an idempotent
        writer (a streaming foreachBatch replaying after a crash) checks
        :meth:`txn_version` and SKIPS batches the table already holds.
        Content-idempotent merges make replays harmless; the txn record
        makes them FREE (no re-stage, no re-shuffle) and protects
        non-idempotent transforms (appends) too.

        STORAGE is delta-encoded (round 10): the JSON names only the
        files this commit added/removed relative to ``base_version``
        (plus the full small metadata); per-file buckets and zone-map
        stats ride only for the ADDED files, with stats collected
        incrementally — carried files keep the stats their adding commit
        recorded, so commit cost is O(delta), never O(table). Every
        ``_CKPT_EVERY`` versions a parquet checkpoint snapshots the full
        state for O(1)-ish resolution."""
        next_v = base_version + 1
        base_snap = self.snapshot(base_version)
        base_files = base_snap.get("files", [])
        base_set = set(base_files)
        file_set = set(files)
        manifest: dict = {
            "version": next_v,
            "base": base_version,
            "fmt": 2,
            "n_files": len(files),
            # in-commit publish instant (ADVICE r10): mtime-based
            # timestamp travel breaks the moment the table directory is
            # rsync'd/restored (mtimes reset); the manifest's own record
            # survives any copy. version_at prefers it, mtime is the
            # legacy fallback.
            "ts": time.time(),
            "add": [f for f in files if f not in base_set],
            "remove": [f for f in base_files if f not in file_set],
        }
        txns = dict(base_snap.get("txns", {}))
        if txn is not None:
            app_id, txn_id = txn
            txns[app_id] = max(int(txn_id), int(txns.get(app_id, -1)))
        if txns:
            manifest["txns"] = txns
        if bucket_meta:
            meta = dict(bucket_meta)
            fb = meta.pop("file_buckets", None)
            manifest.update(meta)
            if fb is not None:
                # kept files' buckets carry from base via resolution (a
                # file's bucket never changes); only added files need rows
                manifest["add_buckets"] = {
                    f: fb[f] for f in manifest["add"] if f in fb
                }
        # constraints ride every commit unless the caller overrides them
        # (set/drop_constraint, restore); dropping the key would silently
        # disarm the table on the next merge
        if "constraints" not in manifest and base_snap.get("constraints"):
            manifest["constraints"] = base_snap["constraints"]
        if stat_cols:
            scols = sorted(stat_cols)
            manifest["stat_cols"] = scols
            # incremental: footers are opened only for files without
            # carried stats (added files, or every file if the stat
            # column set changed)
            base_stats = (
                base_snap.get("file_stats", {})
                if base_snap.get("stat_cols") == scols
                else {}
            )
            need = [f for f in files if f not in base_stats]
            if need:
                manifest["add_stats"] = self.collect_file_stats(
                    need, tuple(stat_cols)
                )
        # bloom index columns carry through every commit once set (unlike
        # stat_cols, which each verb restates) — a point-lookup index
        # that silently lapsed on the next merge would be worse than none
        bcols = sorted(bloom_cols) if bloom_cols else base_snap.get("bloom_cols")
        if bcols:
            manifest["bloom_cols"] = list(bcols)
            mb = bloom_max_bits or base_snap.get("bloom_max_bits")
            if mb:
                manifest["bloom_max_bits"] = int(mb)
            base_blooms = (
                base_snap.get("file_blooms", {})
                if base_snap.get("bloom_cols") == list(bcols)
                else {}
            )
            need_b = [f for f in files if f not in base_blooms]
            if need_b:
                manifest["add_blooms"] = self.collect_file_blooms(
                    need_b, tuple(bcols), max_bits=mb
                )
        add_sizes = {}
        for f in manifest["add"]:
            p = os.path.join(self.root, f)
            if os.path.exists(p):
                add_sizes[f] = os.path.getsize(p)
        if add_sizes:
            manifest["add_sizes"] = add_sizes
        fd, tmp = tempfile.mkstemp(
            dir=os.path.join(self.root, _MANIFEST_DIR), suffix=".tmp"
        )
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        self._publish(tmp, self._manifest_path(next_v))
        if next_v % _CKPT_EVERY == 0:
            # only the publish winner reaches this line, so the
            # checkpoint is written once; resolution re-derives the full
            # state through the very path later readers will use.
            # BEST-EFFORT: the version is already durably published — a
            # checkpoint failure (disk full, missing pyarrow) must not
            # make commit() report failure, or a retrying caller would
            # double-apply against its own committed version; readers
            # fall back to the delta chain when the checkpoint is absent.
            try:
                self._write_checkpoint(next_v, self._resolve(next_v))
            except Exception:
                pass
        return next_v

    def overwrite(
        self,
        df: DataFrame,
        max_retries: int = 5,
        cluster_by: tuple[str, ...] = (),
        n_files: int | None = None,
        stat_cols: tuple[str, ...] = (),
        cluster_method: str = "range",
        zorder_bits: int = 8,
    ) -> int:
        """Full-replace commit (last-writer-wins): stage once, retry the
        publish against whatever the latest version becomes.

        ``cluster_by`` range-partitions + sorts the data on those
        columns before staging, so each file owns a narrow value range —
        zone maps (``stat_cols``, which defaults to the cluster columns)
        then make ``read_range`` skip almost every file instead of
        almost none. Clustering is what turns file stats from metadata
        into skipped I/O; unclustered tables keep stats but overlap.

        ``cluster_method="zorder"`` (≥2 cluster columns) clusters on the
        Morton curve instead of the linear sort: every file owns a small
        hyper-rectangle of the multi-column value space, so zone maps
        prune queries filtering ANY clustered column — the layout for
        tables queried along more than one axis (``read_box``). Linear
        clustering stays the better choice when one column dominates
        the workload (it prunes that column perfectly)."""
        from pyspark.sql import functions as F

        df = self._validate(df)
        if cluster_by:
            stat_cols = stat_cols or tuple(cluster_by)
            if cluster_method == "zorder" and len(cluster_by) > 1:
                zk = "__sbp_zorder"
                zdf = df.withColumn(
                    zk, _zorder_key(df, tuple(cluster_by), zorder_bits)
                )
                zdf = (
                    zdf.repartitionByRange(n_files, F.col(zk))
                    if n_files
                    else zdf.repartitionByRange(F.col(zk))
                ).sortWithinPartitions(zk)
                df = zdf.drop(zk)
            elif cluster_method not in ("range", "zorder"):
                raise ValueError(f"unknown cluster_method {cluster_method!r}")
            else:
                cols = [df[c] for c in cluster_by]
                df = (
                    df.repartitionByRange(n_files, *cols)
                    if n_files
                    else df.repartitionByRange(*cols)
                ).sortWithinPartitions(*cols)
            files = self.stage(df)
        else:
            files = self.stage(df, n_files=n_files)
        for _ in range(max_retries):
            try:
                return self.commit(
                    files, self.latest_version(), stat_cols=stat_cols
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up after {max_retries} retries")

    def append(
        self,
        df: DataFrame,
        n_files: int | None = None,
        max_retries: int = 5,
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Blind append: stage ``df`` and commit old ∪ new files. Never
        reads existing data — the O(batch) ingest verb a streaming sink
        uses when rows are immutable facts (events, logs) and MERGE's
        key semantics would buy nothing. On a bucketed table the batch
        is staged bucket-partitioned and the bucket map extends, so
        later keyed merges still rewrite only touched buckets (a bucket
        may then hold several files; merges read them all). Appends
        fragment by design — :meth:`compact_small` is the matching
        maintenance verb, O(small files) not O(table). ``txn`` gives a
        replaying writer the exactly-once skip, which appends need even
        more than merges: a replayed append DUPLICATES rows."""
        df = self._validate(df)
        for _ in range(max_retries):
            snap = self.snapshot()
            if txn is not None and int(
                snap.get("txns", {}).get(txn[0], -1)
            ) >= int(txn[1]):
                return snap["version"]
            if snap.get("n_buckets"):
                new_map = self.stage_bucketed(
                    df, tuple(snap["bucket_keys"]), snap["n_buckets"]
                )
                files = snap["files"] + sorted(new_map)
                meta = {
                    "n_buckets": snap["n_buckets"],
                    "bucket_keys": snap["bucket_keys"],
                    "file_buckets": {**snap["file_buckets"], **new_map},
                }
            else:
                files = snap["files"] + self.stage(df, n_files=n_files)
                meta = None
            try:
                return self.commit(
                    files,
                    snap["version"],
                    bucket_meta=meta,
                    stat_cols=tuple(snap.get("stat_cols", ())),
                    txn=txn,
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up after {max_retries} retries")

    # -- data skipping ---------------------------------------------------
    def collect_file_stats(
        self, files: list[str], stat_cols: tuple[str, ...]
    ) -> dict[str, dict[str, list]]:
        """{relative path: {col: [min, max]}} from the parquet footers
        (pyarrow, driver-local, no Spark job) — the per-file zone maps a
        manifest can serve that a bare directory listing cannot. Columns
        with no usable stats (all-null files, unsupported types) are
        omitted for that file, which prune_files treats as
        must-keep."""
        import pyarrow.parquet as pq

        out: dict[str, dict[str, list]] = {}
        for rel in files:
            meta = pq.ParquetFile(os.path.join(self.root, rel)).metadata
            cols: dict[str, list] = {}
            if meta.num_row_groups == 0:  # empty file: no stats, must-keep
                out[rel] = cols
                continue
            for ci in range(meta.num_columns):
                name = meta.row_group(0).column(ci).path_in_schema
                if name not in stat_cols:
                    continue
                mins, maxs = [], []
                for ri in range(meta.num_row_groups):
                    st = meta.row_group(ri).column(ci).statistics
                    if st is None or not st.has_min_max:
                        mins = []
                        break
                    mins.append(st.min)
                    maxs.append(st.max)
                if mins:
                    cols[name] = [min(mins), max(maxs)]
            out[rel] = cols
        return out

    def collect_file_blooms(
        self,
        files: list[str],
        bloom_cols: tuple[str, ...],
        max_bits: int | None = None,
    ) -> dict[str, dict[str, list]]:
        """{relative path: {col: [n_bits, hex bitset]}} — per-file Bloom
        filters over the column's distinct values (streamed pyarrow
        batches, driver-local). The point-lookup complement to zone
        maps: min/max cannot prune an unclustered high-cardinality
        column, a bloom prunes any file that provably lacks the value.
        Columns missing from a file's schema are skipped (must-keep,
        like stats).

        MEMORY (ADVICE r10): the column is consumed via
        ``iter_batches``, never materialized whole — peak driver memory
        is one Arrow batch plus the per-file distinct set (bounded by
        the column's distinct count, which the bloom sizing cap already
        assumes is manifest-scale). Without this, every compaction on a
        bloom-indexed table would pull the largest rewritten file's
        column into the driver inside commit()."""
        import pyarrow.parquet as pq

        out: dict[str, dict[str, list]] = {}
        for rel in files:
            pf = pq.ParquetFile(os.path.join(self.root, rel))
            names = set(pf.schema_arrow.names)
            cols: dict[str, list] = {}
            for col in bloom_cols:
                if col not in names:
                    continue
                distinct: set = set()
                for batch in pf.iter_batches(columns=[col], batch_size=65536):
                    arr = batch.column(0).drop_null()
                    distinct.update(_bloom_canon(v) for v in arr.to_pylist())
                n, hx = _bloom_build(
                    distinct,
                    **({"max_bits": int(max_bits)} if max_bits else {}),
                )
                cols[col] = [n, hx]
            out[rel] = cols
        return out

    def set_bloom_index(
        self,
        cols: tuple[str, ...],
        max_retries: int = 5,
        max_bits: int | None = None,
    ) -> int:
        """Record a Bloom point-lookup index on ``cols``: one metadata
        commit computing filters for every CURRENT file; later commits
        extend the index incrementally (added files only — carried
        files keep their filters, footers never re-read).

        SIZING: filters target ~10 bits per distinct value (≈1% false
        positives at k=7) up to a per-file cap — default 2^17 bits
        (16 KiB). A file whose distinct count exceeds cap/10 degrades
        gracefully (fpp rises, pruning weakens, correctness unaffected);
        pass ``max_bits`` (recorded in the manifest and applied to every
        later commit) to match the table's per-file cardinality — e.g.
        2^20 for ~100k distinct keys per file (128 KiB per file per
        column, still manifest-scale next to a 128 MB data file)."""
        if not cols:
            raise ValueError("set_bloom_index needs at least one column")
        for _ in range(max_retries):
            snap = self.snapshot()
            meta = {
                k: snap[k]
                for k in ("n_buckets", "bucket_keys", "file_buckets")
                if k in snap
            }
            try:
                return self.commit(
                    snap["files"],
                    snap["version"],
                    bucket_meta=meta,
                    stat_cols=tuple(snap.get("stat_cols", ())),
                    bloom_cols=tuple(cols),
                    bloom_max_bits=max_bits,
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up after {max_retries} retries")

    def prune_files_point(
        self, col: str, value, version: int | None = None
    ) -> list[str]:
        """Files of the snapshot that MAY contain ``col = value`` per
        their Bloom filters (files without a filter are kept — skipping
        must never drop a row). False-positive rate ≈1% per file at the
        default sizing; false negatives are impossible, so
        ``read_point`` is exact."""
        snap = self.snapshot(version)
        blooms = snap.get("file_blooms", {})
        key = _bloom_canon(value)
        kept = []
        for rel in snap["files"]:
            b = blooms.get(rel, {}).get(col)
            if b is None or _bloom_may_contain(int(b[0]), b[1], key):
                kept.append(rel)
        return kept

    def read_point(
        self, spark: SparkSession, col: str, value, version: int | None = None
    ) -> DataFrame:
        """Point lookup served by the manifest: bloom pruning ∩ zone-map
        pruning choose the files, then the exact equality filter applies
        on top (pushed to the parquet scan). Equal to
        ``read().filter(col = value)`` by construction; cheaper by every
        skipped file — the primary-key-fetch shape a 100 TB store needs
        without a secondary index."""
        from pyspark.sql import functions as F

        # resolve the version ONCE (ADVICE r10): three independent
        # `version=None` resolutions could straddle a concurrent commit —
        # intersecting version-N bloom survivors with version-N+1's file
        # list silently drops N+1's added files from an exact method
        if version is None:
            version = self.latest_version()
        files = set(self.prune_files_point(col, value, version))
        snap = self.snapshot(version)
        if col in (snap.get("stat_cols") or ()):
            files &= set(self.prune_files(col, value, value, version))
        files = [f for f in snap["files"] if f in files]
        if not files:
            return self.read(spark, version).filter(F.lit(False))
        df = spark.read.parquet(*[os.path.join(self.root, f) for f in files])
        return df.filter(F.col(col) == F.lit(value))

    def prune_files(
        self, col: str, lo, hi, version: int | None = None
    ) -> list[str]:
        """Root-relative data files of the snapshot whose [min, max] for
        ``col`` intersects [lo, hi] (None = unbounded). Files without
        recorded stats for ``col`` are kept — skipping must never drop a
        row. Pair with ``spark.read.parquet(*table.abs(files))`` plus
        the real filter: the stats only choose which footers Spark ever
        opens."""
        snap = self.snapshot(version)
        stats = snap.get("file_stats", {})
        kept = []
        for rel in snap["files"]:
            rng = stats.get(rel, {}).get(col)
            if rng is None:
                kept.append(rel)
                continue
            fmin, fmax = rng
            if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
                continue
            kept.append(rel)
        return kept

    def read_range(
        self, spark: SparkSession, col: str, lo, hi, version: int | None = None
    ) -> DataFrame:
        """Range scan served by manifest zone maps: only files whose
        ``col`` stats intersect [lo, hi] are handed to Spark (the others
        are never opened — no footer read, no task), then the exact
        filter applies on top. Equal to ``read().filter(...)`` by
        construction; cheaper by the skipped files."""
        from pyspark.sql import functions as F

        files = self.prune_files(col, lo, hi, version)
        if not files:
            return self.read(spark, version).filter(F.lit(False))
        df = spark.read.parquet(*[os.path.join(self.root, f) for f in files])
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
        return df

    def prune_files_box(
        self, preds: dict[str, tuple], version: int | None = None
    ) -> list[str]:
        """Files whose zone maps intersect EVERY [lo, hi] in ``preds``
        ({col: (lo, hi)}, None = unbounded) — conjunctive multi-column
        skipping. On a z-ordered table each file owns a hyper-rectangle,
        so the per-column intersections each discard files and the
        conjunction compounds; on a linearly-clustered table only the
        leading column's predicate skips anything."""
        kept = self.snapshot(version)["files"]
        for col, (lo, hi) in preds.items():
            pruned = set(self.prune_files(col, lo, hi, version))
            kept = [f for f in kept if f in pruned]
        return kept

    def read_box(
        self, spark: SparkSession, preds: dict[str, tuple], version: int | None = None
    ) -> DataFrame:
        """Multi-column range scan served by zone maps: only files whose
        stats intersect every predicate are opened, then the exact
        filters apply on top. Equal to ``read().filter(...)`` by
        construction; cheaper by the skipped files."""
        from pyspark.sql import functions as F

        files = self.prune_files_box(preds, version)
        base = (
            spark.read.parquet(*[os.path.join(self.root, f) for f in files])
            if files
            else self.read(spark, version).filter(F.lit(False))
        )
        for col, (lo, hi) in preds.items():
            if lo is not None:
                base = base.filter(F.col(col) >= F.lit(lo))
            if hi is not None:
                base = base.filter(F.col(col) <= F.lit(hi))
        return base

    def changes(
        self,
        spark: SparkSession,
        v_from: int,
        v_to: int | None = None,
        key_cols: tuple[str, ...] = (),
        tracked_cols: tuple[str, ...] = (),
    ) -> DataFrame:
        """Row-level change feed between two committed versions —
        (keys, change_type ∈ {insert, update, delete}) — the table-
        changes read a downstream incremental consumer tails instead of
        re-reading the table. Thin glue over api.snapshot_diff (the CDC
        reconciliation core): one co-partitioned full-outer join of the
        two snapshots, so the cost is the two snapshots' scan + one
        keyed shuffle, independent of how many commits separate them.
        Keys default to the table's bucket keys when bucketed."""
        from dicebox_sensorybatchprocessor_spark import api

        keys = (
            tuple(key_cols)
            or tuple(self.snapshot(v_to).get("bucket_keys") or ())
            or tuple(self.snapshot(v_from).get("bucket_keys") or ())
        )
        if not keys:
            raise ValueError("changes() needs key_cols (or a bucketed endpoint)")
        old = self.read(spark, v_from)
        new = self.read(spark, v_to)
        tracked = tuple(tracked_cols) or tuple(
            c for c in new.columns if c not in keys
        )
        return api.snapshot_diff(old, new, keys, tracked)

    # -- maintenance ----------------------------------------------------
    def _file_sizes(self, snap: dict) -> dict[str, int]:
        """{relative path: bytes} for the snapshot — served from the
        manifest's per-file sizes (recorded at commit, one stat per
        ADDED file ever) with a getsize fallback for files committed
        before round 10. At millions of files this is what keeps
        ``optimize``'s decision a manifest read instead of millions of
        filesystem stat calls."""
        known = snap.get("file_sizes", {})
        return {
            f: known[f]
            if f in known
            else os.path.getsize(os.path.join(self.root, f))
            for f in snap["files"]
        }

    def file_stats(self, version: int | None = None) -> tuple[int, int]:
        """(file count, total bytes) of the snapshot's data files — from
        the manifest, not a directory walk, so orphans never skew the
        compaction plan."""
        snap = self.snapshot(version)
        return len(snap["files"]), sum(self._file_sizes(snap).values())

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY: one row per retained version, newest first —
        version, base, file/add/remove counts, whether it is
        checkpointed, and the small metadata (bucket shape, txn apps,
        constraint names, mv watermark). Reads ONLY the per-version
        metadata: an O(delta) JSON each for fmt-2 manifests, never a
        checkpoint or a resolved file list, so inspecting a million-file
        table's history stays manifest-sized."""
        out = []
        mdir = os.path.join(self.root, _MANIFEST_DIR)
        versions = []
        for name in os.listdir(mdir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    versions.append(int(name[1 : 1 + _V_DIGITS]))
                except ValueError:
                    continue  # stray non-canonical file, same as listers
        versions.sort(reverse=True)
        for v in versions:
            try:
                m = self._read_manifest_json(v)
            except OSError:
                # vanished between the listing and the read: a concurrent
                # vacuum expired it. It is no longer retained history —
                # skip it, exactly as if the listing had run a moment
                # later (reader-race matrix, r11).
                continue
            legacy = "files" in m
            out.append(
                {
                    "version": v,
                    "base": m.get("base", 0),
                    "n_files": len(m["files"]) if legacy else m.get("n_files", 0),
                    "n_added": len(m.get("add", m.get("files", []))),
                    "n_removed": len(m.get("remove", ())),
                    # in-commit publish instant where recorded (r11 —
                    # survives rsync/restore); mtime fallback for legacy
                    # manifests, None when even that is unavailable
                    "timestamp": (
                        float(m["ts"])
                        if "ts" in m
                        else _mtime_or_none(self._manifest_path(v))
                    ),
                    "checkpointed": os.path.exists(self._ckpt_path(v)),
                    "n_buckets": m.get("n_buckets"),
                    "txn_apps": sorted(m.get("txns", {})),
                    "constraints": sorted(m.get("constraints", {})),
                    "bloom_cols": m.get("bloom_cols"),
                    "mv_base_version": m.get("mv_base_version"),
                }
            )
        return out

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 * 1024 * 1024,
        max_retries: int = 5,
    ) -> dict:
        """Rewrite the current snapshot toward ``target_file_bytes`` per
        file and commit the compacted file set as the next version. A
        concurrent commit landing mid-rewrite conflicts; compaction then
        restarts from the NEW snapshot (its rewrite must include the
        interleaved writer's rows — dropping them is the lost-update the
        manifest protocol exists to prevent). Data movement is one scan
        + one round-robin repartition write; no value-keyed shuffle."""
        for _ in range(max_retries):
            snap = self.snapshot()
            n_before, total_bytes = self.file_stats(snap["version"])
            # always schema-merge here: a compaction is exactly the pass
            # that settles an evolved table under its widest schema, and
            # a plain read's schema inference samples files — it could
            # silently drop a column added by schema_evolution merges
            df = self.read(spark, snap["version"], merge_schema=True)
            if snap.get("n_buckets"):
                # bucketed tables compact per bucket (one file each) so
                # the bucket map — and partial-rewrite merges — survive
                mapping = self.stage_bucketed(
                    df, tuple(snap["bucket_keys"]), snap["n_buckets"]
                )
                files, n_out = sorted(mapping), snap["n_buckets"]
                meta = {
                    "n_buckets": snap["n_buckets"],
                    "bucket_keys": snap["bucket_keys"],
                    "file_buckets": mapping,
                }
            else:
                n_out = max(1, math.ceil(total_bytes / target_file_bytes))
                files, meta = self.stage(df, n_files=n_out), None
            try:
                version = self.commit(
                    files,
                    snap["version"],
                    bucket_meta=meta,
                    stat_cols=tuple(snap.get("stat_cols", ())),
                )
            except CommitConflict:
                continue
            return {
                "version": version,
                "n_files_before": n_before,
                "n_files_after": len(files),
                "total_bytes": total_bytes,
                "n_output_files_planned": n_out,
            }
        raise CommitConflict(f"gave up after {max_retries} retries")

    def compact_small(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 * 1024 * 1024,
        small_file_bytes: int | None = None,
        max_retries: int = 5,
    ) -> dict:
        """Bin-packing compaction: rewrite ONLY the files smaller than
        ``small_file_bytes`` (default ``target_file_bytes // 2``) into
        ~target-sized files, and carry every already-right-sized file
        into the next snapshot byte-identical. Maintenance cost scales
        with the fragmented tail a streaming ingest leaves behind, not
        the table — ``compact()`` is O(table) and at lake scale a
        nightly OPTIMIZE must be O(small files) or it never finishes.
        Zone maps for carried files are re-read from unchanged footers,
        so skipping survives the commit. Fewer than two small files is a
        no-op (version unchanged, nothing staged). Bucketed tables are
        rejected: each MERGE already rewrites a touched bucket into one
        file, so their fragmentation is bounded by design — use
        ``compact()`` to re-settle an evolved schema instead."""
        small = (
            small_file_bytes
            if small_file_bytes is not None
            else target_file_bytes // 2
        )
        for _ in range(max_retries):
            snap = self.snapshot()
            if snap.get("n_buckets"):
                raise ValueError(
                    "bucketed tables stay one-file-per-bucket; use compact()"
                )
            sizes = self._file_sizes(snap)
            small_files = [f for f in snap["files"] if sizes[f] < small]
            keep_files = [f for f in snap["files"] if sizes[f] >= small]
            if len(small_files) < 2:
                return {
                    "version": snap["version"],
                    "n_files_before": len(snap["files"]),
                    "n_files_after": len(snap["files"]),
                    "n_files_rewritten": 0,
                    "n_files_carried": len(snap["files"]),
                    "bytes_rewritten": 0,
                    "n_output_files_planned": 0,
                }
            bytes_small = sum(sizes[f] for f in small_files)
            n_out = max(1, math.ceil(bytes_small / target_file_bytes))
            # mergeSchema: the small tail may straddle a schema evolution;
            # the packed files settle under the widest schema of the TAIL
            # only — carried files are untouched by contract
            df = spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(self.root, f) for f in small_files]
            )
            new_files = self.stage(df, n_files=n_out)
            try:
                version = self.commit(
                    keep_files + new_files,
                    snap["version"],
                    stat_cols=tuple(snap.get("stat_cols", ())),
                )
            except CommitConflict:
                continue
            return {
                "version": version,
                "n_files_before": len(snap["files"]),
                "n_files_after": len(keep_files) + len(new_files),
                "n_files_rewritten": len(small_files),
                "n_files_carried": len(keep_files),
                "bytes_rewritten": bytes_small,
                "n_output_files_planned": n_out,
            }
        raise CommitConflict(f"gave up after {max_retries} retries")

    def compact_buckets(
        self, spark: SparkSession, max_retries: int = 5
    ) -> dict:
        """Partial per-bucket compaction: re-coalesce ONLY the buckets
        that hold more than one file (the residue of blind appends on a
        bucketed table) and carry every single-file bucket's file
        byte-identical. Maintenance cost is O(fragmented buckets) —
        :meth:`compact` stays the O(table) pass that also settles an
        evolved schema under one widest footer."""
        for _ in range(max_retries):
            snap = self.snapshot()
            if not snap.get("n_buckets"):
                raise ValueError("compact_buckets needs a bucketed table")
            fb = snap["file_buckets"]
            counts: dict[int, int] = {}
            for b in fb.values():
                counts[b] = counts.get(b, 0) + 1
            multi = {b for b, n in counts.items() if n > 1}
            if not multi:
                return {
                    "version": snap["version"],
                    "n_buckets_rewritten": 0,
                    "n_files_carried": len(snap["files"]),
                    "noop": True,
                }
            keep = [f for f in snap["files"] if fb[f] not in multi]
            rewrite = [f for f in snap["files"] if fb[f] in multi]
            df = spark.read.parquet(*[self.root + "/" + f for f in rewrite])
            new_map = self.stage_bucketed(
                df, tuple(snap["bucket_keys"]), snap["n_buckets"]
            )
            files = keep + sorted(new_map)
            meta = {
                "n_buckets": snap["n_buckets"],
                "bucket_keys": snap["bucket_keys"],
                "file_buckets": {**{f: fb[f] for f in keep}, **new_map},
            }
            try:
                version = self.commit(
                    files, snap["version"], bucket_meta=meta,
                    stat_cols=tuple(snap.get("stat_cols", ())),
                )
            except CommitConflict:
                continue
            return {
                "version": version,
                "n_buckets_rewritten": len(multi),
                "n_files_carried": len(keep),
                "noop": False,
            }
        raise CommitConflict(f"gave up after {max_retries} retries")

    def optimize(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 * 1024 * 1024,
        small_file_bytes: int | None = None,
        min_small_files: int = 4,
    ) -> dict:
        """Stats-driven maintenance router — the verb a scheduler calls
        without knowing the table's shape. Reads ONLY the manifest +
        file sizes (no data scan) and routes:

        * bucketed table whose appends have piled files past
          2 × n_buckets → :meth:`compact_buckets` (re-coalesces ONLY
          the multi-file buckets, carries the rest byte-identical);
        * unbucketed table with ≥ ``min_small_files`` files under the
          threshold → :meth:`compact_small` (O(small files));
        * otherwise → no-op (no version burned, no job submitted).

        The decision costs a directory-stat, so calling it after every
        ingest batch is safe; the expensive pass only runs when the
        manifest says fragmentation crossed the line."""
        snap = self.snapshot()
        if not snap["files"]:
            return {"action": "noop", "reason": "empty table"}
        if snap.get("n_buckets"):
            if len(snap["files"]) >= 2 * int(snap["n_buckets"]):
                ledger = self.compact_buckets(spark)
                return {"action": "compact_buckets", **ledger}
            return {"action": "noop", "reason": "buckets within bound"}
        small = (
            small_file_bytes
            if small_file_bytes is not None
            else target_file_bytes // 2
        )
        n_small = sum(
            1 for v in self._file_sizes(snap).values() if v < small
        )
        if n_small >= min_small_files:
            ledger = self.compact_small(
                spark, target_file_bytes, small_file_bytes
            )
            return {"action": "compact_small", **ledger}
        return {"action": "noop", "reason": f"{n_small} small files < {min_small_files}"}

    def vacuum(
        self,
        retain_versions: int = 1,
        min_file_age_s: float = 3600.0,
        dry_run: bool = False,
    ) -> int:
        """Delete data files referenced by NO retained manifest (crash
        orphans and files superseded more than ``retain_versions`` ago),
        AND the expired manifests themselves — a manifest whose files
        are gone is a dangling promise, so time travel past the retained
        window fails explicitly at snapshot resolution instead of at
        scan time. Returns the number of data files removed.

        ``dry_run=True`` is Delta's VACUUM DRY RUN: report how many data
        files WOULD be reclaimed under these settings and touch NOTHING
        — no manifest expiry, no checkpoint pin, no deletion, caches
        intact. The safety verb to run before the first horizoned vacuum
        on a table with live writers.

        ``min_file_age_s`` is the concurrent-writer horizon (Delta's
        retention-duration mitigation): an in-flight writer's staged
        files are referenced by NO manifest until its commit publishes,
        so a vacuum racing it would reclaim them as orphans and the
        commit would then name deleted files. Files younger than the
        horizon are never touched. The DEFAULT is a conservative 1 hour
        (ADVICE r10 — Delta defaults to hours-to-days for the same
        reason): safe-by-default when maintenance overlaps writers; set
        it above the longest write job's duration on busier tables, and
        pass 0 EXPLICITLY only when every writer is known quiesced
        (stop-the-world maintenance that reclaims crash orphans
        immediately)."""
        latest = self.latest_version()
        keep_versions = range(max(1, latest - retain_versions + 1), latest + 1)
        oldest_keep = keep_versions[0] if keep_versions else 0
        # resolve every retained snapshot BEFORE any manifest is removed
        # (delta chains may run through the versions being expired), and
        # pin the oldest retained version with a checkpoint so it keeps
        # resolving once its ancestors' JSONs are gone
        snaps = {v: self.snapshot(v) for v in keep_versions}
        if dry_run:
            live = {
                os.path.normpath(os.path.join(self.root, f))
                for v in keep_versions
                for f in snaps[v]["files"]
            }
            would = 0
            now = time.time()
            data_root = os.path.join(self.root, _DATA_DIR)
            for dirpath, _dirs, names in os.walk(data_root):
                for name in names:
                    p = os.path.normpath(os.path.join(dirpath, name))
                    if p not in live:
                        try:
                            young = (
                                min_file_age_s > 0
                                and now - os.path.getmtime(p) < min_file_age_s
                            )
                        except OSError:
                            continue  # vanished mid-walk (concurrent writer)
                        if not young:
                            would += 1
            return would
        if (
            oldest_keep
            and "fmt" in self._read_manifest_json(oldest_keep)
            and not os.path.exists(self._ckpt_path(oldest_keep))
        ):
            self._write_checkpoint(oldest_keep, snaps[oldest_keep])
        for name in os.listdir(os.path.join(self.root, _MANIFEST_DIR)):
            path = os.path.join(self.root, _MANIFEST_DIR, name)
            if name.startswith("v") and name.endswith(".json"):
                try:
                    v = int(name[1 : 1 + _V_DIGITS])
                except ValueError:
                    continue
                if v not in keep_versions:
                    os.remove(path)
            elif name.startswith("ckpt_v") and name.endswith(".parquet"):
                try:
                    v = int(name[len("ckpt_v") : len("ckpt_v") + _V_DIGITS])
                except ValueError:
                    continue
                if v < oldest_keep:
                    os.remove(path)
        self._snap_cache.clear()
        self._ts_cache.clear()
        live = {
            os.path.normpath(os.path.join(self.root, f))
            for v in keep_versions
            for f in snaps[v]["files"]
        }
        removed = 0
        now = time.time()
        data_root = os.path.join(self.root, _DATA_DIR)
        for dirpath, _dirs, names in os.walk(data_root, topdown=False):
            for name in names:
                p = os.path.normpath(os.path.join(dirpath, name))
                if p not in live:
                    try:
                        if (
                            min_file_age_s > 0
                            and now - os.path.getmtime(p) < min_file_age_s
                        ):
                            continue  # possibly an in-flight writer's staging
                        os.remove(p)
                    except OSError:
                        continue  # vanished mid-walk (concurrent vacuum/writer)
                    removed += 1
            try:
                if dirpath != data_root and not os.listdir(dirpath):
                    os.rmdir(dirpath)
            except OSError:
                pass
        return removed


def merge_upsert(
    table: ManifestTable,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    max_retries: int = 5,
    n_buckets: int | None = None,
    schema_evolution: bool = False,
    stat_cols: tuple[str, ...] = (),
    txn: tuple[str, int] | None = None,
    delete_keys: DataFrame | None = None,
) -> int:
    """Keyed MERGE (upsert) through the manifest protocol: rows in
    ``updates`` replace same-key rows of the current snapshot, unseen
    keys survive (anti-join ⊎ updates — the CDC-sink / Delta-MERGE
    shape). Optimistic: a conflicting commit re-drives the merge from
    the NEW snapshot, so concurrent mergers serialize without locks.

    PARTIAL REWRITE (round 8): pass ``n_buckets`` on the first merge to
    hash-bucket the table by key. Every later merge then derives the
    buckets its update keys land in, reads and rewrites ONLY those
    buckets' files, and carries every untouched bucket's files into the
    new manifest verbatim — commit cost scales with the delta's key
    spread, not the table (a 1-user update against a 1B-user store
    rewrites 1/n_buckets of it, and the untouched files are reused
    byte-identical, which the tests pin by path). Unbucketed tables
    keep the whole-snapshot rewrite — correct at any size, linear cost.
    Bucket shape is table metadata: later merges inherit it and reject
    mismatched keys.

    ``stat_cols`` (first merge) records per-file [min, max] zone maps in
    every manifest so ``read_range`` can skip files; later merges
    inherit the table's stat columns.

    ``schema_evolution=True`` lets ``updates`` WIDEN the table: new
    columns merge in, existing rows (and old data files) read them as
    null; reads of an evolved table need ``merge_schema=True`` until a
    compaction rewrites every file under the widest schema. Off by
    default so an accidental column rename surfaces as an
    analysis error instead of silently forking the schema.

    ``txn=(app_id, txn_id)`` makes the merge EXACTLY-ONCE under replay:
    if the snapshot already records ``txn_id`` (or newer) for
    ``app_id``, the merge returns the current version without staging a
    byte — the idempotent-foreachBatch contract a streaming sink needs
    when its checkpoint replays a batch whose commit DID land before
    the crash.

    ``delete_keys`` (rows carrying at least ``key_cols``) removes those
    keys in the same atomic commit — the WHEN MATCHED DELETE leg;
    :func:`merge_apply` builds on it to apply a full CDC feed."""
    spark = updates.sparkSession
    updates = table._validate(updates)
    keys = list(key_cols)
    change_keys = updates.select(*keys)
    if delete_keys is not None:
        change_keys = change_keys.unionByName(delete_keys.select(*keys))
    for _ in range(max_retries):
        snap = table.snapshot()
        if txn is not None and int(
            snap.get("txns", {}).get(txn[0], -1)
        ) >= int(txn[1]):
            return snap["version"]
        # ``or`` (not "if files"): a schema-bearing EMPTY bucketed v1
        # (e.g. cdc_stream's raw.limit(0) seed) has files == [] but real
        # bucket metadata — dropping it here would silently degrade the
        # table to unbucketed full-table merges for every later batch.
        nb = snap.get("n_buckets") or n_buckets
        if snap.get("n_buckets") and list(snap["bucket_keys"]) != keys:
            raise ValueError(
                f"table is bucketed by {snap['bucket_keys']}, merge keyed "
                f"by {keys} cannot route buckets"
            )
        if snap["files"] and snap.get("n_buckets"):
            fb = snap["file_buckets"]
            touched = {
                r["b"]
                for r in change_keys.select(
                    _bucket_of(tuple(keys), nb).alias("b")
                ).distinct().collect()
            }
            keep_files = [f for f in snap["files"] if fb[f] not in touched]
            rewrite_files = [f for f in snap["files"] if fb[f] in touched]
            if rewrite_files:
                reader = spark.read
                if schema_evolution:
                    reader = reader.option("mergeSchema", "true")
                old = reader.parquet(
                    *[table.root + "/" + f for f in rewrite_files]
                )
                merged = old.join(
                    change_keys, keys, "left_anti"
                ).unionByName(updates, allowMissingColumns=schema_evolution)
            else:
                merged = updates
            new_map = table.stage_bucketed(merged, tuple(keys), nb)
            files = keep_files + sorted(new_map)
            meta = {
                "n_buckets": nb,
                "bucket_keys": keys,
                "file_buckets": {
                    **{f: fb[f] for f in keep_files},
                    **new_map,
                },
            }
        else:
            if snap["files"]:
                old = table.read(
                    spark, snap["version"], merge_schema=schema_evolution
                )
                merged = old.join(
                    change_keys, keys, "left_anti"
                ).unionByName(updates, allowMissingColumns=schema_evolution)
            else:
                merged = updates
            if nb:
                new_map = table.stage_bucketed(merged, tuple(keys), nb)
                files = sorted(new_map)
                meta = {
                    "n_buckets": nb,
                    "bucket_keys": keys,
                    "file_buckets": new_map,
                }
            else:
                files, meta = table.stage(merged), None
        try:
            return table.commit(
                files,
                snap["version"],
                bucket_meta=meta,
                stat_cols=tuple(snap.get("stat_cols") or stat_cols),
                txn=txn,
            )
        except CommitConflict:
            continue
    raise CommitConflict(f"gave up after {max_retries} retries")


def merge_apply(
    table: ManifestTable,
    changes: DataFrame,
    key_cols: tuple[str, ...],
    op_col: str = "op",
    seq_col: str | None = None,
    delete_ops: tuple[str, ...] = ("delete", "d"),
    max_retries: int = 5,
    n_buckets: int | None = None,
    schema_evolution: bool = False,
    stat_cols: tuple[str, ...] = (),
    txn: tuple[str, int] | None = None,
) -> int:
    """Apply a CDC change feed — rows tagged insert/update/delete — to
    the table in ONE atomic commit: the consumer side of a Debezium /
    table-changes stream. ``changes`` carries the payload columns plus
    ``op_col``; ops in ``delete_ops`` (case-insensitive) remove the key,
    anything else upserts the row.

    ``seq_col`` (an ordering column: LSN, commit ts, version) collapses
    multi-event keys to their LAST event before applying — without it a
    key may appear at most once per feed (violations raise, because
    silently applying both orders of {update, delete} forks replicas).
    Collapse-then-apply is what makes the op NET-EFFECT semantics: a key
    whose history ends in delete is absent even if inserted in the same
    feed, and the whole feed costs one window (or none) + one merge,
    whatever its event count. Bucketed tables route BOTH upserts and
    deletes to their buckets, so the commit still rewrites only touched
    buckets; ``txn`` gives replayed feeds the exactly-once skip."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    keys = list(key_cols)
    payload = [c for c in changes.columns if c not in (op_col, seq_col)]
    op_norm = F.lower(F.col(op_col).cast("string"))
    if seq_col is not None:
        w = W.partitionBy(*keys).orderBy(
            F.col(seq_col).desc(), op_norm.desc()
        )
        last = (
            changes.withColumn("__sbp_rn", F.row_number().over(w))
            .filter(F.col("__sbp_rn") == 1)
            .drop("__sbp_rn")
        )
    else:
        dup = (
            changes.groupBy(*keys).count().filter(F.col("count") > 1).limit(1)
        )
        if dup.take(1):
            raise ValueError(
                "merge_apply without seq_col requires at most one change "
                "per key; pass seq_col to collapse multi-event keys"
            )
        last = changes
    is_delete = op_norm.isin([o.lower() for o in delete_ops])
    upserts = last.filter(~is_delete).select(*payload)
    deletes = last.filter(is_delete).select(*keys)
    return merge_upsert(
        table,
        upserts,
        tuple(keys),
        max_retries=max_retries,
        n_buckets=n_buckets,
        schema_evolution=schema_evolution,
        stat_cols=stat_cols,
        txn=txn,
        delete_keys=deletes,
    )


def merge_into(
    table: ManifestTable,
    source: DataFrame,
    key_cols: tuple[str, ...],
    matched_update: dict[str, str] | None = None,
    matched_update_condition: str | None = None,
    matched_delete_condition: str | None = None,
    insert_unmatched: bool = True,
    insert_condition: str | None = None,
    max_retries: int = 5,
    n_buckets: int | None = None,
    txn: tuple[str, int] | None = None,
    schema_evolution: bool = False,
) -> int:
    """Conditional MERGE (the full Delta/SQL:2003 MERGE INTO statement,
    where :func:`merge_upsert` is the replace-whole-row special case):

    * WHEN MATCHED [AND ``matched_delete_condition``] THEN DELETE
    * WHEN MATCHED [AND ``matched_update_condition``] THEN UPDATE SET
      ``matched_update`` — {target column: SQL expression over ``t.*``
      (current row) and ``s.*`` (source row)}, unlisted columns keep
      their target values; matched rows failing both conditions stay
      byte-for-byte (delete is tested first, as in Delta)
    * WHEN NOT MATCHED [AND ``insert_condition`` over ``s.*``] THEN
      INSERT (source must carry every target column; extra source
      columns are join inputs only and never land)

    Execution is ONE plan over the touched region: full-outer join of
    region rows with the (broadcast-eligible) source on the keys, one
    CASE per column — no per-leg passes. Bucketed tables rewrite only
    the buckets holding source keys and carry every other file
    byte-identical, exactly like merge_upsert; ``txn`` gives replays
    the exactly-once skip. Duplicate source keys raise (two legs
    updating one target row is nondeterministic — same rule as Delta),
    which costs one O(source) aggregate, never an O(table) pass.

    ``schema_evolution=True`` is Delta's automatic MERGE evolution:
    source columns absent from the target are ADDED (existing rows read
    NULL), update expressions may set them, and the insert leg fills
    target-only columns the source lacks with NULL instead of raising.
    As with merge_upsert, read the evolved table with
    ``merge_schema=True`` until a compaction settles every file under
    the widest schema."""
    from pyspark.sql import functions as F

    spark = source.sparkSession
    keys = list(key_cols)
    matched_update = dict(matched_update or {})
    if source.groupBy(*keys).count().filter(F.col("count") > 1).take(1):
        raise ValueError(
            "merge_into source has duplicate keys: collapse the feed first "
            "(merge_apply seq_col does this for CDC streams)"
        )

    def rewrite(region: DataFrame) -> DataFrame:
        if schema_evolution:
            for fld in source.schema.fields:
                if fld.name not in region.columns:
                    region = region.withColumn(
                        fld.name, F.lit(None).cast(fld.dataType)
                    )
        tcols = region.columns
        missing = [c for c in tcols if c not in source.columns]
        if insert_unmatched and missing and not schema_evolution:
            raise ValueError(
                f"insert leg needs every target column in the source; "
                f"missing {missing} — pass insert_unmatched=False for "
                f"an update/delete-only merge, or schema_evolution=True "
                f"to fill them with NULL"
            )
        # LEFT join + anti-join insert leg, never a full outer: both legs
        # are broadcast-eligible on the (usually small) source, so the
        # region — the big side — is scanned WITHOUT being shuffled. A
        # full-outer equi-join would force a key shuffle of the whole
        # region even for a one-row source.
        src = source.withColumn("__s", F.lit(1)).alias("s")
        tgt = region.alias("t")
        cond = F.lit(True)
        for k in keys:
            cond = cond & (F.col(f"t.{k}") == F.col(f"s.{k}"))
        j = tgt.join(src, cond, "left_outer")
        matched = F.col("s.__s").isNotNull()
        # SQL/Delta MERGE treats a NULL leg condition as NOT satisfied —
        # coalesce to False so three-valued logic can't make
        # ~(matched & NULL) silently DROP the row from the kept set
        # (filter discards NULL predicates, which turned "condition
        # unknown" into a delete).
        del_c = (
            F.coalesce(F.expr(matched_delete_condition), F.lit(False))
            if matched_delete_condition
            else F.lit(False)
        )
        upd_c = (
            F.coalesce(F.expr(matched_update_condition), F.lit(False))
            if matched_update_condition
            else F.lit(True)
        )
        updated = matched & ~del_c & upd_c & F.lit(bool(matched_update))
        kept = j.filter(~(matched & del_c))
        out = []
        for c in tcols:
            val = F.col(f"t.{c}")
            if c in matched_update:
                val = F.when(updated, F.expr(matched_update[c])).otherwise(val)
            out.append(val.alias(c))
        result = kept.select(*out)
        if insert_unmatched:
            ins_c = (
                F.coalesce(F.expr(insert_condition), F.lit(False))
                if insert_condition
                else F.lit(True)
            )
            inserts = (
                source.alias("s")
                .join(region.select(*keys), keys, "left_anti")
                .filter(ins_c)
            )
            if schema_evolution and missing:
                types = {f.name: f.dataType for f in region.schema.fields}
                for c in missing:
                    inserts = inserts.withColumn(
                        c, F.lit(None).cast(types[c])
                    )
            result = result.unionByName(inserts.select(*tcols))
        return result

    for _ in range(max_retries):
        snap = table.snapshot()
        if not snap["files"]:
            raise ValueError(
                "merge_into needs an existing target; create the table "
                "first (overwrite / append / merge_upsert)"
            )
        if txn is not None and int(
            snap.get("txns", {}).get(txn[0], -1)
        ) >= int(txn[1]):
            return snap["version"]
        nb = snap.get("n_buckets") or n_buckets
        if snap.get("n_buckets"):
            if list(snap["bucket_keys"]) != keys:
                raise ValueError(
                    f"table is bucketed by {snap['bucket_keys']}, merge keyed "
                    f"by {keys} cannot route buckets"
                )
            fb = snap["file_buckets"]
            touched = {
                r["b"]
                for r in source.select(
                    _bucket_of(tuple(keys), nb).alias("b")
                ).distinct().collect()
            }
            keep_files = [f for f in snap["files"] if fb[f] not in touched]
            rewrite_files = [f for f in snap["files"] if fb[f] in touched]
            reader = spark.read
            if schema_evolution:
                reader = reader.option("mergeSchema", "true")
            region = (
                reader.parquet(*[table.root + "/" + f for f in rewrite_files])
                if rewrite_files
                else table.read(
                    spark, snap["version"], merge_schema=schema_evolution
                ).limit(0)
            )
            rewritten = rewrite(region)
            merged = table._validate(rewritten.select(*rewritten.columns))
            new_map = table.stage_bucketed(merged, tuple(keys), nb)
            files = keep_files + sorted(new_map)
            meta = {
                "n_buckets": nb,
                "bucket_keys": keys,
                "file_buckets": {**{f: fb[f] for f in keep_files}, **new_map},
            }
        else:
            merged = table._validate(
                rewrite(
                    table.read(
                        spark, snap["version"], merge_schema=schema_evolution
                    )
                )
            )
            if nb:
                new_map = table.stage_bucketed(merged, tuple(keys), nb)
                files, meta = sorted(new_map), {
                    "n_buckets": nb,
                    "bucket_keys": keys,
                    "file_buckets": new_map,
                }
            else:
                files, meta = table.stage(merged), None
        try:
            return table.commit(
                files,
                snap["version"],
                bucket_meta=meta,
                stat_cols=tuple(snap.get("stat_cols", ())),
                txn=txn,
            )
        except CommitConflict:
            continue
    raise CommitConflict(f"gave up after {max_retries} retries")


def _touched_files(
    table: ManifestTable, spark: SparkSession, snap: dict, condition: str
) -> list[str]:
    """Root-relative data files that contain at least one row matching
    ``condition`` — the file-pruning pass behind UPDATE/DELETE: one
    scan with the predicate PUSHED DOWN (parquet row-group stats and
    manifest zone maps both help), emitting only distinct file names.
    Files with no matching row are carried into the next version
    byte-identical, so the rewrite cost is O(files with matches), not
    O(table)."""
    from pyspark.sql import functions as F

    rows = (
        table.read(spark, snap["version"])
        .filter(F.expr(condition))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    prefix = "file://" + os.path.abspath(table.root) + "/"
    touched = set()
    for r in rows:
        p = r["f"]
        if p.startswith(prefix):
            touched.add(p[len(prefix):])
        else:  # no scheme (local FS without file:// normalization)
            touched.add(os.path.relpath(p, os.path.abspath(table.root)))
    return [f for f in snap["files"] if f in touched]


def delete_where(
    table: ManifestTable,
    spark: SparkSession,
    condition: str,
    max_retries: int = 5,
    txn: tuple[str, int] | None = None,
) -> dict:
    """DELETE FROM table WHERE condition, as one atomic commit: files
    containing matching rows are rewritten with the predicate inverted;
    every other file is carried byte-identical (see
    :func:`_touched_files`). Bucketed tables restage the touched rows
    bucket-partitioned so the bucket map stays exact. Returns a ledger
    {version, n_files_touched, n_files_carried}."""
    from pyspark.sql import functions as F

    for _ in range(max_retries):
        snap = table.snapshot()
        if not snap["files"]:
            raise ValueError("delete_where needs an existing table")
        if txn is not None and int(
            snap.get("txns", {}).get(txn[0], -1)
        ) >= int(txn[1]):
            return {"version": snap["version"], "n_files_touched": 0,
                    "n_files_carried": len(snap["files"]), "noop": True}
        touched = _touched_files(table, spark, snap, condition)
        if not touched:
            return {"version": snap["version"], "n_files_touched": 0,
                    "n_files_carried": len(snap["files"]), "noop": True}
        keep = [f for f in snap["files"] if f not in set(touched)]
        remainder = spark.read.parquet(
            *[table.root + "/" + f for f in touched]
        ).filter(~F.coalesce(F.expr(condition), F.lit(False)))
        if snap.get("n_buckets"):
            new_map = table.stage_bucketed(
                remainder, tuple(snap["bucket_keys"]), snap["n_buckets"]
            )
            fb = snap["file_buckets"]
            files = keep + sorted(new_map)
            meta = {
                "n_buckets": snap["n_buckets"],
                "bucket_keys": snap["bucket_keys"],
                "file_buckets": {**{f: fb[f] for f in keep}, **new_map},
            }
        else:
            files, meta = keep + table.stage(remainder), None
        try:
            version = table.commit(
                files, snap["version"], bucket_meta=meta,
                stat_cols=tuple(snap.get("stat_cols", ())), txn=txn,
            )
        except CommitConflict:
            continue
        return {"version": version, "n_files_touched": len(touched),
                "n_files_carried": len(keep), "noop": False}
    raise CommitConflict(f"gave up after {max_retries} retries")


def update_where(
    table: ManifestTable,
    spark: SparkSession,
    set_exprs: dict[str, str],
    condition: str,
    max_retries: int = 5,
    txn: tuple[str, int] | None = None,
) -> dict:
    """UPDATE table SET col = expr, ... WHERE condition, as one atomic
    commit with the same touched-file pruning as :func:`delete_where`:
    only files holding matching rows rewrite (non-matching rows in
    those files are carried through the rewrite unchanged), everything
    else is reused byte-identical. On bucketed tables the bucket KEY
    columns cannot be updated (a key change moves the row's bucket —
    that is a delete + insert, i.e. :func:`merge_apply`'s job). CHECK
    constraints validate the rewritten rows."""
    from pyspark.sql import functions as F

    for _ in range(max_retries):
        snap = table.snapshot()
        if not snap["files"]:
            raise ValueError("update_where needs an existing table")
        if snap.get("n_buckets"):
            bad = set(set_exprs) & set(snap["bucket_keys"])
            if bad:
                raise ValueError(
                    f"cannot update bucket key columns {sorted(bad)}; "
                    f"route a key change as delete+insert (merge_apply)"
                )
        if txn is not None and int(
            snap.get("txns", {}).get(txn[0], -1)
        ) >= int(txn[1]):
            return {"version": snap["version"], "n_files_touched": 0,
                    "n_files_carried": len(snap["files"]), "noop": True}
        touched = _touched_files(table, spark, snap, condition)
        if not touched:
            return {"version": snap["version"], "n_files_touched": 0,
                    "n_files_carried": len(snap["files"]), "noop": True}
        keep = [f for f in snap["files"] if f not in set(touched)]
        region = spark.read.parquet(*[table.root + "/" + f for f in touched])
        hit = F.coalesce(F.expr(condition), F.lit(False))
        cols = [
            F.when(hit, F.expr(set_exprs[c])).otherwise(F.col(c)).alias(c)
            if c in set_exprs
            else F.col(c)
            for c in region.columns
        ]
        rewritten = table._validate(region.select(*cols))
        if snap.get("n_buckets"):
            new_map = table.stage_bucketed(
                rewritten, tuple(snap["bucket_keys"]), snap["n_buckets"]
            )
            fb = snap["file_buckets"]
            files = keep + sorted(new_map)
            meta = {
                "n_buckets": snap["n_buckets"],
                "bucket_keys": snap["bucket_keys"],
                "file_buckets": {**{f: fb[f] for f in keep}, **new_map},
            }
        else:
            files, meta = keep + table.stage(rewritten), None
        try:
            version = table.commit(
                files, snap["version"], bucket_meta=meta,
                stat_cols=tuple(snap.get("stat_cols", ())), txn=txn,
            )
        except CommitConflict:
            continue
        return {"version": version, "n_files_touched": len(touched),
                "n_files_carried": len(keep), "noop": False}
    raise CommitConflict(f"gave up after {max_retries} retries")
