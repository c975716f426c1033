"""SnapshotTable — a self-contained, Iceberg-style copy-on-write table format.

The north_star sink is an Iceberg table with snapshot transactions and
MERGE upserts. The sandbox image has no Iceberg runtime jar, so this module
implements the same contract directly over parquet + JSON manifests; the
design deliberately mirrors Iceberg's Hadoop catalog so the engine code
above it is backend-agnostic:

- **Snapshots**: every commit writes an immutable JSON manifest
  ``snapshots/v%08d.json``, then flips ``version-hint.txt`` (Iceberg
  HadoopTableOperations does exactly this). Manifest creation is
  create-if-absent — optimistic concurrency: a racing writer loses and
  must retry on the new base snapshot. All metadata IO goes through a
  pluggable FileIO (``lake/file_io.py``, Iceberg's FileIO analogue)
  whose contract maps onto object-store conditional PUTs, so the commit
  protocol is not POSIX-bound.
- **Per-bucket manifest segments** (Iceberg's manifest-list → manifest
  split): the top manifest carries, per bucket, only a pointer
  ``{path, n, bytes}`` to an immutable ``segments/seg-*.json`` file
  holding that bucket's data-file entries. A commit writes new segment
  files ONLY for the buckets it touches and carries the other pointers
  forward, so metadata bytes written per commit are ∝ touched buckets —
  at 4096 buckets × long retention the top manifest stays a few hundred
  KB of pointers while file entries never get rewritten wholesale.
  Segment files are content-immutable, so readers cache them by path.
- **Copy-on-write MERGE**: data files are hash-bucketed on the first key
  column (``bucket(N, conv_id)`` in Iceberg partition-spec terms). A merge
  only reads & rewrites the buckets its batch touches — work per epoch is
  proportional to touched buckets, not table size. At 100 TB you raise
  ``num_buckets`` (e.g. 4096) so each bucket is a few GB; unaffected
  buckets are carried forward by reference in the manifest.
- **Merge-on-read MERGE** (``merge_upsert(mode="mor")``): copy-on-write
  degenerates when an epoch's keys spread across *all* buckets — the
  rewrite cost becomes ∝ table size per epoch. MoR instead writes the
  epoch's compacted winners (including delete tombstones) as small
  per-bucket **delta segments** and leaves the base files untouched:
  bytes written per epoch ∝ |batch|, never ∝ touched-bucket bytes
  (Iceberg v2 merge-on-read / Delta deletion-vector analogue, restated
  as LWW row deltas because this table's MERGE is pure LWW-by-LSN).
  Reads apply last-writer-wins over base ∪ deltas per key (``_fold_lww``:
  fixed-width hash-agg winners + one null-safe keyed join; the payload
  never sorts) and skip that work entirely for buckets with no deltas. ``compact_deltas()`` is the background
  maintenance job that folds deltas back into the base (conflict-safe
  against concurrent ingest via the same bucket-token validation).
- **Bucket-count evolution** (``rebucket``): ``num_buckets`` is chosen at
  CREATE for the table's *current* size; a table grown 100× needs a new
  spec. ``rebucket(new_num_buckets)`` rewrites the data under the new
  spec in one conflict-checked commit; concurrent merges that prepared
  under the old spec fail validation (or detect the spec change and
  recompute their bucket sets) and retry on the new base — ingest never
  observes a half-migrated layout.
- **Exactly-once epoch fencing**: the manifest carries
  ``epochs: {query_id: last_committed_epoch}`` updated *in the same atomic
  commit* as the data. A replayed ``foreachBatch`` epoch (after a crash
  between sink-commit and checkpoint-commit) is detected and skipped —
  the Iceberg equivalent is a snapshot summary property. Reference
  analogue: the reference has *no* exactly-once story (full wipe per run,
  ``cmd/main.go:165-177``); this is the capability the graft adds.
- **Schema evolution**: each manifest records the current schema plus a
  ``schemas`` history; every data file records which schema it was written
  with, and reads align each file group (missing columns → NULL, widened
  ints → cast up), so old files remain readable after ADD COLUMN / widening —
  Iceberg's reader-side schema resolution.

Reference analogues: the Neo4j sink (S9/S10,
``internal/infrastructure/persistence/neo4j/repository.go:46-95``) wrote
one Cypher statement per node/edge; here a whole micro-batch commits in
one snapshot. The delete-then-create upsert tick
(``simple_metrics_injector.go:170-213``) becomes the MERGE arms
(matched+delete → drop, matched → replace, not-matched → insert).
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sql_graph_visualizer_spark.lake.file_io import LocalFileIO
from sql_graph_visualizer_spark.operators.compaction import compact_lww
from sql_graph_visualizer_spark.schema_evolution import align_to_schema, evolve_schema

_SNAP_DIR = "snapshots"
_SEG_DIR = "segments"
_HINT = "version-hint.txt"
_DATA_DIR = "data"

# System columns (Iceberg row-lineage analogue). `_seq` is the source LSN
# of the row's winning version; `_deleted` marks a persisted tombstone.
# Tombstones must be kept (until expired past a replay horizon): a delete
# applied in epoch k must still beat a stale insert arriving in epoch k+1
# — Structured Streaming's file source does not guarantee LSN order across
# micro-batches, and crash-replay re-delivers events.
_SEQ = "_seq"
_DELETED = "_deleted"


def _refs_total_bytes(segments: dict[str, dict[str, Any]]) -> int:
    return sum(int(s.get("bytes", 0)) for s in segments.values())


def _murmur3_hash_long(v: int, seed: int = 42) -> int:
    """Spark's ``Murmur3_x86_32.hashLong`` (the hash behind
    ``HashPartitioning`` of a single bigint column), in pure Python —
    verified against ``F.hash`` in ``tests/test_lake.py``. Used to
    pre-compute a collision-free bucket→shuffle-partition assignment on
    the driver (guide §2.5: hashing n distinct bucket ids into n
    partitions leaves ~1/e of them empty and stacks 3-4 buckets on the
    unlucky ones — the write stage then runs at the pace of the worst
    task)."""

    def mix_k1(k1: int) -> int:
        k1 = (k1 * 0xCC9E2D51) & 0xFFFFFFFF
        k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
        return (k1 * 0x1B873593) & 0xFFFFFFFF

    def mix_h1(h1: int, k1: int) -> int:
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & 0xFFFFFFFF
        return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF

    h1 = mix_h1(seed & 0xFFFFFFFF, mix_k1(v & 0xFFFFFFFF))
    h1 = mix_h1(h1, mix_k1((v >> 32) & 0xFFFFFFFF))
    h1 ^= 8
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 - 0x100000000 if h1 >= 0x80000000 else h1


_PART_TOKEN_CACHE: dict[int, list[int]] = {}


def _partition_tokens(n: int) -> list[int]:
    """``tokens[b]`` = a bigint whose Murmur3 hash lands in shuffle
    partition ``b`` of an ``n``-partition HashPartitioning — so
    ``repartition(n, token_col)`` places each bucket in its own
    partition, one balanced write task per bucket, zero empty tasks.
    Coupon-collector search: ~n·ln(n) hash probes, cached per n."""
    tokens = _PART_TOKEN_CACHE.get(n)
    if tokens is not None:
        return tokens
    found: dict[int, int] = {}
    t = 0
    while len(found) < n:
        h = _murmur3_hash_long(t)
        p = ((h % n) + n) % n
        if p not in found:
            found[p] = t
        t += 1
    tokens = [found[b] for b in range(n)]
    _PART_TOKEN_CACHE[n] = tokens
    return tokens


def _contains_map(dt: T.DataType) -> bool:
    """True if the type tree contains a MapType anywhere. Spark's
    set-operation (``distinct``) type check is recursive — a map nested
    inside an array or struct is just as unhashable as a top-level one —
    so the ``_fold_lww`` guard must walk the whole tree, not only the
    top-level fields."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _fold_lww(staged: DataFrame, key_cols: list[str]) -> DataFrame:
    """Read-side LWW fold over base ∪ delta rows (merge-on-read).

    ``(key, _seq)`` is unique within any ONE generation (each generation
    writes a key at most once, LSNs are globally unique), so the winner
    filter is a fixed-width ``max(_seq)`` HashAggregate (map-side
    combined) plus one null-safe keyed equi-join. The payload shuffles
    once on the keys and is NEVER sorted — ``compact_lww``'s thin
    ``max_by`` dedupe would compile to a SortAggregate over the whole
    folded selection here (the plan-shape test asserts it stays out).
    Key equality must be null-safe: table keys may be NULL and a plain
    join would silently drop those rows.

    ACROSS generations the winning (key, _seq) can legitimately appear
    more than once: at-least-once delivery may re-deliver the winning
    event in a later epoch (a second delta segment), or after a
    compaction baked it into the base. The contract ("re-delivery of
    the winning event collapses to one row", and CoW honors it via
    ``compact_lww``) requires collapsing those ties here too. The rows
    are byte-identical by contract (two *different* payloads sharing
    (key, order) are a malformed log), so a full-row hash ``distinct``
    is exact — and stays HashAggregate: variable-width columns are fine
    as grouping KEYS; only variable-width agg BUFFERS trigger the
    SortAggregate trap. Map-typed columns cannot be grouping keys, so
    those schemas fall back to ``dropDuplicates`` on (key, _seq)."""
    winners = staged.groupBy(*key_cols).agg(F.max(_SEQ).alias("__max_seq"))
    s, w = staged.alias("s"), winners.alias("w")
    cond = F.col(f"s.{_SEQ}") == F.col("w.__max_seq")
    for k in key_cols:
        cond = cond & F.col(f"s.{k}").eqNullSafe(F.col(f"w.{k}"))
    folded = s.join(w, cond).select("s.*")
    if any(_contains_map(f.dataType) for f in staged.schema.fields):
        return folded.dropDuplicates(list(key_cols) + [_SEQ])
    return folded.distinct()


def _advance_watermark(
    commit: dict[str, Any],
    cur: dict[str, Any],
    query_id: str,
    max_seq: int,
    ordered: bool = True,
) -> None:
    """Advance the per-query committed-seq watermark inside a merge
    commit (same atomic manifest write as the data). The watermark is
    the table's replay-horizon knowledge — and it is an ORDERED-DELIVERY
    CLAIM by the writer: "my future epochs carry only LSNs above this".
    ``min(watermarks)`` then bounds the smallest LSN that can still
    arrive — the tombstone-expiry safety line.

    ``ordered=False`` is for writers that CANNOT make that claim (a
    Spark file-stream source delivers same-mtime files in arbitrary
    order, so a later epoch may carry smaller LSNs than an earlier
    one). Such a writer must not advance the watermark — and it must
    not stay absent either, because on a multi-writer table the OTHER
    writers' watermarks would then unlock expiry that the unordered
    writer can still resurrect past. It instead PINS the horizon by
    registering watermark -1 (safe horizon 0 = nothing expirable; LSNs
    are non-negative) until the operator, knowing the stream drained,
    calls ``advance_watermark()`` or retires it via
    ``drop_watermark()``.

    A pre-existing entry is kept as-is on the unordered path (claims
    never regress): reusing one ``query_id`` across an ordered backfill
    and an unordered tail keeps the backfill's claim, which is only
    sound if the tail carries strictly later LSNs — use distinct
    query_ids per phase when that isn't guaranteed."""
    wm = dict(cur.get("watermarks") or {})
    if not ordered:
        wm.setdefault(query_id, -1)
    elif max_seq >= 0:
        wm[query_id] = max(int(wm.get(query_id, -1)), int(max_seq))
    commit["watermarks"] = wm


def _union_schema_registries(
    cur_reg: dict[str, Any], ours_reg: dict[str, Any], path: str
) -> dict[str, Any]:
    """Union two manifest schema registries, our side winning only where
    both sides recorded the IDENTICAL schema under an id. A genuine
    collision — same id bound to two different schemas, possible because
    writers allocate ids locally — cannot be merged (file entries on
    both sides already reference the id) and must fail the commit."""
    merged = dict(cur_reg)
    for k, v in ours_reg.items():
        if k in merged and merged[k] != v:
            raise CommitConflictError(
                f"schema registry id collision on {path}: id {k} bound to "
                "two different schemas by concurrent writers"
            )
        merged[k] = v
    return merged


def _physical(schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(schema.fields)
        + [T.StructField(_SEQ, T.LongType()), T.StructField(_DELETED, T.BooleanType())]
    )


@dataclass
class MergeStats:
    """Per-epoch lineage record (FIXTURES.md §5 `lineage_metrics`)."""

    epoch_id: int
    rows_in: int
    upserts: int
    deletes: int
    buckets_touched: int
    skipped: bool
    duration_ms: int
    snapshot_version: int
    # phase breakdown (not persisted to lineage): winner-aggregation job
    # vs merge-write job — the observability hook for scaling analysis
    stats_ms: int = 0
    write_ms: int = 0
    # data bytes this commit added (sum of its new data-file sizes) — the
    # observable that distinguishes CoW (∝ touched-bucket bytes) from MoR
    # (∝ |batch|); also recorded in the manifest summary
    bytes_written: int = 0
    # batch-wide max LSN of a committed (non-skipped) epoch; -1 when
    # unknown — lets a drained replay compute the watermark to unpin with
    max_seq: int = -1

    def as_dict(self) -> dict[str, Any]:
        return self.__dict__.copy()


class TombstoneHorizonError(ValueError):
    """Refused tombstone expiry: the requested horizon exceeds the
    minimum committed seq watermark across this table's writers, so a
    lagging replay (a writer whose next epochs still carry smaller
    LSNs) could re-deliver a pre-delete event and resurrect the deleted
    row once its tombstone is gone. Wait for the laggard to advance, or
    pass ``force=True`` if the stream is provably drained."""


class CommitConflictError(RuntimeError):
    """A concurrent commit invalidated this one: it rewrote one of the
    buckets this merge read (its existing-rows snapshot is stale) or
    evolved the schema underneath it. The caller must re-run the merge
    on the new base snapshot — Iceberg's validation-failure semantics.
    Non-overlapping commits never raise: they are rebased and retried."""


@dataclass
class PreparedMerge:
    """Result of the winner-aggregation job (``merge_prepare``) — the
    schema-independent half of a MERGE, computable before earlier epochs
    have committed, which is what lets a replay pipeline epoch N+1's
    aggregation under epoch N's write."""

    winners: DataFrame  # persisted: key_cols + order_col + __del
    rows_in: int
    deletes: int
    affected: list[int]
    stats_ms: int
    # batch-wide max LSN — committed into the manifest's per-query seq
    # watermark (the tombstone-expiry safety horizon)
    max_seq: int = -1
    # Optional: sc.broadcast of the SORTED winner LSNs (int64 ndarray),
    # pre-collected during prepare. When present, the write phase filters
    # survivors with a vectorized Arrow UDF against this array instead of
    # building a broadcast-hash-join relation — the collect + relation
    # build (~0.5-1 s of driver-serial time per epoch at 500k winners)
    # moves into the prepare job, which the pipelined replay overlaps
    # with the previous epoch's write. Per-epoch serial cost is what
    # strong-scaling efficiency pays for at every cluster size.
    winner_seqs: Any = None
    # bucket spec the affected-bucket set was computed under; if a
    # rebucket (monolithic or a progressive-migration frontier advance)
    # commits between prepare and upsert, merge_upsert detects the
    # mismatch and recomputes `affected` under the new routing instead
    # of pruning the wrong buckets
    num_buckets: int = 0
    spec_token: str = ""


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str, io: LocalFileIO | None = None):
        self.spark = spark
        self.path = path
        # metadata-plane IO (manifests/hints/listings) — pluggable, see
        # lake/file_io.py for the object-store mapping of each primitive
        self.io = io or LocalFileIO()
        # segment files are immutable once written → cache by rel path;
        # bounded LRU (a sustained-mode writer otherwise accretes every
        # segment it ever wrote, including commit-retry orphans) and
        # expire_snapshots evicts the paths it deletes
        from collections import OrderedDict

        self._seg_cache: "OrderedDict[str, list[dict[str, Any]]]" = OrderedDict()
        self._seg_cache_max = 4096
        # manifest files are immutable per version → cache their TEXT
        # (parsed fresh per call: callers mutate the dicts). Shaves the
        # per-epoch serial metadata round-trips — on an object store each
        # avoided read is a GET on the commit critical path, which is
        # what strong-scaling efficiency pays for at any cluster size.
        self._man_cache: "OrderedDict[int, str]" = OrderedDict()
        self._man_cache_max = 16
        # One lock guards BOTH LRUs: async maintenance
        # (``maybe_compact_deltas(pool=...)`` / ``auto_compact_async``)
        # folds deltas on the SAME instance that a replay loop is merging
        # through, and an unsynchronized contains-check → move_to_end →
        # read sequence racing a popitem eviction raises KeyError mid-run.
        # The lock covers dict ops only — file IO happens outside it.
        self._cache_lock = threading.Lock()
        # Versions pinned against expire_snapshots by THIS process: a
        # lazy plan built over an old snapshot (e.g. MinHashIndex's
        # pre-batch probe) stays evaluable until released. In-memory by
        # design — pins die with the process that owns the plans they
        # protect; cross-process readers use retention (keep_last).
        self._pinned_versions: set[int] = set()

    # ------------------------------------------------------------------ DDL

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_cols: list[str],
        bucket_col: str | None = None,
        num_buckets: int = 32,
        io: LocalFileIO | None = None,
    ) -> "SnapshotTable":
        t = cls(spark, path, io)
        t.io.makedirs(os.path.join(path, _SNAP_DIR))
        t.io.makedirs(os.path.join(path, _SEG_DIR))
        t.io.makedirs(os.path.join(path, _DATA_DIR))
        manifest = {
            "version": 1,
            "schema_id": 0,
            "schemas": {"0": schema.jsonValue()},
            "key_cols": key_cols,
            "bucket_col": bucket_col or key_cols[0],
            "num_buckets": num_buckets,
            # bucket(str) -> {"path": segments/seg-*.json, "n": int, "bytes": int}
            "segments": {},
            # bucket(str) -> [ref, ...]: merge-on-read delta segments, LWW-applied
            # over the base at read time until compact_deltas() folds them
            "deltas": {},
            "epochs": {},
            "summary": {"operation": "create"},
            "parent": None,
        }
        t._write_manifest(manifest)
        return t

    @classmethod
    def exists(cls, path: str, io: LocalFileIO | None = None) -> bool:
        return (io or LocalFileIO()).exists(os.path.join(path, _HINT))

    # ----------------------------------------------------------- manifests

    def _current_version(self) -> int:
        """Manifest-file creation is the commit point; the version hint
        is a cache (Iceberg Hadoop-table semantics). A crash between the
        two leaves the hint stale, so walk forward from the hinted
        version to the newest existing manifest — one extra exists()
        probe in the common case — and repair the hint best-effort.
        Without this, every later commit would rebuild the same version,
        collide with the orphan manifest forever, and brick the table."""
        v = int(self.io.read_text(os.path.join(self.path, _HINT)).strip())
        ahead = v
        while self.io.exists(os.path.join(self.path, _SNAP_DIR, f"v{ahead + 1:08d}.json")):
            ahead += 1
        if ahead != v:
            # best-effort: a read-only FileIO (or a store that denies the
            # writer) must not turn a pure read into a failure — the next
            # writer will repair the hint
            try:
                self.io.replace_atomic(os.path.join(self.path, _HINT), str(ahead))
            except OSError:
                pass
        return ahead

    def manifest(self, version: int | None = None) -> dict[str, Any]:
        """Current manifest, or a historical one for time travel (the
        Iceberg `VERSION AS OF` analogue — any unexpired snapshot is a
        complete, immutable description of the table at that commit).
        Text is cached by version (immutable once created); each call
        parses a fresh dict because callers mutate manifests in place."""
        v = self._current_version() if version is None else int(version)
        with self._cache_lock:
            cached = self._man_cache.get(v)
            if cached is not None:
                self._man_cache.move_to_end(v)
        if cached is not None:
            return json.loads(cached)
        text = self.io.read_text(os.path.join(self.path, _SNAP_DIR, f"v{v:08d}.json"))
        with self._cache_lock:
            self._man_cache[v] = text
            while len(self._man_cache) > self._man_cache_max:
                self._man_cache.popitem(last=False)
        return json.loads(text)

    def versions(self) -> list[int]:
        """All retained snapshot versions (ascending)."""
        snap_dir = os.path.join(self.path, _SNAP_DIR)
        return sorted(
            int(f[1:9]) for f in self.io.listdir(snap_dir) if f.startswith("v") and f.endswith(".json")
        )

    def pin_version(self, version: int) -> None:
        """Keep ``version`` (manifest + every file it references) safe
        from ``expire_snapshots`` run by THIS table instance, until
        ``unpin_version``. Use when a lazy plan over an old snapshot
        must stay evaluable across maintenance (the probe-vs-GC race,
        VERDICT r6 #5)."""
        with self._cache_lock:
            self._pinned_versions.add(int(version))

    def unpin_version(self, version: int) -> None:
        with self._cache_lock:
            self._pinned_versions.discard(int(version))

    def _commit_with_rebase(
        self,
        build,
        epoch_id: int,
        query_id: str,
        first: dict[str, Any],
        validate=None,
        attempts: int = 5,
    ) -> dict[str, Any] | None:
        """Optimistic-concurrency commit loop (Iceberg retry semantics):
        write the manifest ``build(base)`` produces; on a lost race
        re-read the new base, re-check the epoch fence (returns None if
        another writer committed this epoch meanwhile), run ``validate``
        (raises CommitConflictError when this commit's inputs are stale),
        then rebase and retry. Commits that touch disjoint buckets
        therefore interleave without data loss."""
        cur = first
        for _ in range(attempts):
            commit = build(cur)
            try:
                self._write_manifest(commit)
                return commit
            except FileExistsError:
                cur = self.manifest()
                if epoch_id >= 0 and int(cur["epochs"].get(query_id, -1)) >= epoch_id:
                    return None
                if validate is not None:
                    validate(cur)
        raise CommitConflictError(f"lost {attempts} commit races on {self.path}")

    def _write_manifest(self, manifest: dict[str, Any]) -> None:
        """Atomic commit: O_EXCL manifest create (optimistic lock), then
        atomic rename of the version hint."""
        v = manifest["version"]
        mpath = os.path.join(self.path, _SNAP_DIR, f"v{v:08d}.json")
        text = json.dumps(manifest)
        # raises FileExistsError on a lost commit race (optimistic lock)
        self.io.create_exclusive(mpath, text)
        # seed the cache: the next epoch's manifest() hits it without IO
        with self._cache_lock:
            self._man_cache[int(v)] = text
            while len(self._man_cache) > self._man_cache_max:
                self._man_cache.popitem(last=False)
        self.io.replace_atomic(os.path.join(self.path, _HINT), str(v))

    def schema(self) -> T.StructType:
        m = self.manifest()
        return T.StructType.fromJson(m["schemas"][str(m["schema_id"])])

    def last_committed_epoch(self, query_id: str) -> int:
        return int(self.manifest()["epochs"].get(query_id, -1))

    def size_stats(self, version: int | None = None) -> dict[str, int]:
        """Dataset size estimate straight from manifest metadata — no data
        OR segment IO (S8: the reference sums information_schema
        data_length + index_length, ``mysql/repository.go:492-538``;
        Iceberg exposes the same as the total-files-size snapshot
        summary). Per-bucket (n, bytes) ride in the segment pointers, so
        this is O(buckets) arithmetic."""
        m = self.manifest(version)
        if "segments" in m:
            refs = m["segments"]
            deltas = [ref for refs_ in self._delta_refs(m).values() for ref in refs_]
            return {
                "total_files": sum(int(s.get("n", 0)) for s in refs.values())
                + sum(int(r.get("n", 0)) for r in deltas),
                "total_bytes": _refs_total_bytes(refs)
                + sum(int(r.get("bytes", 0)) for r in deltas),
                "buckets": len(refs),
            }
        entries = [e for fs in m["files"].values() for e in fs]  # legacy inline
        return {
            "total_files": len(entries),
            "total_bytes": sum(int(e.get("bytes", 0)) for e in entries),
            "buckets": len(m["files"]),
        }

    # ------------------------------------------------------------ segments

    def _load_segment(self, rel: str) -> list[dict[str, Any]]:
        """One bucket's data-file entries; segment files are immutable →
        cached by path (manifest-churn never invalidates them; bounded
        LRU so a long-lived writer's memory stays flat)."""
        with self._cache_lock:
            cached = self._seg_cache.get(rel)
            if cached is not None:
                self._seg_cache.move_to_end(rel)
                return cached
        entries = json.loads(self.io.read_text(os.path.join(self.path, rel)))
        with self._cache_lock:
            self._seg_cache[rel] = entries
            while len(self._seg_cache) > self._seg_cache_max:
                self._seg_cache.popitem(last=False)
        return entries

    def _write_segment(self, entries: list[dict[str, Any]]) -> dict[str, Any]:
        """Write an immutable segment file; returns its manifest pointer
        (path + the stats size_stats serves without opening it)."""
        rel = os.path.join(_SEG_DIR, f"seg-{uuid.uuid4().hex[:16]}.json")
        self.io.create_exclusive(os.path.join(self.path, rel), json.dumps(entries))
        with self._cache_lock:
            self._seg_cache[rel] = entries
            while len(self._seg_cache) > self._seg_cache_max:
                self._seg_cache.popitem(last=False)
        return {
            "path": rel,
            "n": len(entries),
            "bytes": sum(int(e.get("bytes", 0)) for e in entries),
        }

    def _entries(
        self, m: dict[str, Any], buckets: list[int] | None = None
    ) -> list[dict[str, Any]]:
        """Data-file entries for the selected buckets — bucket pruning
        happens HERE, before any segment (let alone data) file is opened.
        Handles both the segmented format and legacy inline ``files``."""
        out: list[dict[str, Any]] = []
        if "segments" in m:
            for b, ref in m["segments"].items():
                if buckets is None or int(b) in buckets:
                    out.extend(self._load_segment(ref["path"]))
            return out
        for b, fs in m["files"].items():  # legacy inline
            if buckets is None or int(b) in buckets:
                out.extend(fs)
        return out

    def _seg_refs_for_write(self, cur: dict[str, Any]) -> dict[str, dict[str, Any]]:
        """Current manifest's bucket → segment pointer map, as the base a
        commit mutates. A legacy inline-``files`` manifest is migrated on
        first write (one segment per existing bucket)."""
        if "segments" in cur:
            return dict(cur["segments"])
        return {b: self._write_segment(list(fs)) for b, fs in cur["files"].items()}

    @staticmethod
    def _delta_refs(m: dict[str, Any]) -> dict[str, list[dict[str, Any]]]:
        """bucket(str) → ordered list of merge-on-read delta segment refs
        (empty for pre-MoR manifests)."""
        return m.get("deltas") or {}

    def _delta_entries(
        self, m: dict[str, Any], buckets: list[int] | None = None
    ) -> list[dict[str, Any]]:
        """Data-file entries of the selected buckets' delta segments —
        same bucket pruning discipline as the base ``_entries``."""
        out: list[dict[str, Any]] = []
        for b, refs in self._delta_refs(m).items():
            if buckets is None or int(b) in buckets:
                for ref in refs:
                    out.extend(self._load_segment(ref["path"]))
        return out

    def _retag_segment(self, ref: dict[str, Any], schema_id: int) -> dict[str, Any]:
        """Rewrite a (just-written, this-commit) segment's entries to
        point at a rebased schema id. Segment files are immutable, so a
        NEW segment file is written — ∝ this batch's file count of JSON
        metadata, no data IO."""
        entries = [dict(e, schema_id=schema_id) for e in self._load_segment(ref["path"])]
        return self._write_segment(entries)

    def _rebase_schema_mor(
        self, cur: dict[str, Any], m: dict[str, Any]
    ) -> tuple[dict[str, Any], int, int]:
        """Rebase this MoR commit's schema onto ``cur``'s registry.

        A delta commit reads no base rows, so a concurrent *compatible*
        schema evolution (add-column / widening — another writer's
        epoch) must not conflict it (VERDICT r4 #4): the table's next
        schema is the lattice JOIN of ``cur``'s current schema and ours
        (``evolve_schema`` — both sides' files then align up at read,
        exactly like any other historical generation), and our delta
        files' entries are re-pointed at our schema's id in ``cur``'s
        registry (ids are allocated locally per writer, so ours may
        collide with a different schema in ``cur`` — never carry a
        local id across a rebase). Incompatible evolution (e.g.
        string→int) is a genuine conflict and raises.

        Returns ``(schemas, schema_id, file_schema_id)``: the rebased
        registry, the table's current schema id, and the id our data
        files must reference."""
        ours = T.StructType.fromJson(m["schemas"][str(m["schema_id"])])
        reg = dict(cur["schemas"])
        cur_schema = T.StructType.fromJson(reg[str(cur["schema_id"])])
        try:
            joined, changed = evolve_schema(cur_schema, ours)
        except TypeError as ex:
            raise CommitConflictError(
                f"incompatible concurrent schema evolution on {self.path}: {ex}"
            ) from ex

        def _id_of(schema_json: dict[str, Any]) -> int | None:
            for k, v in reg.items():
                if v == schema_json:
                    return int(k)
            return None

        ours_json = ours.jsonValue()
        file_sid = _id_of(ours_json)
        if file_sid is None:
            file_sid = max(int(k) for k in reg) + 1
            reg[str(file_sid)] = ours_json
        if not changed:
            return reg, int(cur["schema_id"]), file_sid
        joined_json = joined.jsonValue()
        sid = _id_of(joined_json)
        if sid is None:
            sid = max(int(k) for k in reg) + 1
            reg[str(sid)] = joined_json
        return reg, sid, file_sid

    @staticmethod
    def _bucket_token(m: dict[str, Any], b: int) -> str | None:
        """Identity of a bucket's current contents for conflict
        validation: the base segment path (unique per write) plus the
        ordered delta segment paths — any commit that adds, folds or
        rewrites the bucket's rows changes the token. Legacy manifests
        fall back to the inline entry list."""
        deltas = ",".join(
            ref["path"] for ref in (m.get("deltas") or {}).get(str(b), [])
        )
        if "segments" in m:
            ref = m["segments"].get(str(b))
            base = None if ref is None else ref["path"]
        else:
            fs = m["files"].get(str(b))
            base = None if fs is None else json.dumps(fs, sort_keys=True)
        if base is None and not deltas:
            return None
        return f"{base}|{deltas}"

    def _all_tokens(self, m: dict[str, Any]) -> dict[str, str | None]:
        """Token per bucket over base segments AND deltas — the staleness
        check of full-table rewrites (tombstone expiry, rebucket)."""
        bs = set(m.get("segments") if "segments" in m else m["files"])
        bs.update(self._delta_refs(m))
        return {b: self._bucket_token(m, int(b)) for b in bs}

    # --------------------------------------------------------------- reads

    @staticmethod
    def _spec_token(m: dict[str, Any]) -> str:
        """Identity of the bucket-routing function: the bucket count
        plus, during a progressive rebucket, the migration target and
        frontier. Any commit that changes how a key maps to a bucket id
        changes this token — writers compare it to detect that their
        partitioning (or prepared bucket set) is stale."""
        mig = m.get("migration")
        if not mig:
            return str(m["num_buckets"])
        return f"{m['num_buckets']}>{mig['new_num_buckets']}@{mig['frontier']}"

    @staticmethod
    def _frontier_advance_disjoint(
        m: dict[str, Any], cur: dict[str, Any], routed_ids: list[int]
    ) -> bool:
        """True iff ``cur`` differs from ``m`` ONLY by a further-advanced
        frontier of the SAME progressive migration, and none of
        ``routed_ids``' underlying old buckets were migrated in between
        — i.e. the routing of every one of our buckets is unchanged, so
        bucket labels computed under ``m`` remain correct under ``cur``
        and the commit can rebase instead of conflicting."""
        a, b = m.get("migration"), cur.get("migration")
        if not a or not b:
            return False
        if (
            int(cur["num_buckets"]) != int(m["num_buckets"])
            or int(a["new_num_buckets"]) != int(b["new_num_buckets"])
            or int(b["frontier"]) < int(a["frontier"])
        ):
            return False
        old_n = int(m["num_buckets"])
        lo, hi = int(a["frontier"]), int(b["frontier"])
        return all(not (lo <= int(r) % old_n < hi) for r in routed_ids)

    def _bucket_expr(self, m: dict[str, Any], col: Column | None = None) -> Column:
        """Routed bucket id under ``m``'s spec. During a progressive
        rebucket the old and new specs coexist: old buckets below the
        migration ``frontier`` have been rewritten under the new modulus
        (``new_num_buckets`` is a multiple of the old, so old bucket b
        splits into {b, b+old_n, b+2·old_n, ...} — a key's new bucket is
        derivable from its hash alone), buckets at-or-above it still
        live under the old one. The frontier is a single integer, so the
        routing expression is one CASE — O(1) regardless of bucket
        count."""
        c = col if col is not None else F.col(m["bucket_col"])
        h = F.xxhash64(c)
        old_b = F.pmod(h, F.lit(m["num_buckets"]))
        mig = m.get("migration")
        if not mig:
            return old_b
        return F.when(
            old_b < F.lit(int(mig["frontier"])),
            F.pmod(h, F.lit(int(mig["new_num_buckets"]))),
        ).otherwise(old_b)

    def bucket_id(
        self, col: Column | str | None = None, manifest: dict[str, Any] | None = None
    ) -> Column:
        """Public bucket-id expression for THIS table's partitioning —
        callers use it to derive the bucket set a batch touches and pass
        it to ``read(buckets=...)`` (Iceberg partition-pruning analogue).
        ``col`` defaults to the table's bucket column; pass an expression
        when the bucket value must be derived from other columns.

        ``manifest``: pass the SAME manifest to ``bucket_id`` and the
        ``read(buckets=..., manifest=...)`` it prunes — resolving the
        spec twice opens a race where a ``rebucket`` migration commits
        in between and the bucket ids silently prune the wrong layout
        (GraphSync/RollupSync pin one manifest per epoch for this).
        During a progressive migration the id is the ROUTED one (old or
        new modulus per the frontier — same function every writer
        partitions with)."""
        m = manifest if manifest is not None else self.manifest()
        c = F.col(col) if isinstance(col, str) else (col if col is not None else F.col(m["bucket_col"]))
        return self._bucket_expr(m, c)

    def _read_files(self, m: dict[str, Any], entries: list[dict[str, Any]]) -> DataFrame:
        """Read a set of file entries, aligning every historical schema to
        the table's current schema (reader-side evolution)."""
        target = _physical(T.StructType.fromJson(m["schemas"][str(m["schema_id"])]))
        if not entries:
            return self.spark.createDataFrame([], target)
        by_schema: dict[int, list[str]] = {}
        for e in entries:
            by_schema.setdefault(e["schema_id"], []).append(os.path.join(self.path, e["path"]))
        parts = []
        for sid, paths in sorted(by_schema.items()):
            file_schema = _physical(T.StructType.fromJson(m["schemas"][str(sid)]))
            df = self.spark.read.schema(file_schema).parquet(*paths)
            parts.append(align_to_schema(df, target))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(
        self,
        buckets: list[int] | None = None,
        manifest: dict[str, Any] | None = None,
        system: bool = False,
        version: int | None = None,
    ) -> DataFrame:
        """Scan the table (optionally bucket-pruned — the Iceberg
        partition-pruning analogue used by MERGE). ``manifest`` lets an
        in-flight commit read against its own (evolved) schema;
        ``system=True`` exposes tombstones and the ``_seq``/``_deleted``
        system columns (the MERGE path needs them); ``version`` time-travels
        to a retained historical snapshot.

        Merge-on-read: buckets carrying delta segments are resolved by a
        last-writer-wins compaction over base ∪ deltas per key (max
        ``_seq`` wins; same semantics the CoW write path applies
        eagerly). The LWW pass is the hash-agg + keyed-join form — the
        payload shuffles once on the key columns and is never sorted —
        and is skipped entirely when the selected buckets have no
        deltas, so a fully-compacted table reads at plain scan speed."""
        m = manifest if manifest is not None else self.manifest(version)
        sel = None if buckets is None else {int(b) for b in buckets}
        delta_b = {
            int(b)
            for b, refs in self._delta_refs(m).items()
            if refs and (sel is None or int(b) in sel)
        }
        if not delta_b:
            df = self._read_files(m, self._entries(m, buckets))
        else:
            # only the delta-carrying buckets pay the LWW shuffle; the
            # rest of the selection unions in at plain scan speed
            seg_keys = m.get("segments") if "segments" in m else m["files"]
            plain = [
                int(b)
                for b in seg_keys
                if (sel is None or int(b) in sel) and int(b) not in delta_b
            ]
            staged = self._read_files(
                m,
                self._entries(m, sorted(delta_b))
                + self._delta_entries(m, sorted(delta_b)),
            )
            folded = _fold_lww(staged, list(m["key_cols"]))
            df = self._read_files(m, self._entries(m, plain)).unionByName(folded)
        if system:
            return df
        return df.filter(~F.coalesce(F.col(_DELETED), F.lit(False))).drop(_SEQ, _DELETED)

    # -------------------------------------------------------------- writes

    def _route_for_write(
        self, df: DataFrame, m: dict[str, Any]
    ) -> tuple[DataFrame, tuple[str, ...]]:
        """Attach the bucket id and repartition rows into balanced
        per-bucket write partitions; returns ``(routed_df, route_cols)``.

        r8 (guide §2.5): hash-repartitioning n distinct bucket ids into
        n partitions is the classic too-few-distinct-keys skew — ~1/e of
        the write tasks get nothing while others write 3-4 buckets
        serially. Instead route through a pre-computed token whose
        Murmur3 hash lands each bucket in its OWN partition: every
        bucket gets exactly one balanced write task (and exactly one
        output file per commit, as before).

        ``route_cols`` lets a caller fold a keyed aggregation into the
        same exchange (guide §2.4): the routing column is a pure
        function of the bucket column, so grouping by
        ``(*route_cols, *key_cols)`` is satisfied by this partitioning
        and Catalyst inserts no second exchange — see the MERGE's
        compact-and-write."""
        # bucket-id domain under this manifest's routing (a progressive
        # migration labels rewritten buckets under the NEW modulus)
        mig = m.get("migration")
        n = int(mig["new_num_buckets"]) if mig else int(m["num_buckets"])
        routed = df.withColumn("__b", self._bucket_expr(m))
        if n <= 65536:
            toks = _partition_tokens(n)
            tok_col = F.element_at(
                F.array(*[F.lit(t).cast("long") for t in toks]),
                F.col("__b").cast("int") + 1,
            )
            return (
                routed.withColumn("__p", tok_col).repartition(n, F.col("__p")),
                ("__p", "__b"),
            )
        # token table impractical; accept hash collisions
        return routed.repartition(F.col("__b")), ("__b",)

    def _write_data(
        self, df: DataFrame, m: dict[str, Any], pre_routed: bool = False
    ) -> dict[str, list[dict[str, Any]]]:
        """Write rows bucket-partitioned under a fresh commit dir; returns
        bucket -> new file entries. ``pre_routed``: ``df`` already went
        through ``_route_for_write`` (carries ``__b``, partitioned per
        bucket; a leftover ``__p`` must be dropped by the caller)."""
        token = uuid.uuid4().hex[:12]
        commit_rel = os.path.join(_DATA_DIR, f"commit-{token}")
        commit_abs = os.path.join(self.path, commit_rel)
        if pre_routed:
            # caller already routed rows to balanced per-bucket
            # partitions (see _route_for_write) — adding a repartition
            # here would pay the exchange this path exists to avoid
            staged = df
        else:
            staged, _ = self._route_for_write(df, m)
            staged = staged.drop("__p")
        staged.write.partitionBy("__b").mode("overwrite").parquet(commit_abs)
        out: dict[str, list[dict[str, Any]]] = {}
        for d in self.io.listdir(commit_abs):
            if not d.startswith("__b="):
                continue
            b = str(int(d.split("=")[1]))
            for fn in self.io.listdir(os.path.join(commit_abs, d)):
                if fn.endswith(".parquet"):
                    rel = os.path.join(commit_rel, d, fn)
                    out.setdefault(b, []).append(
                        {
                            "path": rel,
                            "schema_id": m["schema_id"],
                            # byte size per data file (S8 dataset-size
                            # estimate, mysql/repository.go:492-538 —
                            # information_schema data_length analogue)
                            "bytes": self.io.getsize(os.path.join(self.path, rel)),
                        }
                    )
        return out

    def _evolve_if_needed(self, m: dict[str, Any], batch_schema: T.StructType) -> dict[str, Any]:
        """Merge-schema resolver hook: if the batch carries new/widened
        columns, register an evolved schema in the (about-to-commit)
        manifest. Payload-only: key/meta columns never change type."""
        current = T.StructType.fromJson(m["schemas"][str(m["schema_id"])])
        evolved, changed = evolve_schema(current, batch_schema)
        if changed:
            new_id = max(int(k) for k in m["schemas"]) + 1
            m["schemas"][str(new_id)] = evolved.jsonValue()
            m["schema_id"] = new_id
        return m

    def merge_prepare(
        self,
        batch: DataFrame,
        op_col: str = "op",
        order_col: str = "seq",
        collect_seqs: bool = False,
        collect_max_keys: int = 4_000_000,
    ) -> PreparedMerge:
        """The winner-aggregation half of MERGE: one column-pruned scan of
        the batch (keys, order, op — fixed-width HashAggregate, map-side
        combined), collecting per-key winners, delete counts and touched
        buckets. Schema-INDEPENDENT: key/bucket columns never change type
        under evolution, so this can run for epoch N+1 while epoch N's
        write is still committing (pipelined replay). Caller passes the
        result to ``merge_upsert(prepared=...)``, which owns the
        unpersist."""
        t0 = time.monotonic()
        m = self.manifest()
        key_cols = m["key_cols"]
        table_schema = T.StructType.fromJson(m["schemas"][str(m["schema_id"])])
        types = {f.name: f.dataType for f in table_schema.fields}
        # cast keys to table types (widened batch ints etc.) so the bucket
        # hash sees the same binary representation the table writes
        keyed = batch.withColumns(
            {k: F.col(k).cast(types[k]) for k in key_cols if k in types}
        )
        is_del = (F.col(op_col) == "delete").cast("int")
        winners = (
            keyed.groupBy(*key_cols)
            .agg(
                F.max(order_col).alias(order_col),
                F.max_by(is_del, F.col(order_col)).alias("__del"),
            )
            .persist()
        )
        agg = winners.select(
            F.count("*").alias("n"),
            F.sum("__del").alias("d"),
            F.max(order_col).alias("mx"),
            F.collect_set(self._bucket_expr(m)).alias("bs"),
        ).collect()[0]
        winner_seqs = None
        if collect_seqs and 0 < int(agg["n"]) <= collect_max_keys:
            # pre-collect the winning LSNs (Arrow toPandas off the
            # persisted winners — one extra overlappable job) so the
            # write phase needs no broadcast-relation build on its
            # serial path; see PreparedMerge.winner_seqs. Size-guarded
            # like the broadcast path: a giant epoch falls back to the
            # join strategies instead of collecting to the driver.
            import numpy as np

            seqs = winners.select(F.col(order_col).cast("long")).toPandas()
            arr = np.sort(seqs.iloc[:, 0].to_numpy(dtype="int64"))
            winner_seqs = self.spark.sparkContext.broadcast(arr)
        return PreparedMerge(
            winners=winners,
            rows_in=int(agg["n"]),
            deletes=int(agg["d"] or 0),
            affected=sorted(int(b) for b in agg["bs"]),
            stats_ms=int((time.monotonic() - t0) * 1000),
            max_seq=int(agg["mx"]) if agg["mx"] is not None else -1,
            winner_seqs=winner_seqs,
            num_buckets=int(m["num_buckets"]),
            spec_token=self._spec_token(m),
        )

    def merge_upsert(
        self,
        batch: DataFrame,
        epoch_id: int = -1,
        query_id: str = "default",
        op_col: str = "op",
        order_col: str = "seq",
        evolve: bool = True,
        meta_cols: tuple[str, ...] = ("schema_ver",),
        broadcast_max_keys: int = 4_000_000,
        prepared: PreparedMerge | None = None,
        mode: str = "cow",
        ordered_writer: bool = True,
    ) -> MergeStats:
        """MERGE INTO table USING compact(batch) ON key:

        - WHEN MATCHED AND op='delete' THEN DELETE
        - WHEN MATCHED THEN UPDATE (full-row replace — the reference's LWW
          property overwrite, ``graph_aggregate.go:46-51``)
        - WHEN NOT MATCHED AND op!='delete' THEN INSERT

        ``mode='cow'`` (default): copy-on-write — read + rewrite the
        touched buckets eagerly; reads stay plain scans. ``mode='mor'``:
        merge-on-read — write the epoch's compacted winners (deletes as
        tombstone rows) as per-bucket delta segments WITHOUT reading or
        rewriting the base; bytes written per epoch ∝ |batch| even when
        the batch's keys spread across every bucket (the regime where
        CoW degenerates to rewriting the whole table each epoch).
        Readers apply LWW over base ∪ deltas; ``compact_deltas()`` folds
        them back down in the background. Both modes commit through the
        same epoch fence and produce identical logical state.

        Exactly-once via epoch fencing; schema evolution applied before
        the data commit.

        Assumptions (same contract as ``compact_lww``): ``order_col`` is a
        batch-wide-unique LSN. Re-delivery of the winning event is fine
        (collapses to one row); two *different* payloads sharing
        (key, order) resolve by a nondeterministic ``max_by`` tie-break —
        a malformed log, not a supported input. Winner filtering uses a
        broadcast semi-join on the winner LSNs while the winner count
        (≈8 bytes/key) is at most ``broadcast_max_keys``; above that it
        falls back to a keyed shuffle semi-join on (key, order), so a
        mis-configured giant epoch degrades to an extra shuffle instead
        of a driver OOM.

        ``ordered_writer``: whether this writer promises its FUTURE
        epochs carry only LSNs above this batch's max (the normal shape
        for binlog tailing and seq-partitioned batch replay). Pass
        False for sources that deliver epochs out of seq order (Spark
        file streams over same-mtime files): the writer then pins the
        tombstone-expiry horizon instead of unsoundly advancing it —
        see ``_advance_watermark`` and ``advance_watermark()``.
        """
        t0 = time.monotonic()
        m = self.manifest()
        if epoch_id >= 0 and int(m["epochs"].get(query_id, -1)) >= epoch_id:
            if prepared is not None:
                prepared.winners.unpersist()
                if prepared.winner_seqs is not None:
                    prepared.winner_seqs.unpersist()
            return MergeStats(epoch_id, 0, 0, 0, 0, True, 0, m["version"])
        # base snapshot facts for optimistic-concurrency validation
        base_schema_id = m["schema_id"]

        # CDC meta columns never become table columns
        skip = {op_col, order_col, *meta_cols}
        if evolve:
            payload_schema = T.StructType([f for f in batch.schema.fields if f.name not in skip])
            m = self._evolve_if_needed(m, payload_schema)
        table_schema = T.StructType.fromJson(m["schemas"][str(m["schema_id"])])
        key_cols = m["key_cols"]

        aligned = align_to_schema(batch, table_schema, keep_extra=[op_col, order_col])

        # Scan discipline (the 10^10-event design point): the raw batch is
        # scanned exactly TWICE — once column-pruned (keys, order, op) for
        # the winner/stat aggregation (merge_prepare; overlappable with
        # the previous epoch's write), once full-payload filtered by a
        # semi-join on the winning LSNs. Everything after that is
        # proportional to |keys|, not |events|. All aggregation buffers
        # are fixed-width (long/int), so every agg is a HashAggregate with
        # map-side partial aggregation — an update storm on a hot
        # conversation collapses locally before the shuffle, which is why
        # the default path needs no salting (operators/skew.py remains the
        # explicit tool for payload-carrying skewed aggregations).
        if prepared is None:
            prepared = self.merge_prepare(batch, op_col=op_col, order_col=order_col)
        winners = prepared.winners
        rows_in, deletes = prepared.rows_in, prepared.deletes
        affected = prepared.affected
        prep_spec = prepared.spec_token or str(prepared.num_buckets)
        if prepared.num_buckets and prep_spec != self._spec_token(m):
            # a rebucket (or a progressive-migration frontier advance)
            # committed between prepare and now: the prepared bucket set
            # is numbered under the OLD routing — pruning with it would
            # read the wrong buckets. Recompute from the persisted
            # winners (∝ |keys|, one tiny agg job).
            if rows_in > 0:
                row = winners.select(
                    F.collect_set(self._bucket_expr(m)).alias("bs")
                ).collect()[0]
                affected = sorted(int(b) for b in row["bs"])
        base_tokens = {b: self._bucket_token(m, b) for b in affected}
        t_stats = time.monotonic()
        try:
            if rows_in == 0:
                def build_empty(cur: dict[str, Any]) -> dict[str, Any]:
                    c = dict(cur)
                    c["version"] = cur["version"] + 1
                    c["parent"] = cur["version"]
                    c["epochs"] = dict(cur["epochs"])
                    if epoch_id >= 0:
                        c["epochs"][query_id] = epoch_id
                    c["summary"] = {
                        "operation": "merge",
                        "mode": mode,
                        "epoch": epoch_id,
                        "query_id": query_id,
                        "rows": 0,
                    }
                    return c

                committed = self._commit_with_rebase(build_empty, epoch_id, query_id, m)
                v = (committed or self.manifest())["version"]
                return MergeStats(
                    epoch_id, 0, 0, 0, 0, committed is None,
                    int((time.monotonic() - t0) * 1000), v,
                )

            # Versioned MERGE: re-express current rows (incl. persisted
            # tombstones) as change events carrying their committed _seq,
            # union with the winning batch events, and let one LWW
            # compaction pick the max-seq winner per key. Equivalent to
            #   WHEN MATCHED AND src.seq >= tgt._seq AND op='delete' THEN DELETE
            #   WHEN MATCHED AND src.seq >= tgt._seq THEN UPDATE
            #   WHEN NOT MATCHED AND op!='delete' THEN INSERT
            # but correct under out-of-order epochs and event re-delivery
            # (a stale version can never overwrite a newer one).
            payload = [F.col(f.name) for f in table_schema.fields]
            if prepared.winner_seqs is not None:
                # pre-collected winner LSNs (see merge_prepare): filter
                # with a vectorized Arrow UDF (binary search per batch
                # against the sorted broadcast array) — no broadcast-hash
                # relation build on the epoch's serial path. A stray
                # equal-seq duplicate would be harmless anyway: the final
                # compact_lww re-picks the max-seq winner per key.
                import numpy as np
                import pandas as pd
                from pyspark.sql.functions import pandas_udf

                bc = prepared.winner_seqs

                def _is_winner_batch(s):
                    arr = bc.value
                    v = s.to_numpy(dtype="int64", na_value=-1)
                    idx = np.searchsorted(arr, v)
                    ok = (idx < len(arr)) & (arr[np.minimum(idx, len(arr) - 1)] == v)
                    return pd.Series(ok)

                _is_winner = pandas_udf(_is_winner_batch, "boolean")
                survivors = aligned.filter(_is_winner(F.col(order_col)))
            elif rows_in <= broadcast_max_keys:
                seqs = winners.select(order_col)
                survivors = aligned.join(F.broadcast(seqs), on=order_col, how="left_semi")
            else:
                # size-guarded fallback: winner set too large to broadcast —
                # keyed shuffle semi-join on (key, order) instead (needs no
                # LSN-uniqueness assumption either). Key equality must be
                # null-safe: a winner row with a NULL key column would
                # otherwise be dropped here while the broadcast path (which
                # joins on order_col alone) keeps it — same batch, different
                # merged state depending on batch size.
                w = winners.select(*key_cols, order_col).alias("w")
                a = aligned.alias("a")
                cond = F.col(f"a.{order_col}") == F.col(f"w.{order_col}")
                for k in key_cols:
                    cond = cond & F.col(f"a.{k}").eqNullSafe(F.col(f"w.{k}"))
                survivors = a.join(w, on=cond, how="left_semi")
            affected_set = set(affected)
            batch_events = survivors.select(*payload, F.col(order_col), F.col(op_col))

            def compact_route(staged_events: DataFrame) -> DataFrame:
                # ONE exchange for compact+write (r8, guide §2.4): route
                # rows to their bucket's write partition FIRST, then run
                # the per-key LWW fold with the routing columns added to
                # the grouping keys — they are pure functions of the
                # bucket column, so the groups are unchanged and the
                # aggregate's clustering requirement is satisfied by the
                # routing partitioning (no second exchange; previously
                # the fold shuffled by key and the write re-shuffled by
                # bucket, moving the staged payload twice).
                routed, route_cols = self._route_for_write(staged_events, m)
                folded = compact_lww(
                    routed,
                    (*route_cols, *key_cols),
                    order_col,
                    broadcast_winner_seqs="sort",
                )
                return folded.select(
                    *payload,
                    F.col(order_col).cast("long").alias(_SEQ),
                    (F.col(op_col) == "delete").alias(_DELETED),
                    "__b",
                )

            if mode == "mor":
                # Merge-on-read: never read the base. The survivors are the
                # batch's per-key winners (plus possible duplicate
                # deliveries of the winning event — collapsed by the thin
                # sort compact over ∝|keys| rows); they are written as
                # delta segments, deletes persisting as tombstone rows.
                # Bytes written ∝ |batch|, not touched-bucket bytes.
                new_files = self._write_data(compact_route(batch_events), m, pre_routed=True)
                new_segs = {b: self._write_segment(fs) for b, fs in new_files.items()}
                bytes_written = sum(int(r["bytes"]) for r in new_segs.values())

                def build_mor(cur: dict[str, Any]) -> dict[str, Any]:
                    # delta commits commute: nothing was read, so a rebase
                    # just re-appends the same immutable delta refs onto
                    # whatever delta lists the new base carries; a racing
                    # COMPATIBLE schema evolution is absorbed by rebasing
                    # our schema onto cur's registry (see _rebase_schema_mor)
                    reg, sid, file_sid = self._rebase_schema_mor(cur, m)
                    segs = new_segs
                    if file_sid != int(m["schema_id"]):
                        segs = {
                            b: self._retag_segment(ref, file_sid)
                            for b, ref in new_segs.items()
                        }
                    dl = {b: list(v) for b, v in self._delta_refs(cur).items()}
                    for b, ref in segs.items():
                        dl.setdefault(b, []).append(ref)
                    c = dict(cur)
                    c.pop("files", None)
                    c["schemas"] = reg
                    c["schema_id"] = sid
                    c["segments"] = self._seg_refs_for_write(cur)
                    c["deltas"] = dl
                    c["version"] = cur["version"] + 1
                    c["parent"] = cur["version"]
                    c["epochs"] = dict(cur["epochs"])
                    if epoch_id >= 0:
                        c["epochs"][query_id] = epoch_id
                    _advance_watermark(c, cur, query_id, prepared.max_seq, ordered_writer)
                    c["summary"] = {
                        "operation": "merge",
                        "mode": "mor",
                        "epoch": epoch_id,
                        "query_id": query_id,
                        "rows": rows_in,
                        "deletes": deletes,
                        "buckets": len(affected),
                        "bytes_written": bytes_written,
                        "total_files_bytes": _refs_total_bytes(c["segments"]),
                    }
                    return c

                def validate_mor(cur: dict[str, Any]) -> None:
                    # no base rows were read, so concurrent data commits
                    # never invalidate a delta — a racing COMPATIBLE
                    # schema evolution is rebased in build_mor (an
                    # incompatible one raises there) — but a racing
                    # rebucket does: these delta files were
                    # hash-partitioned under OUR routing, and attaching
                    # their old-numbered bucket refs to the new layout
                    # would misplace every row for pruned reads. The ONE
                    # routing change that rebases instead of conflicting
                    # is a progressive-migration frontier advance that
                    # touches none of our buckets (their routing — and so
                    # our labels — is unchanged).
                    if self._spec_token(cur) != self._spec_token(m):
                        if not self._frontier_advance_disjoint(m, cur, affected):
                            raise CommitConflictError(
                                f"concurrent rebucket on {self.path}"
                            )

                committed = self._commit_with_rebase(
                    build_mor, epoch_id, query_id, m, validate_mor
                )
            else:
                existing = self.read(buckets=affected, manifest=m, system=True)
                existing_events = existing.select(
                    *payload,
                    F.col(_SEQ).alias(order_col),
                    F.when(F.col(_DELETED), F.lit("delete")).otherwise(F.lit("update")).alias(op_col),
                )
                # staged rows ∝ |keys| → the sort-based single-shuffle compact
                # is cheapest here (one job, no broadcast round-trip), and the
                # whole union→compact→bucket-write pipeline runs as one job
                # sharing ONE exchange (see compact_route)
                staged = existing_events.unionByName(batch_events)
                new_files = self._write_data(compact_route(staged), m, pre_routed=True)
                # segment files for the touched buckets are written ONCE, up
                # front; a rebase-retry re-points the same immutable segments
                # (validate() guarantees the base buckets didn't change).
                # Metadata bytes written per commit ∝ touched buckets.
                new_segs = {b: self._write_segment(fs) for b, fs in new_files.items()}
                bytes_written = sum(int(r["bytes"]) for r in new_segs.values())

                def build(cur: dict[str, Any]) -> dict[str, Any]:
                    refs = {
                        b: r
                        for b, r in self._seg_refs_for_write(cur).items()
                        if int(b) not in affected_set
                    }
                    refs.update(new_segs)
                    c = dict(cur)
                    c.pop("files", None)
                    # carry our (possibly evolved) schema history; validate()
                    # guarantees no concurrent evolution changed schema_id —
                    # but a racing writer may GROW cur's registry without
                    # changing schema_id (a MoR rebase allocating a local id
                    # for a schema absent from the shared ancestry), so the
                    # registries must be UNIONED, not overwritten: dropping
                    # cur's entry would leave that writer's delta file
                    # entries pointing at a missing schema id (VERDICT r5)
                    c["schemas"] = _union_schema_registries(
                        cur["schemas"], m["schemas"], self.path
                    )
                    c["schema_id"] = m["schema_id"]
                    c["segments"] = refs
                    # the rewrite folded the touched buckets' deltas in
                    c["deltas"] = {
                        b: v
                        for b, v in self._delta_refs(cur).items()
                        if int(b) not in affected_set
                    }
                    c["version"] = cur["version"] + 1
                    c["parent"] = cur["version"]
                    c["epochs"] = dict(cur["epochs"])
                    if epoch_id >= 0:
                        c["epochs"][query_id] = epoch_id
                    _advance_watermark(c, cur, query_id, prepared.max_seq, ordered_writer)
                    c["summary"] = {
                        "operation": "merge",
                        "mode": "cow",
                        "epoch": epoch_id,
                        "query_id": query_id,
                        "rows": rows_in,
                        "deletes": deletes,
                        "buckets": len(affected),
                        "bytes_written": bytes_written,
                        "total_files_bytes": _refs_total_bytes(refs),
                    }
                    return c

                def validate(cur: dict[str, Any]) -> None:
                    # copy-on-write staleness check: our `existing` read and
                    # schema resolution used the base snapshot — a concurrent
                    # commit to the same buckets (or a schema change) means
                    # this merge must be recomputed, not rebased. A racing
                    # rebucket is checked explicitly: bucket tokens would
                    # catch it for non-empty buckets, but an insert-only
                    # epoch into previously-EMPTY buckets (token None on
                    # both specs) would otherwise slip old-numbered
                    # segments into the new layout.
                    if cur["schema_id"] != base_schema_id:
                        raise CommitConflictError(
                            f"concurrent schema evolution on {self.path}"
                        )
                    if self._spec_token(cur) != self._spec_token(m):
                        raise CommitConflictError(
                            f"concurrent rebucket on {self.path}"
                        )
                    for b in affected:
                        if self._bucket_token(cur, b) != base_tokens[b]:
                            raise CommitConflictError(
                                f"bucket {b} rewritten concurrently on {self.path}"
                            )

                committed = self._commit_with_rebase(build, epoch_id, query_id, m, validate)
            if committed is None:  # another writer committed this epoch mid-race
                return MergeStats(
                    epoch_id, 0, 0, 0, 0, True,
                    int((time.monotonic() - t0) * 1000), self.manifest()["version"],
                )
            return MergeStats(
                epoch_id,
                rows_in,
                rows_in - deletes,
                deletes,
                len(affected),
                False,
                int((time.monotonic() - t0) * 1000),
                committed["version"],
                stats_ms=prepared.stats_ms,
                write_ms=int((time.monotonic() - t_stats) * 1000),
                bytes_written=bytes_written,
                max_seq=prepared.max_seq,
            )
        finally:
            winners.unpersist()
            if prepared.winner_seqs is not None:
                prepared.winner_seqs.unpersist()

    def append(self, df: DataFrame, epoch_id: int = -1, query_id: str = "default") -> int:
        """Append-only commit (used by the lineage/metrics table)."""
        m = self.manifest()
        if epoch_id >= 0 and int(m["epochs"].get(query_id, -1)) >= epoch_id:
            return m["version"]
        table_schema = T.StructType.fromJson(m["schemas"][str(m["schema_id"])])
        rows = align_to_schema(df, table_schema).withColumns(
            {_SEQ: F.lit(max(epoch_id, 0)).cast("long"), _DELETED: F.lit(False)}
        )
        new_files = self._write_data(rows, m)

        def build(cur: dict[str, Any]) -> dict[str, Any]:
            # appended buckets get a new segment = current entries + new;
            # built inside build() because a rebase may find the bucket
            # grown by a concurrent append (appends commute)
            refs = self._seg_refs_for_write(cur)
            for b, fs in new_files.items():
                prev = self._load_segment(refs[b]["path"]) if b in refs else []
                refs[b] = self._write_segment(list(prev) + list(fs))
            c = dict(cur)
            c.pop("files", None)
            c["segments"] = refs
            c["version"] = cur["version"] + 1
            c["parent"] = cur["version"]
            c["epochs"] = dict(cur["epochs"])
            if epoch_id >= 0:
                c["epochs"][query_id] = epoch_id
            c["summary"] = {"operation": "append", "total_files_bytes": _refs_total_bytes(refs)}
            return c

        # appends commute (no bucket is rewritten) → rebase-and-retry
        # needs no data validation; a raced same-epoch append is fenced.
        # The one non-commuting commit is a rebucket (including a
        # progressive-migration frontier advance): these files were
        # hash-partitioned under the old routing, so attaching them to
        # the migrated layout would misplace rows for pruned reads.
        def validate(cur: dict[str, Any]) -> None:
            if self._spec_token(cur) != self._spec_token(m):
                raise CommitConflictError(f"concurrent rebucket on {self.path}")

        committed = self._commit_with_rebase(build, epoch_id, query_id, m, validate)
        return (committed or self.manifest())["version"]

    def safe_tombstone_horizon(self, manifest: dict[str, Any] | None = None) -> int | None:
        """The largest horizon ``expire_tombstones`` can safely use:
        one past the MINIMUM committed seq watermark across this
        table's registered writers. A tombstone with ``_seq ≤ min(W)``
        can never be resurrected — every writer's future epochs carry
        only LSNs above its own watermark (committed epochs are
        fenced), so no pre-delete event for that key can still arrive.
        A lagging replay (low watermark) holds the horizon down until
        it catches up. ``None`` when no merge has recorded a watermark
        (nothing is provably safe to expire)."""
        m = manifest if manifest is not None else self.manifest()
        wm = m.get("watermarks") or {}
        if not wm:
            return None
        return min(int(v) for v in wm.values()) + 1

    def drop_watermark(self, query_id: str, force: bool = False) -> int:
        """Retire a decommissioned writer's committed-seq watermark.

        The manifest watermarks map only grows (ADVICE r5): a one-shot
        backfill or decommissioned stream whose ``query_id`` never
        merges again permanently pins ``safe_tombstone_horizon`` at its
        last committed seq, silently degrading ``expire_tombstones()``
        to a near-no-op forever. Dropping the entry declares "this
        writer will never merge again" — an operator decision, so the
        commit conflicts (rather than silently losing the new value) if
        the supposedly-dead writer advances its watermark concurrently.
        Per-writer watermarks are visible in ``delta_stats()`` so the
        laggard pinning the horizon can be identified first.

        An UNORDERED writer's pin (watermark -1) cannot be dropped
        without ``force=True``: such a writer declared it can make no
        ordering claim, so the advanced-concurrently conflict check
        above can never detect it being alive (its value stays -1 by
        design) — silently dropping the pin would re-open the exact
        resurrection window it exists to close. The safe retirement
        path is ``advance_watermark()`` after a provable drain."""
        m = self.manifest()
        seen = (m.get("watermarks") or {}).get(query_id)
        if seen is None:
            return int(m["version"])  # nothing to retire
        if int(seen) < 0 and not force:
            raise TombstoneHorizonError(
                f"writer {query_id!r} on {self.path} holds an unordered-"
                "delivery pin (watermark -1); liveness is undetectable from "
                "the watermark, so dropping it could resurrect deletes. "
                "Unpin with advance_watermark() after a provable drain, or "
                "pass force=True if the writer is provably dead."
            )

        def build(cur: dict[str, Any]) -> dict[str, Any]:
            c = dict(cur)
            wm = dict(cur.get("watermarks") or {})
            wm.pop(query_id, None)
            c["watermarks"] = wm
            c["version"] = cur["version"] + 1
            c["parent"] = cur["version"]
            c["summary"] = {"operation": "drop-watermark", "query_id": query_id}
            return c

        def validate(cur: dict[str, Any]) -> None:
            now = (cur.get("watermarks") or {}).get(query_id)
            if now is not None and int(now) > int(seen):
                raise CommitConflictError(
                    f"writer {query_id!r} advanced its watermark "
                    f"({seen} -> {now}) under drop_watermark on {self.path}"
                )

        committed = self._commit_with_rebase(build, -1, "drop-watermark", m, validate)
        return int(committed["version"])

    def advance_watermark(self, query_id: str, seq: int) -> int:
        """Explicitly advance a writer's committed-seq watermark — the
        operator's declaration that every event with LSN ≤ ``seq`` from
        this writer has been delivered. This is how an UNORDERED writer
        (``merge_upsert(ordered_writer=False)``, e.g. a drained
        ``replay_stream`` over a file source) unpins the tombstone
        horizon: per-epoch merges could not make the ordering claim, but
        after the stream drains the caller provably can. Never
        regresses; the commit is a tiny manifest-only CAS."""
        m = self.manifest()

        def build(cur: dict[str, Any]) -> dict[str, Any]:
            c = dict(cur)
            wm = dict(cur.get("watermarks") or {})
            wm[query_id] = max(int(wm.get(query_id, -1)), int(seq))
            c["watermarks"] = wm
            c["version"] = cur["version"] + 1
            c["parent"] = cur["version"]
            c["summary"] = {
                "operation": "advance-watermark",
                "query_id": query_id,
                "seq": int(seq),
            }
            return c

        committed = self._commit_with_rebase(build, -1, "advance-watermark", m, None)
        return int(committed["version"])

    def expire_tombstones(
        self, older_than_seq: int | None = None, force: bool = False
    ) -> int:
        """Physically drop tombstones whose ``_seq`` is below a replay
        horizon (no event with a smaller LSN can still arrive). The
        Kafka-compaction / Cassandra gc_grace analogue; rewrites every
        bucket, so this is a maintenance job, not a per-epoch step.

        Horizon safety (VERDICT r4 #6): the caller-supplied horizon is
        validated against ``safe_tombstone_horizon()`` — expiring past
        the minimum committed watermark would let a lagging replay's
        next epoch (which legitimately carries smaller LSNs than the
        fastest writer's) re-deliver a pre-delete event and resurrect
        the row. ``older_than_seq=None`` expires exactly up to the safe
        horizon; ``force=True`` bypasses the guard for provably-drained
        streams. Un-compacted MoR deltas need no special case here: the
        rewrite reads through the LWW fold, so a delta tombstone is
        folded before the expiry filter sees it — and the guard itself
        is manifest-level, independent of where the tombstone row
        lives."""
        safe = self.safe_tombstone_horizon()
        if older_than_seq is None:
            if safe is None:
                return self.manifest()["version"]  # nothing provably safe
            older_than_seq = safe
        if older_than_seq <= 0:
            # LSNs are non-negative, so nothing can be below this horizon
            # — skip the full-table rewrite (this is the steady state
            # while an unordered writer pins the horizon at -1)
            return self.manifest()["version"]
        elif not force and safe is not None and older_than_seq > safe:
            raise TombstoneHorizonError(
                f"horizon {older_than_seq} exceeds safe horizon {safe} "
                f"(min committed watermark across writers) on {self.path}"
            )
        elif not force and safe is None and older_than_seq > 0:
            raise TombstoneHorizonError(
                f"no writer watermarks recorded on {self.path}; nothing is "
                "provably safe to expire (use force=True if the stream is drained)"
            )
        m = self.manifest()
        df = self.read(manifest=m, system=True).filter(
            ~(F.coalesce(F.col(_DELETED), F.lit(False)) & (F.col(_SEQ) < older_than_seq))
        )
        new_files = self._write_data(df, m)
        new_segs = {b: self._write_segment(fs) for b, fs in new_files.items()}
        base_tokens = self._all_tokens(m)

        def build(cur: dict[str, Any]) -> dict[str, Any]:
            c = dict(cur)
            c.pop("files", None)
            c["segments"] = dict(new_segs)
            c["deltas"] = {}  # the rewrite read base ∪ deltas → all folded
            c["version"] = cur["version"] + 1
            c["parent"] = cur["version"]
            c["summary"] = {"operation": "expire-tombstones", "horizon": older_than_seq}
            return c

        def validate(cur: dict[str, Any]) -> None:
            # full-table rewrite: ANY concurrent data commit makes it stale
            if self._all_tokens(cur) != base_tokens:
                raise CommitConflictError(
                    f"table changed under expire_tombstones on {self.path}"
                )

        committed = self._commit_with_rebase(build, -1, "expire", m, validate)
        return committed["version"]

    def delta_stats(self, version: int | None = None) -> dict[str, Any]:
        """Merge-on-read pressure per bucket, from manifest metadata only
        (no segment IO): how many delta layers and bytes each bucket
        carries — the signal a background compaction scheduler triggers
        on (``compact_deltas(min_deltas=...)``), and the read-overhead
        observable (a read folds ``layers`` generations per bucket)."""
        m = self.manifest(version)
        per_bucket = {
            b: {
                "layers": len(refs),
                "bytes": sum(int(r.get("bytes", 0)) for r in refs),
                "files": sum(int(r.get("n", 0)) for r in refs),
            }
            for b, refs in self._delta_refs(m).items()
            if refs
        }
        wm = {k: int(v) for k, v in (m.get("watermarks") or {}).items()}
        return {
            "buckets_with_deltas": len(per_bucket),
            "total_layers": sum(v["layers"] for v in per_bucket.values()),
            "total_bytes": sum(v["bytes"] for v in per_bucket.values()),
            "max_layers": max((v["layers"] for v in per_bucket.values()), default=0),
            "per_bucket": per_bucket,
            # per-writer committed-seq watermarks + the horizon they imply:
            # the operator-facing view of WHICH laggard (or dead writer —
            # see drop_watermark) is pinning tombstone expiry
            "watermarks": wm,
            "safe_tombstone_horizon": self.safe_tombstone_horizon(m),
        }

    def compact_deltas(
        self, buckets: list[int] | None = None, min_deltas: int = 1
    ) -> dict[str, int]:
        """Background compaction (merge-on-read maintenance): fold the
        selected buckets' delta segments into their base files and clear
        the delta lists. Work ∝ the folded buckets' bytes — schedule it
        off the ingest path (size- or count-triggered, e.g.
        ``min_deltas=8``), exactly like Iceberg's rewrite_data_files.
        Conflict-safe: bucket tokens validate against concurrent ingest
        (a racing merge or delta commit to a target bucket invalidates
        this job, which yields — ingest always wins)."""
        m = self.manifest()
        sel = None if buckets is None else {int(b) for b in buckets}
        target = sorted(
            int(b)
            for b, refs in self._delta_refs(m).items()
            if len(refs) >= min_deltas and (sel is None or int(b) in sel)
        )
        if not target:
            return {"buckets": 0, "version": int(m["version"])}
        target_set = set(target)
        # read() folds base ∪ deltas for these buckets; tombstones kept
        folded = self.read(buckets=target, manifest=m, system=True)
        new_files = self._write_data(folded, m)
        new_segs = {b: self._write_segment(fs) for b, fs in new_files.items()}
        base_tokens = {b: self._bucket_token(m, b) for b in target}

        def build(cur: dict[str, Any]) -> dict[str, Any]:
            refs = {
                b: r
                for b, r in self._seg_refs_for_write(cur).items()
                if int(b) not in target_set
            }
            refs.update(new_segs)
            c = dict(cur)
            c.pop("files", None)
            c["segments"] = refs
            c["deltas"] = {
                b: v for b, v in self._delta_refs(cur).items() if int(b) not in target_set
            }
            c["version"] = cur["version"] + 1
            c["parent"] = cur["version"]
            c["summary"] = {
                "operation": "compact-deltas",
                "buckets": len(target),
                "total_files_bytes": _refs_total_bytes(refs),
            }
            return c

        def validate(cur: dict[str, Any]) -> None:
            for b in target:
                if self._bucket_token(cur, b) != base_tokens[b]:
                    raise CommitConflictError(
                        f"bucket {b} changed under compact_deltas on {self.path}"
                    )

        committed = self._commit_with_rebase(build, -1, "compact-deltas", m, validate)
        return {"buckets": len(target), "version": int(committed["version"])}

    def rebucket(self, new_num_buckets: int) -> int:
        """Bucket-count evolution: rewrite the table under a new bucket
        spec in one conflict-checked commit (a table grown 100× needs
        4096 buckets where it started with 64 — fixed specs are a CREATE
        -time guess, not a lifetime contract). Deltas are folded in the
        rewrite. Concurrent ingest is safe in both orders: a merge that
        commits first fails THIS job's validation (ingest wins, rerun the
        migration); a migration that commits first fails the merge's
        bucket-token validation — and a merge still *preparing* detects
        the spec change via ``PreparedMerge.num_buckets`` and recomputes
        its bucket set — so the retried merge reads the new layout.
        Readers of pruned scans always derive bucket ids from the same
        manifest they read (GraphSync/RollupSync re-verify the spec per
        epoch)."""
        m = self.manifest()
        df = self.read(manifest=m, system=True)  # folds deltas
        m2 = dict(m)
        m2["num_buckets"] = int(new_num_buckets)
        m2.pop("migration", None)  # plain new-spec routing for the rewrite
        new_files = self._write_data(df, m2)
        new_segs = {b: self._write_segment(fs) for b, fs in new_files.items()}
        base_tokens = self._all_tokens(m)

        def build(cur: dict[str, Any]) -> dict[str, Any]:
            c = dict(cur)
            c.pop("files", None)
            c.pop("migration", None)  # a rebucket supersedes any in-flight migration
            c["num_buckets"] = int(new_num_buckets)
            c["segments"] = dict(new_segs)
            c["deltas"] = {}
            c["version"] = cur["version"] + 1
            c["parent"] = cur["version"]
            c["summary"] = {
                "operation": "rebucket",
                "num_buckets": int(new_num_buckets),
                "total_files_bytes": _refs_total_bytes(new_segs),
            }
            return c

        def validate(cur: dict[str, Any]) -> None:
            # full-table rewrite: ANY concurrent data commit makes it stale
            if self._all_tokens(cur) != base_tokens:
                raise CommitConflictError(
                    f"table changed under rebucket on {self.path}"
                )

        committed = self._commit_with_rebase(build, -1, "rebucket", m, validate)
        return int(committed["version"])

    # ------------------------------------------- progressive rebucket

    def rebucket_start(self, new_num_buckets: int) -> int:
        """Begin a PROGRESSIVE bucket-count migration (VERDICT r4 #1:
        the monolithic ``rebucket`` rewrites the whole table in one
        commit that any concurrent commit invalidates — on a
        continuously-ingesting 100 TB table it can never land and would
        be a stop-the-world-sized job anyway). The progressive form
        keeps both specs in the manifest (``migration: {new_num_buckets,
        frontier}``) and migrates old buckets in small conflict-checked
        batches (``rebucket_step``): old buckets below the frontier live
        under the new modulus, the rest under the old one, and every
        reader/writer routes per key through the frontier CASE
        (``_bucket_expr``). Ingest never pauses — a step that loses a
        race with a merge yields and retries, a merge that loses to a
        step recomputes its bucket set (``PreparedMerge.spec_token``).

        ``new_num_buckets`` must be a MULTIPLE of the current count: old
        bucket b then splits into exactly {b + j·old_n}, so a key's new
        bucket is derivable from its hash alone and the two numbering
        spaces never collide (a new-spec id below old_n only ever holds
        a subset of the same old bucket's keys).

        This start commit is metadata-only (frontier 0 routes like the
        old spec); returns the manifest version."""
        m = self.manifest()
        old_n, new_n = int(m["num_buckets"]), int(new_num_buckets)
        if new_n % old_n != 0 or new_n <= old_n:
            raise ValueError(
                f"progressive rebucket needs a strict multiple of {old_n}, got {new_n}"
            )
        if m.get("migration"):
            raise CommitConflictError(f"migration already active on {self.path}")

        def build(cur: dict[str, Any]) -> dict[str, Any]:
            c = dict(cur)
            c["migration"] = {"new_num_buckets": new_n, "frontier": 0}
            c["version"] = cur["version"] + 1
            c["parent"] = cur["version"]
            c["summary"] = {"operation": "rebucket-start", "num_buckets": new_n}
            return c

        def validate(cur: dict[str, Any]) -> None:
            if cur.get("migration") or int(cur["num_buckets"]) != old_n:
                raise CommitConflictError(f"concurrent rebucket on {self.path}")

        committed = self._commit_with_rebase(build, -1, "rebucket-start", m, validate)
        return int(committed["version"])

    def rebucket_step(self, max_buckets: int = 1) -> dict[str, int]:
        """Migrate the next ``max_buckets`` old buckets past the
        frontier: read exactly those buckets (LWW-folding their deltas,
        keeping tombstones), rewrite their rows under the new modulus,
        and advance the frontier in the same commit. Work per step ∝ the
        migrated buckets' bytes — the unit a scheduler sizes to fit
        between ingest epochs. Conflict-checked per step: a merge that
        lands on a migrating bucket first invalidates only THIS step
        (ingest wins; rerun the step), not the whole migration.

        Returns ``{migrated, remaining, version}``; ``remaining == 0``
        means ``rebucket_finish`` can seal the new spec."""
        m = self.manifest()
        mig = m.get("migration")
        if not mig:
            raise ValueError(f"no active migration on {self.path}")
        old_n = int(m["num_buckets"])
        lo = int(mig["frontier"])
        hi = min(old_n, lo + max(1, int(max_buckets)))
        if lo >= old_n:
            return {"migrated": 0, "remaining": 0, "version": int(m["version"])}
        batch = list(range(lo, hi))
        # the batch's routed ids under the CURRENT frontier are the old
        # ids themselves (they are at-or-above the frontier)
        df = self.read(buckets=batch, manifest=m, system=True)
        m_step = dict(m)
        m_step["migration"] = {"new_num_buckets": int(mig["new_num_buckets"]), "frontier": hi}
        new_files = self._write_data(df, m_step)
        new_segs = {b: self._write_segment(fs) for b, fs in new_files.items()}
        batch_set = set(batch)
        base_tokens = {b: self._bucket_token(m, b) for b in batch}

        def build(cur: dict[str, Any]) -> dict[str, Any]:
            refs = {
                b: r
                for b, r in self._seg_refs_for_write(cur).items()
                if int(b) not in batch_set
            }
            refs.update(new_segs)
            c = dict(cur)
            c.pop("files", None)
            c["segments"] = refs
            # the fold consumed the migrated buckets' deltas
            c["deltas"] = {
                b: v
                for b, v in self._delta_refs(cur).items()
                if int(b) not in batch_set
            }
            c["migration"] = dict(m_step["migration"])
            c["version"] = cur["version"] + 1
            c["parent"] = cur["version"]
            c["summary"] = {
                "operation": "rebucket-step",
                "frontier": hi,
                "buckets": len(batch),
                "total_files_bytes": _refs_total_bytes(refs),
            }
            return c

        def validate(cur: dict[str, Any]) -> None:
            # only the migrating buckets must be unchanged — commits on
            # other buckets interleave freely with the migration
            cm = cur.get("migration")
            if (
                not cm
                or int(cur["num_buckets"]) != old_n
                or int(cm["new_num_buckets"]) != int(mig["new_num_buckets"])
                or int(cm["frontier"]) != lo
            ):
                raise CommitConflictError(
                    f"migration state changed under rebucket_step on {self.path}"
                )
            for b in batch:
                if self._bucket_token(cur, b) != base_tokens[b]:
                    raise CommitConflictError(
                        f"bucket {b} changed under rebucket_step on {self.path}"
                    )

        committed = self._commit_with_rebase(build, -1, "rebucket-step", m, validate)
        return {
            "migrated": len(batch),
            "remaining": old_n - hi,
            "version": int(committed["version"]),
        }

    def rebucket_finish(self) -> int:
        """Seal a completed migration: every old bucket is below the
        frontier, so the frontier routing already equals plain
        ``pmod(hash, new_n)`` — this commit is pure metadata
        (num_buckets := new_n, migration dropped; ids are unchanged)."""
        m = self.manifest()
        mig = m.get("migration")
        if not mig:
            raise ValueError(f"no active migration on {self.path}")
        old_n = int(m["num_buckets"])
        if int(mig["frontier"]) < old_n:
            raise ValueError(
                f"migration incomplete on {self.path}: frontier "
                f"{mig['frontier']}/{old_n}"
            )
        new_n = int(mig["new_num_buckets"])

        def build(cur: dict[str, Any]) -> dict[str, Any]:
            c = dict(cur)
            c.pop("migration", None)
            c["num_buckets"] = new_n
            c["version"] = cur["version"] + 1
            c["parent"] = cur["version"]
            c["summary"] = {"operation": "rebucket-finish", "num_buckets": new_n}
            return c

        def validate(cur: dict[str, Any]) -> None:
            cm = cur.get("migration")
            if (
                not cm
                or int(cur["num_buckets"]) != old_n
                or int(cm["new_num_buckets"]) != new_n
                or int(cm["frontier"]) < old_n
            ):
                raise CommitConflictError(
                    f"migration state changed under rebucket_finish on {self.path}"
                )

        committed = self._commit_with_rebase(build, -1, "rebucket-finish", m, validate)
        return int(committed["version"])

    def rebucket_progressive(
        self,
        new_num_buckets: int,
        buckets_per_step: int = 4,
        max_step_retries: int = 100,
        backoff_s: float = 0.05,
    ) -> int:
        """Drive a full progressive migration to completion against live
        ingest: start (no-op if this migration is already active, so a
        crashed migrator just resumes from the committed frontier), then
        step until the frontier covers every old bucket — each step
        retried with backoff when ingest wins a bucket race — then
        finish. Ingest is never paused and never loses a commit to the
        migration; the soak test migrates a table mid-replay and
        converges. Returns the final manifest version."""
        try:
            self.rebucket_start(new_num_buckets)
        except CommitConflictError:
            mig = self.manifest().get("migration")
            if not mig or int(mig["new_num_buckets"]) != int(new_num_buckets):
                raise  # a DIFFERENT migration is active — genuinely conflicted
        retries = 0
        while True:
            try:
                res = self.rebucket_step(max_buckets=buckets_per_step)
            except CommitConflictError:
                retries += 1
                if retries > max_step_retries:
                    raise
                time.sleep(backoff_s * min(retries, 10))
                continue
            if res["remaining"] == 0:
                break
        return self.rebucket_finish()

    # -------------------------------------------------------- maintenance

    def expire_snapshots(self, keep_last: int = 3, older_than_seconds: float | None = None) -> int:
        """Drop old manifests, segment files and commit dirs no kept
        snapshot references (Iceberg expire_snapshots +
        remove_orphan_files; orphaned segments also arise from commit
        retries, which write fresh segment files per attempt).

        ``older_than_seconds``: age grace (Iceberg's ``older_than`` /
        ``remove_orphan_files(older_than=...)``) — never expire a
        snapshot committed more recently than this, and never remove an
        "orphan" commit dir or segment file younger than it. Both halves
        matter under concurrency: an in-flight merge (a) reads data
        files of its base snapshot until its job finishes, and (b)
        writes its new commit dir BEFORE any manifest references it —
        so without the grace a concurrent cleanup sees a live write as
        an orphan and deletes it mid-job. Concurrent maintenance MUST
        pass a grace exceeding the longest expected commit (the soak
        test runs exactly this interleaving)."""
        snap_dir = os.path.join(self.path, _SNAP_DIR)
        versions = self.versions()
        keep = set(versions[-keep_last:])
        with self._cache_lock:
            keep |= {v for v in self._pinned_versions if v in versions}
        if older_than_seconds is not None:
            cutoff = time.time() - older_than_seconds
            for v in versions:
                if v in keep:
                    continue
                try:
                    if self.io.getmtime(os.path.join(snap_dir, f"v{v:08d}.json")) >= cutoff:
                        keep.add(v)
                except OSError:
                    keep.add(v)
        live_commits: set[str] = set()
        live_segs: set[str] = set()
        for v in keep:
            mm = json.loads(self.io.read_text(os.path.join(snap_dir, f"v{v:08d}.json")))
            for ref in (mm.get("segments") or {}).values():
                live_segs.add(os.path.basename(ref["path"]))
            for refs in self._delta_refs(mm).values():
                for ref in refs:
                    live_segs.add(os.path.basename(ref["path"]))
            for e in self._entries(mm) + self._delta_entries(mm):
                live_commits.add(e["path"].split(os.sep)[1])
        removed = 0
        for v in versions:
            if v not in keep:
                self.io.remove(os.path.join(snap_dir, f"v{v:08d}.json"))
                with self._cache_lock:
                    self._man_cache.pop(v, None)
                removed += 1

        def too_young(path: str) -> bool:
            if older_than_seconds is None:
                return False
            try:
                return self.io.getmtime(path) >= time.time() - older_than_seconds
            except OSError:
                return True  # vanished/unreadable: leave it alone

        data_dir = os.path.join(self.path, _DATA_DIR)
        for d in self.io.listdir(data_dir):
            p = os.path.join(data_dir, d)
            if d.startswith("commit-") and d not in live_commits and not too_young(p):
                self.io.rmtree(p)
        seg_dir = os.path.join(self.path, _SEG_DIR)
        if self.io.exists(seg_dir):
            for f in self.io.listdir(seg_dir):
                p = os.path.join(seg_dir, f)
                if f.startswith("seg-") and f not in live_segs and not too_young(p):
                    self.io.remove(p)
                    with self._cache_lock:
                        self._seg_cache.pop(os.path.join(_SEG_DIR, f), None)
        return removed
