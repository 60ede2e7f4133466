"""Iceberg-style manifest table: per-partition lineage, metrics, and the
checkpoint/resume contract (SURVEY.md B10; BASELINE.json "checkpoint-resumable
with per-partition lineage and metrics logged to an Iceberg manifest table").

No Iceberg runtime jar exists in this environment, so the manifest is a plain
append-only parquet directory with Iceberg-like semantics: every completed
build partition appends one immutable row; a partition is *committed* iff its
row exists with status='done' — data files are written first, the manifest row
last, so a crash between the two leaves an orphan file that is simply
rewritten on resume (idempotent: same input partition -> same bytes). With a
real Iceberg catalog this module swaps to `spark.table(...)` appends
unchanged.

The reference's analogue is the run-dir + config-dump + result-save scaffold
(/root/reference/geoIR/core/runner.py:34-80,113-148) and the report bundle
(/root/reference/geoIR/retrieval/index.py:241-255) — single-process, no
partition granularity; the manifest generalizes both.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

MANIFEST_SCHEMA = (
    "run_id string, stage string, partition_id int, input_fingerprint string, "
    "rows long, bytes long, wall_ms long, status string, output_path string, "
    "committed_at double"
)

# Arrow twin of MANIFEST_SCHEMA: commits are written driver-side (an atomic
# temp-file + rename, no Spark job) — at n_partitions=1000 the previous
# createDataFrame().coalesce(1).write per commit was a thousand serial driver
# jobs, pure Amdahl residue in the build's critical path. The read path is
# still a plain parquet directory scan, so the Iceberg-append analogy holds.
_ARROW_SCHEMA = pa.schema(
    [
        ("run_id", pa.string()),
        ("stage", pa.string()),
        ("partition_id", pa.int32()),
        ("input_fingerprint", pa.string()),
        ("rows", pa.int64()),
        ("bytes", pa.int64()),
        ("wall_ms", pa.int64()),
        ("status", pa.string()),
        ("output_path", pa.string()),
        ("committed_at", pa.float64()),
    ]
)


def manifest_path(index_dir: str) -> str:
    if is_local_path(index_dir):
        return os.path.join(index_dir, "manifest")
    return index_dir.rstrip("/") + "/manifest"


def is_local_path(path: str) -> bool:
    """True when the path is driver-local-filesystem addressable. An
    index_dir on HDFS/S3/ABFS ('scheme://...') must NOT go through the
    os.rename fast commit — those writes route through Spark so the
    resumable-build contract holds on any Hadoop-compatible filesystem."""
    if "://" not in path:
        return True
    return path.split("://", 1)[0] == "file"


def _strip_file_scheme(path: str) -> str:
    return path[len("file://"):] if path.startswith("file://") else path


def fs_for(path: str):
    """-> (pyarrow.fs.FileSystem, fs-native path) for any index path: plain
    local, 'file://'-schemed, or remote (hdfs://, s3://, ... — whatever
    pyarrow.fs.FileSystem.from_uri resolves). Small driver-side filesystem
    operations (meta.json, byte accounting, compaction swaps) route through
    this so an index_dir on a remote filesystem can complete a full
    build -> search -> compact lifecycle, not just the manifest commits."""
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def fs_write_bytes(path: str, data: bytes) -> None:
    fs, p = fs_for(path)
    with fs.open_output_stream(p) as f:
        f.write(data)


_TMP_SWEEP_GRACE_SEC = 300.0


def _sweep_stale_tmp(fs, p: str) -> None:
    """Best-effort delete of orphaned ``<name>.tmp.<uuid>`` siblings left by
    writers that crashed between staging and rename — without a sweep each
    crash leaks one uniquely-named file forever, and crash-loop retries are
    exactly this function's workload. Only siblings older than the grace
    window are removed so a CONCURRENT writer's in-flight staging file (the
    uuid suffix exists for that race) is never deleted; any error means the
    sweep is skipped, never that the write fails."""
    import datetime
    import posixpath

    from pyarrow import fs as pafs

    try:
        parent = posixpath.dirname(p)
        prefix = posixpath.basename(p) + ".tmp."
        cutoff = datetime.datetime.now(datetime.timezone.utc) - \
            datetime.timedelta(seconds=_TMP_SWEEP_GRACE_SEC)
        for info in fs.get_file_info(pafs.FileSelector(parent)):
            if (
                info.type == pafs.FileType.File
                and info.base_name.startswith(prefix)
                and info.mtime is not None
                and info.mtime < cutoff
            ):
                fs.delete_file(info.path)
    except Exception:
        pass


def fs_write_bytes_atomic(path: str, data: bytes) -> None:
    """Crash-safe small-file write: stage to a uniquely-named temp file then
    rename into place, so a reader never sees a torn file (a mid-write crash
    on the direct path leaves e.g. a broken meta.json that fails every
    subsequent load/search/compact). The temp name is uuid-suffixed so two
    concurrent writers (a build retry racing a compact) cannot publish each
    other's half-written bytes through a shared staging name. On rename-less
    object stores the move raises NotImplementedError and we fall back to
    the direct overwrite — object-store PUTs are already atomic per-key, so
    the fallback does not reintroduce the torn-file window there. A LOCAL
    rename failure (EACCES, EXDEV, ...) re-raises instead: falling back
    would silently reintroduce the exact window this function closes."""
    import uuid

    from pyarrow import fs as pafs

    fs, p = fs_for(path)
    _sweep_stale_tmp(fs, p)
    tmp = f"{p}.tmp.{uuid.uuid4().hex}"
    with fs.open_output_stream(tmp) as f:
        f.write(data)
    try:
        fs.move(tmp, p)
        return
    except NotImplementedError:
        pass
    except OSError:
        if isinstance(fs, pafs.LocalFileSystem):
            try:
                fs.delete_file(tmp)
            except (OSError, FileNotFoundError):
                pass
            raise
    with fs.open_output_stream(p) as f:
        f.write(data)
    try:
        fs.delete_file(tmp)
    except (OSError, FileNotFoundError):
        pass


def fs_exists(path: str) -> bool:
    from pyarrow import fs as pafs

    fs, p = fs_for(path)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def fs_delete_file(path: str) -> None:
    fs, p = fs_for(path)
    try:
        fs.delete_file(p)
    except (OSError, FileNotFoundError):
        pass


def fs_move(src: str, dst: str) -> None:
    """Rename within one filesystem (src and dst share a scheme)."""
    fs, s = fs_for(src)
    _, d = fs_for(dst)
    fs.move(s, d)


def fs_supports_dir_move(parent: str) -> bool:
    """Feature-detect directory rename under ``parent`` by probing with a
    throwaway marker dir. pyarrow's S3FileSystem (and other rename-less
    object stores) cannot move directories — compact must detect that
    BEFORE touching the live postings dir, not throw at swap time."""
    fs, p = fs_for(parent)
    probe = f"{p.rstrip('/')}/.dirmove_probe_{uuid.uuid4().hex[:8]}"
    try:
        fs.create_dir(probe, recursive=True)
        fs.move(probe, probe + "_moved")
        fs.delete_dir(probe + "_moved")
        return True
    except (OSError, NotImplementedError):
        for leftover in (probe, probe + "_moved"):
            try:
                fs.delete_dir(leftover)
            except (OSError, FileNotFoundError):
                pass
        return False


def fs_read_bytes(path: str) -> bytes:
    fs, p = fs_for(path)
    with fs.open_input_stream(p) as f:
        return f.read()


def fs_mkdirs(path: str) -> None:
    fs, p = fs_for(path)
    fs.create_dir(p, recursive=True)


def fs_dir_bytes(path: str, suffix: str = ".parquet") -> int:
    """Total size of files with ``suffix`` directly under ``path``."""
    from pyarrow import fs as pafs

    fs, p = fs_for(path)
    return sum(
        info.size
        for info in fs.get_file_info(pafs.FileSelector(p))
        if info.is_file and info.path.endswith(suffix)
    )


def fs_swap_dir(live: str, staged: str, retired_tag: str) -> str:
    """Replace directory ``live`` with ``staged`` via two renames (POSIX
    cannot atomically swap directories): live -> live_retired_<tag>, then
    staged -> live. NOT atomic — a crash between the renames leaves no
    ``live`` directory; recovery is renaming the retired dir back (it still
    holds the complete old contents; this helper never deletes it — callers
    remove it only after the swap succeeds). Returns the retired path."""
    fs, live_p = fs_for(live)
    _, staged_p = fs_for(staged)
    retired = f"{live_p}_retired_{retired_tag}"
    fs.move(live_p, retired)
    fs.move(staged_p, live_p)
    return retired


def fs_rmdir(path: str) -> None:
    fs, p = fs_for(path)
    try:
        fs.delete_dir(p)
    except FileNotFoundError:
        pass


_SWAP_JOURNAL = "swap_journal.json"


def write_swap_journal(index_dir: str, tag: str, lives: list[str]) -> None:
    """Journal a pending compact swap so a crash inside fs_swap_dir's
    non-atomic rename pair is auto-recoverable: the journal names the live
    dirs being swapped and the retired tag, and ``recover_swap`` (run on
    every IndexMeta.load) replays the repair instead of leaving the index
    with no live postings dir until a human renames retired_* back. The
    timestamp lets recover_swap distinguish a crashed swap (stale journal)
    from one in flight (fresh journal) without a lock service."""
    import time

    fs_write_bytes_atomic(
        index_dir.rstrip("/") + "/" + _SWAP_JOURNAL,
        json.dumps({"tag": tag, "lives": lives, "ts": time.time()}).encode(),
    )


def clear_swap_journal(index_dir: str) -> None:
    fs_delete_file(index_dir.rstrip("/") + "/" + _SWAP_JOURNAL)


def recover_swap(index_dir: str, grace_sec: float = 300.0) -> bool:
    """If a STALE swap journal exists, repair each journaled live dir and
    remove the journal. Per dir (states are unambiguous because fs_swap_dir
    only creates retired_* by moving the live dir away):

      * retired exists, live missing  -> crashed between the two renames:
        move retired back (it holds the complete old contents).
      * retired exists, live exists   -> both renames completed but cleanup
        did not: the new data is live, delete retired.
      * no retired                    -> swap never started (or finished and
        cleaned): nothing to do.

    Journals younger than ``grace_sec`` are left untouched: a reader that
    loads while a compact is IN FLIGHT must not move directories out from
    under it or delete its journal (a live swap completes in seconds; only
    a crashed one leaves a journal older than the grace window). Within the
    crash+grace window reads on a half-swapped dir fail transiently — the
    same documented trade-off as before, now bounded by grace_sec instead
    of requiring a human rename. Journals without a timestamp (pre-upgrade)
    are treated as stale. Returns True when repair ran."""
    import time

    jpath = index_dir.rstrip("/") + "/" + _SWAP_JOURNAL
    if not fs_exists(jpath):
        return False
    j = json.loads(fs_read_bytes(jpath))
    # Clock-skew clamp: the journal ts comes from the COMPACT writer's
    # clock, this check runs on the reader's. Negative elapsed (writer
    # clock ahead / NTP step-back here) is tolerated up to grace_sec: on
    # the shared filesystems this path serves, a reader trailing the
    # writer by even seconds would otherwise run recovery against an
    # IN-FLIGHT swap — deleting the journal before the renames start or
    # moving the retired dir back mid-swap (round-5 ADVICE). Beyond the
    # bounded window a future-dated journal cannot belong to an in-flight
    # compact and is treated as stale, so the total outage a skewed clock
    # can cause is 2 * grace_sec, not unbounded.
    elapsed = time.time() - j.get("ts", 0.0)
    if -grace_sec <= elapsed < grace_sec:
        return False
    for live in j["lives"]:
        retired = f"{live}_retired_{j['tag']}"
        if fs_exists(retired):
            if fs_exists(live):
                fs_rmdir(retired)
            else:
                fs_move(retired, live)
    fs_delete_file(jpath)
    return True


def append_manifest(spark: SparkSession, index_dir: str, rows: list[tuple]) -> None:
    path = manifest_path(index_dir)
    if not is_local_path(path):
        # remote filesystem: commit through a Spark job (the pre-round-2
        # path) — slower per commit, but correct on HDFS/S3/ABFS where the
        # driver's POSIX rename cannot reach
        spark.createDataFrame(rows, schema=MANIFEST_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        return
    path = _strip_file_scheme(path)
    os.makedirs(path, exist_ok=True)
    cols = list(zip(*rows))
    table = pa.table(
        {f.name: pa.array(list(c), type=f.type) for f, c in zip(_ARROW_SCHEMA, cols)},
        schema=_ARROW_SCHEMA,
    )
    final = os.path.join(path, f"commit-{uuid.uuid4().hex}.parquet")
    tmp = final + ".tmp"
    pq.write_table(table, tmp)
    os.rename(tmp, final)  # atomic on POSIX: a reader never sees a torn file


def read_manifest(spark: SparkSession, index_dir: str) -> DataFrame | None:
    path = manifest_path(index_dir)
    # existence check first (local only): a fresh build has no manifest, and
    # letting the read throw spews an AnalysisException stack trace into the
    # build log; on remote filesystems the try/except does the probing
    if is_local_path(path):
        local = _strip_file_scheme(path)
        if not os.path.isdir(local) or not any(
            f.endswith(".parquet") for f in os.listdir(local)
        ):
            return None
        return spark.read.parquet(path)
    try:
        return spark.read.parquet(path)
    except Exception as e:
        # ONLY a missing manifest (fresh build) maps to None. A transient
        # remote-FS failure must NOT masquerade as a fresh build: that would
        # bypass the params-pinning guard and let a resume append a second,
        # conflicting 'params' row. AnalysisException with PATH_NOT_FOUND is
        # the missing-directory signal across Hadoop filesystems.
        from pyspark.errors import AnalysisException

        if isinstance(e, AnalysisException) and (
            "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e)
        ):
            return None
        raise


def _local_manifest_rows(index_dir: str, stage: str) -> list[dict] | None:
    """Driver-side read of (stage, status=done) manifest rows for LOCAL
    manifests, or None when the path is remote (caller falls back to the
    Spark read). The manifest is a handful of tiny driver-written parquet
    files; reading them through a Spark job costs a fixed driver/job
    round-trip per resume check — build_index makes five such checks, so on
    a fast small build they are pure Amdahl residue (session N measured the
    total fixed build overhead at ~32 s). pyarrow reads the same files the
    Spark path reads; remote filesystems keep the Spark read because its
    Hadoop connectors are authoritative there."""
    path = manifest_path(index_dir)
    if not is_local_path(path):
        return None
    local = _strip_file_scheme(path)
    if not os.path.isdir(local):
        return []
    rows: list[dict] = []
    for f in sorted(os.listdir(local)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(
            os.path.join(local, f),
            columns=["stage", "status", "partition_id", "input_fingerprint",
                     "rows"],
        )
        for r in t.to_pylist():
            if r["stage"] == stage and r["status"] == "done":
                rows.append(r)
    return rows


def completed_partitions(spark: SparkSession, index_dir: str, stage: str) -> dict[int, str]:
    """partition_id -> input_fingerprint for committed partitions of a stage."""
    local = _local_manifest_rows(index_dir, stage)
    if local is not None:
        return {r["partition_id"]: r["input_fingerprint"] for r in local}
    m = read_manifest(spark, index_dir)
    if m is None:
        return {}
    rows = (
        m.filter((m.stage == stage) & (m.status == "done"))
        .select("partition_id", "input_fingerprint")
        .collect()
    )
    return {r.partition_id: r.input_fingerprint for r in rows}


def stage_rows_total(spark: SparkSession, index_dir: str, stage: str) -> int:
    """Sum of the committed ``rows`` column over a stage's done partitions —
    e.g. the total document count from the docstats commits. Free of any
    Spark job on local manifests; build_index uses it to pick the docmap
    join strategy without counting the docmap."""
    local = _local_manifest_rows(index_dir, stage)
    if local is not None:
        return sum(int(r.get("rows") or 0) for r in local)
    m = read_manifest(spark, index_dir)
    if m is None:
        return 0
    got = (
        m.filter((m.stage == stage) & (m.status == "done"))
        .agg({"rows": "sum"})
        .collect()[0][0]
    )
    return int(got or 0)


def stage_fingerprints(spark: SparkSession, index_dir: str, stage: str) -> list[str]:
    """Distinct input_fingerprints committed for a stage (all partitions).
    The params-pinning guard uses this to detect a manifest holding two
    CONFLICTING 'params' rows — possible only if a past resume ran against
    a manifest it failed to read — before trusting any committed artifact."""
    local = _local_manifest_rows(index_dir, stage)
    if local is not None:
        return sorted({r["input_fingerprint"] for r in local})
    m = read_manifest(spark, index_dir)
    if m is None:
        return []
    return [
        r.input_fingerprint
        for r in m.filter((m.stage == stage) & (m.status == "done"))
        .select("input_fingerprint")
        .distinct()
        .collect()
    ]


def manifest_row(
    run_id: str,
    stage: str,
    partition_id: int,
    input_fingerprint: str,
    rows: int,
    n_bytes: int,
    wall_ms: int,
    output_path: str,
    status: str = "done",
) -> tuple:
    return (
        run_id,
        stage,
        partition_id,
        input_fingerprint,
        rows,
        n_bytes,
        wall_ms,
        status,
        output_path,
        time.time(),
    )
