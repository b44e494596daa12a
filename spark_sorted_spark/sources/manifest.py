"""Manifest-committed store directories — the object-store-safe
publish protocol for the persisted stores (ANN indexes, band stores).

THE STORAGE CONTRACT. The default publish discipline everywhere in
this repo is RENAME-AS-COMMIT (``_swap_in`` / ``_publish``): stage a
complete directory, then one ``FileSystem.rename`` lands it whole.
That is atomic on HDFS and on local filesystems — but NOT on
S3-style object stores, where a directory "rename" is a per-object
copy+delete: a reader (or a crash) mid-rename sees a torn store.

This module is the alternative for object stores: a GENERATION
pointer. Data is written under ``{root}/gen-{k}/`` (a fresh directory
— no renames at all), and the commit is writing the small
``{root}/_current`` pointer file LAST. A single-object PUT is atomic
on every store Hadoop supports (S3 included: PUTs are atomic and
strongly consistent since 2020), so readers resolve either the old
generation or the new one — never a mix.

Protocol:

* ``begin_generation(spark, root)``  — returns the next staged
  generation dir (``{root}/gen-{k}``). Write the complete store
  there; nothing is visible yet (readers follow the pointer).
* ``commit_generation(spark, root, gen_dir)`` — writes ``_current``
  pointing at ``gen_dir`` (the atomic commit), then best-effort
  deletes older generations (crash before GC leaves garbage
  generations, never a broken store; the next commit retries the GC).
* ``resolve_root(spark, root)``      — the READ-side hook: follows
  ``_current`` when present, else returns ``root`` unchanged (legacy
  rename-layout stores keep working; the two layouts are
  distinguished by the pointer's existence).

Crash matrix: before the gen write completes → pointer still names
the old generation, staged dir is garbage (GC'd by the next commit);
after the pointer PUT → new store live, old generations garbage.
There is no intermediate state a reader can observe.

In-flight readers vs GC: a query that resolved gen-{k} keeps listing
files from it; ``commit_generation`` deletes old generations
immediately, which can fail such a reader mid-scan (the standard
snapshot-GC trade-off). Pass ``keep`` > 1 to retain prior
generations for long-running readers.
"""

from __future__ import annotations

__all__ = ["begin_generation", "commit_generation", "resolve_root"]

_POINTER = "_current"


def _fs(spark, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _read_pointer(spark, root: str) -> str | None:
    fs, _, jvm = _fs(spark, root)
    ppath = jvm.org.apache.hadoop.fs.Path(f"{root}/{_POINTER}")
    if not fs.exists(ppath):
        return None
    stream = fs.open(ppath)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        line = reader.readLine()
        return line.strip() if line else None
    finally:
        stream.close()


def _gen_dirs(spark, root: str) -> list[int]:
    fs, hpath, _ = _fs(spark, root)
    if not fs.exists(hpath):
        return []
    out = []
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if name.startswith("gen-"):
            try:
                out.append(int(name[4:]))
            except ValueError:
                continue
    return sorted(out)


def begin_generation(spark, root: str) -> str:
    """Next staged generation directory under ``root``. Nothing under
    it is reader-visible until :func:`commit_generation` flips the
    pointer. A leftover staged dir from a crashed build with the same
    number cannot exist: numbering is max(existing)+1 and crashed
    stages still occupy their number until GC'd."""
    gens = _gen_dirs(spark, root)
    nxt = (gens[-1] + 1) if gens else 0
    return f"{root}/gen-{nxt}"


def commit_generation(spark, root: str, gen_dir: str, keep: int = 1) -> None:
    """Atomically publish ``gen_dir`` (write the ``_current`` pointer
    LAST — one small-object PUT), then best-effort delete all but the
    newest ``keep`` generations at or below the committed one."""
    gen_name = gen_dir.rstrip("/").rsplit("/", 1)[-1]
    if not gen_name.startswith("gen-"):
        raise ValueError(f"{gen_dir!r} is not a generation dir")
    fs, _, jvm = _fs(spark, root)
    ppath = jvm.org.apache.hadoop.fs.Path(f"{root}/{_POINTER}")
    # single create-overwrite: one PUT on object stores. (On HDFS/local
    # a crash mid-write could leave a torn pointer; those filesystems
    # have atomic rename, so the rename-layout stores are the right
    # tool there — this protocol targets stores where the PUT is the
    # atomic primitive. resolve_root treats an unreadable/dangling
    # pointer as loud, not silent.)
    stream = fs.create(ppath, True)
    try:
        stream.write(bytearray(gen_name + "\n", "utf-8"))
    finally:
        stream.close()
    committed = int(gen_name[4:])
    survivors = set(
        g for g in _gen_dirs(spark, root) if g <= committed
    )
    survivors = set(sorted(survivors)[-max(1, keep):]) | {committed}
    for g in _gen_dirs(spark, root):
        if g not in survivors and g <= committed:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{root}/gen-{g}"), True
            )


def resolve_root(spark, root: str) -> str:
    """READ-side resolution: follow the ``_current`` pointer when the
    store is manifest-committed, else return ``root`` (legacy rename
    layout). A pointer naming a missing generation raises — that is a
    corrupted store, and silently reading ``root`` would return an
    empty/garbage relation."""
    gen = _read_pointer(spark, root)
    if gen is None:
        return root
    fs, _, jvm = _fs(spark, root)
    gpath = jvm.org.apache.hadoop.fs.Path(f"{root}/{gen}")
    if not fs.exists(gpath):
        raise IOError(
            f"store at {root!r}: _current points at {gen!r} which does "
            "not exist — torn or corrupted manifest commit"
        )
    return f"{root}/{gen}"
