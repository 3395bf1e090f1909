"""Hadoop FileSystem helpers shared by every control-plane storage layer.

All control/metadata I/O (raw-zone seals, state/pointer CURRENT swaps,
version manifests) must go through the Hadoop FS API so the SAME code runs
on ``file://``, ``viewfs://``, ``hdfs://`` and ``s3a://`` roots — a Python
``open()``/``os.replace`` shortcut silently confines a component to the
driver's local disk, which is exactly the portability gap the reference's
SQLite ledger has (reference src/gads_etl/state_store.py:40-59) and this
engine must not reproduce.

Every helper takes ``(spark, path)`` and resolves the filesystem from the
path's scheme against the session's Hadoop configuration, so mount tables
(viewfs) and per-bucket credentials (s3a) behave exactly as they would for
Spark's own readers and writers.
"""

from __future__ import annotations

import uuid


def get_fs(spark, path: str):
    """Resolve ``(FileSystem, Path)`` for a URI or local path."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def exists(spark, path: str) -> bool:
    fs, hpath = get_fs(spark, path)
    return fs.exists(hpath)


def mkdirs(spark, path: str) -> None:
    fs, hpath = get_fs(spark, path)
    fs.mkdirs(hpath)


def delete(spark, path: str, recursive: bool = True) -> bool:
    fs, hpath = get_fs(spark, path)
    return fs.delete(hpath, recursive)


def list_names(spark, path: str) -> list[str]:
    """Child entry names of a directory ([] when it does not exist)."""
    fs, hpath = get_fs(spark, path)
    if not fs.exists(hpath):
        return []
    return [status.getPath().getName() for status in fs.listStatus(hpath)]


def read_text(spark, path: str) -> str | None:
    """Full contents of a small text file, or None when absent.

    Meant for pointers and manifests (tens of bytes to a few KB) — data
    files always go through Spark readers.
    """
    fs, hpath = get_fs(spark, path)
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        # commons-io ships on Spark's classpath; one call reads the stream
        # without a per-byte Py4J round trip.
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _is_already_exists(exc: Exception) -> bool:
    """True when a Py4J error wraps a file-already-exists condition.

    Hadoop filesystems signal an exclusive-create collision as
    ``FileAlreadyExistsException`` (HDFS namenode, LocalFileSystem) or
    ``AlreadyBeingCreatedException`` (HDFS lease conflict); string-match
    because the wrapped class varies by FS implementation.
    """
    text = str(exc)
    return ("AlreadyExists" in text or "AlreadyBeingCreated" in text
            or "already exists" in text)


def create_text_exclusive(spark, path: str, content: str) -> None:
    """Publish a small text file via ``FileSystem.create(path, overwrite=false)``.

    Raises ``FileExistsError`` when the destination already exists — the
    atomic claim primitive used by the versioned-table commit protocol: two
    writers racing to the same sequence number both call this, and the
    filesystem serializes them (atomically on HDFS, where the namenode
    arbitrates the create; best-effort on raw local FS). The loser never
    half-commits: it fails before any reader could see its manifest.
    """
    fs, hpath = get_fs(spark, path)
    try:
        out = fs.create(hpath, False)
    except Exception as exc:  # Py4JJavaError from the JVM boundary
        if _is_already_exists(exc):
            raise FileExistsError(path) from exc
        raise
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def write_text_atomic(spark, path: str, content: str) -> None:
    """Create-then-rename publish of a small text file.

    The temp name is uniquified so concurrent writers on an FS with
    fail-on-existing-destination rename semantics (HDFS) cannot collide on
    the temp path. If the destination already exists and the filesystem
    refuses to clobber it on rename, fall back to delete-then-rename —
    acceptable under the single-writer discipline every control table here
    documents (reference docs/state_store_contract.md:32-33).
    """
    fs, hpath = get_fs(spark, path)
    jvm = spark._jvm
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}.tmp-{uuid.uuid4().hex[:8]}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
    if not fs.rename(tmp, hpath):
        fs.delete(hpath, False)
        if not fs.rename(tmp, hpath):
            raise IOError(f"atomic publish failed for {path}")
