"""Crash-safe directory swap via Hadoop ``FileSystem.rename`` — the
shared machinery behind every layout-rewriting compaction
(:func:`~lshrs_spark.functions.text.bm25_compact`,
:func:`~lshrs_spark.operators.knn.truncated_ivf_compact`): write the
rewritten tree to a temp sibling, rename the live tree aside, rename
the temp into place, THEN delete the old tree — a crash at any point
leaves a recoverable layout at ``path`` or ``path.old-*``.

Only filesystems whose rename is ATOMIC qualify: on an object store
(s3/s3a/gs/...) "rename" is a non-atomic copy, which would void the
crash-safety contract, so those schemes are refused up front.
"""

from __future__ import annotations

ATOMIC_RENAME_SCHEMES = ("file", "hdfs", "viewfs")


def resolve_rename_fs(spark, path: str, *, label: str):
    """``(fs, qualified_dst)`` — the Hadoop filesystem that actually
    owns ``path`` (a scheme-less path resolves against the session's
    ``fs.defaultFS``, so the swap runs where Spark reads and writes,
    not blindly on the local disk — ADVICE r7) plus the qualified
    destination Path. Raises ``ValueError`` for any filesystem whose
    rename is a non-atomic copy, BEFORE any destructive call."""
    # Cheap string guard first: an absent FS impl for e.g. s3:// would
    # otherwise surface as an opaque JVM error instead of a ValueError.
    if "://" in path:
        scheme = path.split("://", 1)[0]
        if scheme not in ATOMIC_RENAME_SCHEMES:
            raise ValueError(
                f"{label} swaps directories via filesystem rename; "
                f"rename on {scheme!r} is a non-atomic copy — got "
                f"non-local path {path!r}"
            )
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    dst = jvm.org.apache.hadoop.fs.Path(path)
    fs = dst.getFileSystem(hconf)
    resolved = fs.getUri().getScheme()
    # Scheme-less paths resolve against fs.defaultFS — re-check what
    # they actually landed on before any (possibly large) rewrite.
    if resolved not in ATOMIC_RENAME_SCHEMES:
        raise ValueError(
            f"{label} swaps directories via filesystem rename; "
            f"rename on the session default filesystem {resolved!r} is "
            f"a non-atomic copy — got non-local path {path!r}"
        )
    return fs, fs.makeQualified(dst)


def swap_via_rename(fs, dst, tmp_p, old, *, label: str) -> None:
    """Two-hop atomic directory swap: ``dst`` → ``old``, ``tmp_p`` →
    ``dst``, delete ``old``. Hadoop ``FileSystem.rename`` signals
    failure by RETURNING false, not raising — both hops are checked,
    and a failed second hop restores the original at ``dst`` AND
    deletes the now-dead tmp tree (ADVICE r8: the rollback used to
    strand the fully-written tmp on disk) so a crash-free failure
    leaves exactly the pre-call layout. ``fs`` only needs
    ``rename(a, b) -> bool`` / ``delete(p, recursive)`` — duck-typed
    so the failure branches are unit-testable without a JVM."""
    if not fs.rename(dst, old):
        raise IOError(f"{label}: renaming {dst} aside failed")
    if not fs.rename(tmp_p, dst):
        # The rollback rename can ALSO fail (ADVICE r9) — then nothing
        # is deleted and the error names both surviving trees so the
        # operator can restore by hand; claiming "restored" while dst
        # is gone would be worse than the failure itself.
        if not fs.rename(old, dst):
            raise IOError(
                f"{label}: renaming the rewritten tree into {dst} "
                f"failed AND the rollback rename failed — the original "
                f"tree is preserved at {old} and the rewritten tree at "
                f"{tmp_p}; move one of them back to {dst} manually"
            )
        # best-effort: never let tmp cleanup mask the real error
        try:
            fs.delete(tmp_p, True)
        except Exception:
            pass
        raise IOError(
            f"{label}: renaming the rewritten tree into {dst} "
            f"failed; original layout restored"
        )
    fs.delete(old, True)
