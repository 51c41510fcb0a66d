"""Single-slot persisted intermediates.

``DataFrame.persist()`` keeps full lineage — on a real cluster a lost
executor's blocks are recomputed transparently, which a
``localCheckpoint`` (truncated lineage) turns into a fatal
block-not-found failure. But persisted plans live in Spark's
CacheManager until an explicit ``unpersist``, so a library function that
persists an intermediate on every invocation leaks for the application
lifetime.

This registry resolves the tension: each call site persists into a named
*slot*, and re-invoking the same slot unpersists the previous
invocation's intermediate first. At most one cached copy per operator
exists at any time, lineage stays intact, and ``release_slots()`` frees
everything (tests / long-lived drivers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["persist_slot", "release_slots"]

_SLOTS: dict[str, DataFrame] = {}


def persist_slot(df: DataFrame, slot: str, *, eager: bool = False) -> DataFrame:
    """Persist ``df`` under ``slot``, unpersisting the slot's previous
    occupant (whose consumers, if any remain, fall back to recompute).

    ``eager=True`` materializes the cache immediately — essential before
    a self-join: with a lazy persist both join sides race to populate
    the cache and the upstream pipeline executes twice."""
    old = _SLOTS.pop(slot, None)
    if old is not None:
        _safe_unpersist(old)
    df = df.persist()
    if eager:
        df.count()
    _SLOTS[slot] = df
    return df


def release_slots() -> None:
    """Unpersist every slot (idempotent)."""
    for name in list(_SLOTS):
        _safe_unpersist(_SLOTS.pop(name))


def _safe_unpersist(df: DataFrame) -> None:
    try:
        df.unpersist()
    except Exception:
        pass  # stopped context — nothing to free
