"""Raw-table access with a pluggable active source.

Dataset transforms call ``raw(spark, name)``; by default that reads
the replay parquet lake. ``use_source`` activates an
:class:`cryo_spark.sources.online.OnlineSource` (live JSON-RPC fetch
stages) for the families it serves — the Spark analog of the
reference passing its ``Source`` into every dataset collector
(crates/freeze/src/types/sources.rs)."""

from __future__ import annotations

from contextlib import contextmanager

from cryo_spark.sources import replay

_ACTIVE = None


def raw(spark, name: str, fixtures_dir: str | None = None):
    if _ACTIVE is not None and _ACTIVE.serves(name):
        return _ACTIVE.raw(spark, name)
    return replay.raw(spark, name, fixtures_dir)


@contextmanager
def use_source(source):
    """Activate ``source`` for raw-table reads inside the block; a
    None source is a no-op (replay stays active)."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = source if source is not None else prev
    try:
        yield source
    finally:
        _ACTIVE = prev


__all__ = ["raw", "use_source"]
