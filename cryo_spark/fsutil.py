"""Shared pyarrow filesystem resolution.

One policy, three consumers (WARC member streaming, CDX ranged
fetches, maintenance file sizing) — previously three drifting copies:

- ``file:`` URIs normalize to local paths (``file:///x`` and
  ``file:/x`` forms),
- Hadoop's ``s3a``/``s3n`` spellings map to pyarrow's ``s3`` driver,
- any other remote scheme resolves via ``FileSystem.from_uri`` and a
  resolution failure PROPAGATES — a silent LocalFileSystem fallback
  on ``s3a://...`` would fail later with a misleading
  FileNotFoundError that hides the real cause (unsupported scheme /
  missing pyarrow FS driver).
"""

from __future__ import annotations


def resolve_fs(path: str):
    """(pyarrow FileSystem, filesystem-local path) for ``path``."""
    import pyarrow.fs as pafs

    if path.startswith("file:"):
        local = path.split(":", 1)[1]
        while local.startswith("//"):
            local = local[1:]
        return pafs.LocalFileSystem(), local
    if "://" in path:
        scheme, rest = path.split("://", 1)
        if scheme in ("s3a", "s3n"):
            path = f"s3://{rest}"
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path
