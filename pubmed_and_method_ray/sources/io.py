"""Parquet read wrapper that strips schema metadata.

A ``pa.Schema`` carrying ANY key/value metadata dict — even an empty
one — is unhashable (``hash(schema)`` raises ``unhashable type:
'dict'``). Ray's hash-shuffle aggregators deduplicate partition-block
schemas with ``set(schemas)`` (ray/data/_internal/arrow_ops/
transform_pyarrow.py:unify_schemas), so every block whose schema still
carries the parquet writer's ``b'pandas'`` metadata makes each
aggregator log ``Failed to hash the schemas (for deduplication)`` and
fall through to the slow unify path. The metadata is purely
informational for this engine, so strip it at the read; the strip
map fuses with the ReadParquet task and the replace is zero-copy.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    if t.schema.metadata is not None:
        return t.replace_schema_metadata(None)
    return t


def _first_file_has_metadata(paths) -> bool:
    """Cheap footer probe: True if the first path is a parquet FILE whose
    schema carries key/value metadata (or the probe is inconclusive —
    directory, glob, remote — in which case we strip defensively)."""
    import os

    import pyarrow.parquet as pq

    p = paths[0] if isinstance(paths, (list, tuple)) else paths
    try:
        if not (isinstance(p, str) and os.path.isfile(p)):
            return True
        return pq.ParquetFile(p).schema_arrow.metadata is not None
    except Exception:
        return True


def read_parquet_clean(paths, *, columns=None, **kwargs) -> "rd.Dataset":
    """``rd.read_parquet`` + metadata strip (fused into the read task).

    When the footer probe shows the files are already metadata-free
    (e.g. written by this engine's own ``write_parquet``), the strip
    stage is skipped entirely — that also preserves ``input_files()``,
    which a ``map_batches`` wrapper would hide."""
    ds = rd.read_parquet(paths, columns=columns, **kwargs)
    if not _first_file_has_metadata(paths):
        return ds
    return ds.map_batches(strip_schema_metadata, batch_format="pyarrow")
