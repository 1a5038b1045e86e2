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


def read_parquet_clean(paths, *, columns=None, **kwargs) -> "rd.Dataset":
    """``rd.read_parquet`` + metadata strip (fused into the read task)."""
    ds = rd.read_parquet(paths, columns=columns, **kwargs)
    return ds.map_batches(strip_schema_metadata, batch_format="pyarrow")
