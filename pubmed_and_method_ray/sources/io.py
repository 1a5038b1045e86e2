"""Parquet read wrapper that strips schema metadata.

A ``pa.Schema`` carrying ANY key/value metadata dict — even an empty
one — is unhashable (``hash(schema)`` raises ``unhashable type:
'dict'``). Ray's block-schema dedup (``set(schemas)`` in
ray/data/_internal/arrow_ops/transform_pyarrow.py:unify_schemas) runs
both in hash-shuffle aggregators AND inside the fused
``ReadParquet->SplitBlocks`` read task itself, so any block born with
the parquet writer's ``b'pandas'`` metadata logs ``Failed to hash the
schemas (for deduplication)`` and falls through to the slow unify
path. A downstream strip stage cannot silence the read-task instance —
the blocks must be born clean. The metadata is purely informational
for this engine, so the reader probes the first file's footer and
passes an explicitly metadata-free ``schema=`` to ``read_parquet``;
that also preserves ``input_files()`` for partition-pruned reads,
which a ``map_batches`` wrapper would hide. The fused strip stage
remains only for inconclusive probes (globs, remote paths).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    if t.schema.metadata is not None:
        return t.replace_schema_metadata(None)
    return t


def _probe_schema(paths) -> "pa.Schema | None":
    """Footer schema of the first local parquet file under ``paths``
    (descending one level into a directory), or None when inconclusive
    (glob, remote, unreadable) — callers must then strip defensively."""
    import os

    import pyarrow.parquet as pq

    p = paths[0] if isinstance(paths, (list, tuple)) else paths
    try:
        if not isinstance(p, str):
            return None
        if os.path.isdir(p):
            inner = sorted(
                f for f in os.listdir(p) if f.endswith(".parquet")
            )
            if not inner:
                return None
            p = os.path.join(p, inner[0])
        if not os.path.isfile(p):
            return None
        return pq.ParquetFile(p).schema_arrow
    except Exception:
        return None


def _cleaned(schema: pa.Schema) -> "pa.Schema | None":
    """Schema with all key/value metadata removed (schema- and
    field-level); None if it was already clean."""
    dirty = schema.metadata is not None or any(
        schema.field(i).metadata is not None for i in range(len(schema))
    )
    if not dirty:
        return None
    return pa.schema(
        [schema.field(i).remove_metadata() for i in range(len(schema))],
        metadata=None,
    )


def read_parquet_clean(paths, *, columns=None, **kwargs) -> "rd.Dataset":
    """``rd.read_parquet`` whose blocks carry no schema metadata.

    Probes the first file's footer: already-clean files (this engine's
    own ``write_parquet`` output) read as-is; files with writer
    metadata read under an explicit stripped ``schema=`` so the blocks
    are clean from birth (no extra stage, ``input_files()`` intact).
    Only an inconclusive probe falls back to the fused strip stage.

    The explicit-``schema=`` fast path assumes a HOMOGENEOUS multi-file
    layout (every file carries the probed footer's schema — true for
    this engine's own checkpoints and the test tables). A requested
    column absent from the probed footer (e.g. a hive partition key
    that lives in the directory name, or schema drift across files)
    falls back to the strip-stage path, where Ray's reader unifies
    schemas per file instead of forcing the first footer's."""
    from ..rayutil import tune_data_context

    # Every pipeline reads through here, so this is the one place the
    # cluster-sized read-block floor (rayutil.tune_data_context) is
    # guaranteed to be set before the read op is planned. Pre-init the
    # fallback cpus may undershoot, which is harmless: Ray's own
    # avail_cpus*2 baseline re-floors parallelism at execution time.
    tune_data_context()
    if "schema" not in kwargs:
        probed = _probe_schema(paths)
        if probed is not None:
            clean = _cleaned(probed)
            if clean is None:
                return rd.read_parquet(paths, columns=columns, **kwargs)
            try:
                if columns is not None:
                    clean = pa.schema([clean.field(c) for c in columns])
                return rd.read_parquet(
                    paths, columns=columns, schema=clean, **kwargs
                )
            except KeyError:
                pass  # column not in the probed footer: strip-stage path
    ds = rd.read_parquet(paths, columns=columns, **kwargs)
    return ds.map_batches(strip_schema_metadata, batch_format="pyarrow")
