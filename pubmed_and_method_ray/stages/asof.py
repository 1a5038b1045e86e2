"""Generic as-of join — a temporal operator Ray Data has no native
analog for (the reference's nearest-prior-record lookups are ORDER
BY...LIMIT 1 subqueries; DuckDB spells it ASOF JOIN).

Semantics: for every LEFT row, pick the single RIGHT row with the same
key and the greatest right timestamp that is `<` (strict, default) or
`<=` the left row's timestamp; left rows with no qualifying right row
are dropped (inner as-of).

Ray-Data-first construction:
- both sides are tagged and UNIONed into one stream, then ONE hash
  exchange on the key co-locates every key's rows (left and right) in
  one partition block — the same single-shuffle shape as pair-gen
  (stages/blocking.py), and the same partitioning assumption: Ray
  2.49's hash-shuffle finalize emits one block per partition, so a
  map_batches(batch_size=None) task sees complete key groups.
- inside a block the match is fully vectorized: right rows lexsort by
  (key-code, ts); each probe finds its predecessor with ONE
  searchsorted over packed (key-code * ts-span + ts-offset) uint keys —
  no per-row Python, no per-key loop on the packed path.
- keys of any orderable dtype (int ids, strings) — np.unique factorizes
  both sides against one vocabulary.

At cluster scale this is one all-to-all exchange of only the columns
the join needs (callers prune at the read), and the per-block kernel is
O(n log n) in block rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..rayutil import shuffle_partitions

_SIDE = "__asof_side"


def _null_array(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, typ)


def _asof_block(
    t: pa.Table,
    key_col: str,
    ts_col: str,
    left_cols: list[str],
    right_out: list[tuple[str, str]],
    strict: bool,
    out_schema: pa.Schema,
) -> pa.Table:
    if t.num_rows == 0:
        return out_schema.empty_table()
    t = t.combine_chunks()
    # null keys/timestamps would silently corrupt: a nullable int column
    # comes back from to_numpy as float64 with NaN and the int64 cast
    # turns NaN into INT64_MIN, producing wrong matches — fail loudly
    if t[key_col].null_count or t[ts_col].null_count:
        raise ValueError(
            f"asof_join: null {key_col!r}/{ts_col!r} values are not "
            "supported — filter null key/timestamp rows upstream"
        )
    side = np.asarray(t[_SIDE].to_numpy(zero_copy_only=False))
    ts_arr = t[ts_col]
    if pa.types.is_temporal(ts_arr.type):
        ts_arr = ts_arr.cast(pa.int64())
    ts = np.asarray(ts_arr.to_numpy(zero_copy_only=False), dtype=np.int64)
    keys_raw = t[key_col].to_numpy(zero_copy_only=False)
    is_left = side == 1
    if not is_left.any() or is_left.all():
        return out_schema.empty_table()

    # one key vocabulary for both sides -> int codes
    _, codes = np.unique(keys_raw, return_inverse=True)
    codes = codes.astype(np.int64)
    r_idx = np.flatnonzero(~is_left)
    l_idx = np.flatnonzero(is_left)
    rk, rt = codes[r_idx], ts[r_idx]
    lk, lt = codes[l_idx], ts[l_idx]

    tmin = int(ts.min())
    span = int(ts.max()) - tmin + 2  # +2: room for the <= variant's +1
    ncodes = int(codes.max()) + 1
    if ncodes * span < (1 << 62):
        # packed path: predecessor via ONE searchsorted over
        # code*span + (ts - tmin) keys (rights sorted by (key, ts))
        order_r = np.lexsort((rt, rk))
        rp = rk[order_r] * span + (rt[order_r] - tmin)
        probe = lk * span + (lt - tmin) + (0 if strict else 1)
        pos = np.searchsorted(rp, probe, side="left") - 1
        ok = pos >= 0
        ok[ok] = rk[order_r[pos[ok]]] == lk[ok]
        match_r = r_idx[order_r[pos[ok]]]
    else:
        # degenerate ts/key ranges: per-key-run loop (rare fallback)
        order_r = np.lexsort((rt, rk))
        rk_s, rt_s = rk[order_r], rt[order_r]
        starts = np.searchsorted(rk_s, lk, side="left")
        ends = np.searchsorted(rk_s, lk, side="right")
        pos = np.empty(len(lk), dtype=np.int64)
        ok = np.zeros(len(lk), dtype=bool)
        sd = "left" if strict else "right"
        for i in range(len(lk)):
            s, e = starts[i], ends[i]
            if s == e:
                continue
            p = s + np.searchsorted(rt_s[s:e], lt[i], side=sd) - 1
            if p >= s:
                ok[i] = True
                pos[i] = p
        match_r = r_idx[order_r[pos[ok]]]

    keep_l = l_idx[ok]
    cols: dict[str, pa.Array] = {}
    li = pa.array(keep_l, pa.int64())
    ri = pa.array(match_r, pa.int64())
    for c in left_cols:
        cols[c] = t[c].take(li)
    for src, dst in right_out:
        cols[dst] = t[src].take(ri)
    return pa.Table.from_pydict(cols).cast(out_schema)


# driver-merge budget for the mega-key census (same convention as
# blocking._CENSUS_DRIVER_BUDGET): past this many streamed partial rows
# the merge moves off the driver into a keyed exchange that filters to
# the heavy tail distributedly
_CENSUS_DRIVER_BUDGET = 5_000_000


def _heavy_keys(ds, key_col: str, threshold: int, sample_mod: int = 8):
    """Sampled per-key row census -> {key: scaled count} for keys above
    ``threshold`` (the mega-key guard's detection pass; approximate is
    fine — salting is a load/memory device, never a correctness one).

    Two merge paths, budget-guarded like the engine's other driver-side
    gathers (the skew_table_fast shape, stages/blocking.py): per-batch
    ``value_counts`` partials stream to the driver and merge in ONE
    C-level ``pyarrow.Table.group_by`` (no per-key Python dict fold);
    past ``_CENSUS_DRIVER_BUDGET`` partial rows the gather is abandoned
    and the census re-runs as a distributed groupby-sum where only
    OVER-THRESHOLD keys ever reach the driver."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        col = t[key_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if sample_mod > 1:
            keep = (
                np.arange(len(col), dtype=np.int64) % sample_mod == 0
            )  # deterministic row-stride sample
            col = col.filter(pa.array(keep))
        vc = col.value_counts()
        return pa.Table.from_pydict(
            {"k": vc.field("values"), "n": vc.field("counts")}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    batches: list | None = []
    n_rows = 0
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=262144):
        batches.append(b)
        n_rows += b.num_rows
        if n_rows > _CENSUS_DRIVER_BUDGET:
            batches = None
            break
    thr = pa.scalar(threshold, pa.int64())
    mod = pa.scalar(sample_mod, pa.int64())
    if batches is not None:
        if not batches:
            return {}
        agg = pa.concat_tables(batches).group_by("k").aggregate([("n", "sum")])
        cnt = pc.multiply(pc.cast(agg["n_sum"], pa.int64()), mod)
        mask = pc.greater(cnt, thr)
        return dict(
            zip(agg["k"].filter(mask).to_pylist(), cnt.filter(mask).to_pylist())
        )

    from ..rayutil import shuffle_partitions

    def keep_heavy(t: pa.Table) -> pa.Table:
        cnt = pc.multiply(pc.cast(t["sum(n)"], pa.int64()), mod)
        out = pa.Table.from_pydict({"k": t["k"], "n": cnt})
        return out.filter(pc.greater(out["n"], thr))

    heavy = (
        parts.groupby("k", num_partitions=shuffle_partitions())
        .sum("n")
        .map_batches(keep_heavy, batch_format="pyarrow")
    )
    out: dict = {}
    for b in heavy.iter_batches(batch_format="pyarrow", batch_size=262144):
        out.update(zip(b["k"].to_pylist(), b["n"].to_pylist()))
    return out


def asof_join(
    left_ds,
    right_ds,
    key_col: str,
    ts_col: str,
    right_cols: list[str],
    suffix: str = "_prev",
    strict: bool = True,
    salt_threshold: int | None = None,
):
    """As-of join two Datasets. Output: every LEFT column plus each of
    ``right_cols`` from the matched right row renamed ``{col}{suffix}``
    (``ts_col`` is matched by time, so its suffixed copy is included
    automatically when listed in ``right_cols``). ``strict``: match
    right.ts < left.ts (True) or <= (False). Inner semantics.

    ``salt_threshold``: mega-key guard (off by default — it adds a
    census pass over the probe side). Keys whose LEFT row count exceeds
    it split into S = ceil(n/threshold) salt groups: probe rows hash to
    one group, the key's RIGHT rows replicate to every group, and the
    exchange partitions on (key, salt) so no single task holds the whole
    key. Replicated rights are harmless to correctness — a probe row's
    predecessor is the same row whichever replica the kernel finds —
    so the block kernel is unchanged. Memory per task drops from
    O(n_left + n_right) to O(n_left/S + n_right) for the hot key; a
    right side too big for one task needs time-range partitioning
    (not provided). Without the guard, a key larger than a partition
    block still computes correctly on this Ray version (one block per
    hash partition) but serializes in one task — the same documented
    assumption as pair-gen (stages/blocking.py)."""
    def _arrow_type(t) -> pa.DataType:
        # Ray's Schema reports pandas-backed object columns as the
        # PYTHON class, not an Arrow type; normalize (parquet-backed
        # datasets — the production path — always give Arrow types)
        if isinstance(t, pa.DataType):
            return t
        if t in (object, str, bytes):
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_cols = list(left_schema.names)
    right_out = [(f"{c}{suffix}", f"{c}{suffix}") for c in right_cols]

    lt = {n: _arrow_type(t) for n, t in zip(left_schema.names, left_schema.types)}
    rt = {n: _arrow_type(t) for n, t in zip(right_schema.names, right_schema.types)}
    if lt[key_col] != rt[key_col]:
        raise TypeError(f"key dtype mismatch: {lt[key_col]} vs {rt[key_col]}")

    # mega-key guard: S salt groups per heavy probe key (see docstring)
    salt_of: dict = {}
    if salt_threshold is not None:
        salt_of = {
            k: -(-n // salt_threshold)
            for k, n in _heavy_keys(left_ds, key_col, salt_threshold).items()
        }
    salted = bool(salt_of)

    # combined exchange schema: left cols + suffixed right payload
    # (+ salt when the guard is active) + side
    combined = [(c, lt[c]) for c in left_cols]
    combined += [(f"{c}{suffix}", rt[c]) for c in right_cols]
    extra = [("__asof_salt", pa.int32())] if salted else []
    combined_schema = pa.schema(combined + extra + [(_SIDE, pa.int8())])
    out_schema = pa.schema(combined)

    heavy_keys_arr = pa.array(list(salt_of.keys())) if salt_of else None
    heavy_S = (
        np.fromiter(salt_of.values(), dtype=np.int64, count=len(salt_of))
        if salt_of
        else None
    )

    def _salts(t: pa.Table) -> np.ndarray:
        """Per-row S (1 for light keys): one vectorized index_in hash
        probe against the (tiny) heavy-key array, no per-row Python."""
        if not salt_of:
            return np.ones(t.num_rows, dtype=np.int64)
        import pyarrow.compute as pc

        idx = pc.index_in(t[key_col].combine_chunks(), heavy_keys_arr)
        pos = np.asarray(idx.fill_null(-1), dtype=np.int64)
        return np.where(pos >= 0, heavy_S[np.maximum(pos, 0)], 1)

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrs = [t[c].combine_chunks() for c in left_cols]
        arrs += [_null_array(n, rt[c]) for c in right_cols]
        if salted:
            from ..functions.hashing import splitmix64

            S = _salts(t)
            ts_u = np.asarray(
                t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            ).astype(np.uint64)
            arrs.append(
                pa.array(
                    (splitmix64(ts_u) % S.astype(np.uint64)).astype(np.int32),
                    pa.int32(),
                )
            )
        arrs.append(pa.array(np.ones(n, dtype=np.int8)))
        return pa.Table.from_arrays(arrs, schema=combined_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrs = []
        for c in left_cols:
            if c == key_col:
                arrs.append(t[key_col].combine_chunks())
            elif c == ts_col:
                arrs.append(t[ts_col].combine_chunks().cast(lt[ts_col]))
            else:
                arrs.append(_null_array(n, lt[c]))
        arrs += [t[c].combine_chunks() for c in right_cols]
        out = pa.Table.from_arrays(
            arrs + [pa.array(np.zeros(n, dtype=np.int8))],
            schema=pa.schema(combined + [(_SIDE, pa.int8())]),
        )
        if not salted:
            return out
        # replicate each heavy key's right rows to every salt group so
        # any probe group sees the key's full right history
        S = _salts(t)
        take = np.repeat(np.arange(n, dtype=np.int64), S)
        rep = out.take(pa.array(take, pa.int64()))
        cum = np.cumsum(S) - S
        salt = (np.arange(len(take), dtype=np.int64) - np.repeat(cum, S)).astype(
            np.int32
        )
        side = rep[_SIDE]
        rep = rep.drop_columns([_SIDE])
        rep = rep.append_column("__asof_salt", pa.array(salt, pa.int32()))
        return rep.append_column(_SIDE, side).cast(combined_schema)

    unioned = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    part_keys = [key_col, "__asof_salt"] if salted else [key_col]
    return unioned.repartition(
        num_blocks=shuffle_partitions(), keys=part_keys
    ).map_batches(
        lambda t: _asof_block(
            t, key_col, ts_col, left_cols, right_out, strict, out_schema
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def _range_block(
    t: pa.Table,
    key_col: str,
    ts_col: str,
    window: int,
    emit_cols: list[str],
    out_schema: pa.Schema,
) -> pa.Table:
    if t.num_rows == 0:
        return out_schema.empty_table()
    t = t.combine_chunks()
    # see _asof_block: NaN-from-null int columns cast to INT64_MIN
    if t[key_col].null_count or t[ts_col].null_count:
        raise ValueError(
            f"range_self_join: null {key_col!r}/{ts_col!r} values are not "
            "supported — filter null key/timestamp rows upstream"
        )
    ts_arr = t[ts_col]
    if pa.types.is_temporal(ts_arr.type):
        ts_arr = ts_arr.cast(pa.int64())
    ts = np.asarray(ts_arr.to_numpy(zero_copy_only=False), dtype=np.int64)
    _, codes = np.unique(
        t[key_col].to_numpy(zero_copy_only=False), return_inverse=True
    )
    salted = "__rj_sa" in t.column_names
    if salted:
        sa = np.asarray(t["__rj_sa"].to_numpy(zero_copy_only=False), np.int64)
        sb = np.asarray(t["__rj_sb"].to_numpy(zero_copy_only=False), np.int64)
        part = np.asarray(t["__rj_p"].to_numpy(zero_copy_only=False), np.int64)
        # fold the salt-group identity into the run code so triangle
        # groups of one key never mix (a row is replicated across groups)
        nmax = max(int(sb.max()) + 1, 1)
        codes = (codes * nmax + sa) * nmax + sb
    n = len(ts)
    order = np.lexsort((ts, codes))
    ks, tss = codes[order], ts[order]
    run_starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    run_ends = np.r_[run_starts[1:], n]
    lo = np.empty(n, dtype=np.int64)
    hi = np.empty(n, dtype=np.int64)
    # one searchsorted PAIR per key run, each over the whole run at once
    for s, e in zip(run_starts.tolist(), run_ends.tolist()):
        seg = tss[s:e]
        lo[s:e] = s + np.searchsorted(seg, seg, side="right")
        hi[s:e] = s + np.searchsorted(seg, seg + window, side="right")
    reps = hi - lo
    total = int(reps.sum())
    if total == 0:
        return out_schema.empty_table()
    left_pos = np.repeat(np.arange(n, dtype=np.int64), reps)
    cum = np.cumsum(reps) - reps
    right_pos = np.repeat(lo, reps) + (
        np.arange(total, dtype=np.int64) - np.repeat(cum, reps)
    )
    la = order[left_pos]
    ra = order[right_pos]
    if salted:
        # diagonal (i,i) groups own within-part pairs; off-diagonal
        # (i,j) groups own cross-part pairs only — exactly-once coverage
        # (the triangle-join rule of stages/blocking.py)
        diag = sa[la] == sb[la]
        keep = np.where(diag, True, part[la] != part[ra])
        la, ra = la[keep], ra[keep]
        if not len(la):
            return out_schema.empty_table()
    li = pa.array(la, pa.int64())
    ri = pa.array(ra, pa.int64())
    cols: dict[str, pa.Array] = {key_col: t[key_col].take(li)}
    for c in emit_cols:
        cols[f"{c}_a"] = t[c].take(li)
        cols[f"{c}_b"] = t[c].take(ri)
    cols["gap_us"] = pa.array(ts[ra] - ts[la], pa.int64())
    return pa.Table.from_pydict(cols).cast(out_schema)


def range_self_join(
    ds,
    key_col: str,
    ts_col: str,
    window: int,
    emit_cols: list[str],
    salt_threshold: int | None = None,
):
    """Range join (self): every ordered within-key row pair (a, b) with
    a.ts < b.ts <= a.ts + ``window`` (ts units; equal timestamps never
    pair). Same single-exchange shape as asof_join: hash-partition on the
    key, then each block lexsorts (key, ts) and finds every row's match
    range with one searchsorted pair per key run + a vectorized
    range-repeat expansion (the pair-emission kernel shape of
    blocking._cross_band_pairs). Output: key, each ``emit_cols`` entry
    twice (``_a``/``_b``), and ``gap_us``.

    Range joins explode quadratically inside a (key, window) cell by
    definition — callers bound the window. ``salt_threshold`` turns on
    the mega-key guard: keys above it triangle-split into
    S = ceil(n/threshold) groups (a row with part p replicates to every
    group pair containing p; diagonal groups emit within-part pairs,
    off-diagonal groups cross-part pairs only — the exactly-once rule of
    stages/blocking.py), and the exchange partitions on (key, sa, sb) so
    no task holds a whole hot key. Off by default: it adds a census pass
    and S-way replication of hot-key rows."""
    schema = ds.schema()

    def _arrow_type(t) -> pa.DataType:
        if isinstance(t, pa.DataType):
            return t
        if t in (object, str, bytes):
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    types = {n: _arrow_type(t) for n, t in zip(schema.names, schema.types)}
    fields = [(key_col, types[key_col])]
    for c in emit_cols:
        fields += [(f"{c}_a", types[c]), (f"{c}_b", types[c])]
    fields.append(("gap_us", pa.int64()))
    out_schema = pa.schema(fields)

    salt_of: dict = {}
    if salt_threshold is not None:
        salt_of = {
            k: -(-n // salt_threshold)
            for k, n in _heavy_keys(ds, key_col, salt_threshold).items()
        }
    if not salt_of:
        return ds.repartition(
            num_blocks=shuffle_partitions(), keys=[key_col]
        ).map_batches(
            lambda t: _range_block(t, key_col, ts_col, window, emit_cols, out_schema),
            batch_format="pyarrow",
            batch_size=None,
        )

    from ..functions.hashing import splitmix64

    heavy_keys_arr = pa.array(list(salt_of.keys()))
    heavy_S = np.fromiter(salt_of.values(), dtype=np.int64, count=len(salt_of))

    def replicate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.combine_chunks()
        n = t.num_rows
        # vectorized heavy-key lookup (index_in hash probe), no per-row
        # Python even on salted batches
        idx = pc.index_in(t[key_col].combine_chunks(), heavy_keys_arr)
        pos = np.asarray(idx.fill_null(-1), dtype=np.int64)
        S = np.where(pos >= 0, heavy_S[np.maximum(pos, 0)], 1)
        ts_u = np.asarray(
            t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ).astype(np.uint64)
        p = (splitmix64(ts_u) % S.astype(np.uint64)).astype(np.int64)
        take = np.repeat(np.arange(n, dtype=np.int64), S)
        cum = np.cumsum(S) - S
        q = np.arange(len(take), dtype=np.int64) - np.repeat(cum, S)
        p_rep = np.repeat(p, S)
        out = t.take(pa.array(take, pa.int64()))
        out = out.append_column("__rj_p", pa.array(p_rep.astype(np.int32), pa.int32()))
        out = out.append_column(
            "__rj_sa", pa.array(np.minimum(p_rep, q).astype(np.int32), pa.int32())
        )
        return out.append_column(
            "__rj_sb", pa.array(np.maximum(p_rep, q).astype(np.int32), pa.int32())
        )

    return (
        ds.map_batches(replicate, batch_format="pyarrow")
        .repartition(
            num_blocks=shuffle_partitions(), keys=[key_col, "__rj_sa", "__rj_sb"]
        )
        .map_batches(
            lambda t: _range_block(t, key_col, ts_col, window, emit_cols, out_schema),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
