"""Join operators.

The reference only has a broadcast-small-side lookup (J1 product enrichment,
SURVEY.md §2.5); a large-scale engine also needs a both-sides-large join.
This module implements the portable explicit pattern (ray_guide.md): add a
`__bucket = hash(key) % B` column to both sides, co-locate with ONE
`groupby(__bucket)` over the tagged union, and hash-join each bucket pairwise
inside `map_groups` with an Arrow-native Acero hash join (pa.Table.join).

Scale notes: B is the shuffle fan-out knob (size so each bucket's two sides
fit a worker); skewed keys salt into sub-buckets by raising B — key hashing
is uniform for int keys via splitmix-style mixing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — uniform bucket spread even for sequential keys."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


_B = np.uint64(1000003)


def _string_hashes(arr) -> np.ndarray:
    """Deterministic 64-bit hash per string, vectorized by character
    POSITION (O(max_len) passes over the Arrow buffers, each full-width
    numpy) — Python's built-in str hash is per-process salted and must
    never decide a cross-task bucket. Nulls hash like empty strings
    (callers decide their join semantics)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_string()) if arr.type == pa.string() else arr
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.empty(0, np.uint8)
    lens = offs[1:] - offs[:-1]
    h = np.zeros(n, dtype=np.uint64)
    max_len = int(lens.max()) if n else 0
    starts = offs[:-1]
    for j in range(max_len):
        active = lens > j
        h[active] = h[active] * _B + data[starts[active] + j].astype(np.uint64)
    return _mix64(h ^ lens.astype(np.uint64))


def join_out_schema(
    lschema: pa.Schema,
    rschema: pa.Schema,
    left_key,
    right_key,
    how: str = "inner",
) -> pa.Schema:
    """The schema hash_join(left, right, ...) produces, computed from the
    input schemas alone. Use it to thread explicit schemas through CHAINED
    joins: Ray Data cannot infer schemas through UDFs, so probing a join
    (or any shuffle) output's .schema() executes that whole stage once just
    for the probe — passing left_schema/right_schema skips it."""
    lkeys = [left_key] if isinstance(left_key, str) else list(left_key)
    rkeys = [right_key] if isinstance(right_key, str) else list(right_key)
    semi_anti = how in ("left semi", "left anti")
    if semi_anti:
        rt = dict(zip(rschema.names, rschema.types))
        rschema = pa.schema([(n, rt[n]) for n in rkeys])
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    all_cols = lnames + [n for n in rnames if n not in lnames]
    all_types = {**rtypes, **ltypes}
    shared = {rk for lk, rk in zip(lkeys, rkeys) if lk == rk}
    out_cols = (
        lnames if semi_anti
        else [c for c in all_cols if c not in rkeys or c in shared]
    )
    return pa.schema([(c, all_types[c]) for c in out_cols])


def hash_join(
    left,
    right,
    left_key,
    right_key,
    num_buckets: int = 32,
    how: str = "inner",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Partitioned hash join of two Datasets on int64 OR string key(s).

    `left_key`/`right_key` may each be a column name or a list of names
    (composite key; same length both sides). Returns a Dataset of joined
    rows (left columns + right columns minus the right keys). One shuffle
    total: both sides are tagged and bucketed, then a single groupby
    co-locates matching buckets. Bucketing hashes are only a placement
    decision — matching happens on the actual key values — so correctness
    never depends on hash quality, only balance does. Null keys are dropped
    at the tag (SQL inner-join semantics; for `left semi`/`left anti` a
    null-key left row is likewise dropped — match broadcast_semi_anti_join's
    anti-with-nulls semantics by pre-filtering if needed).

    `how`: "inner", "left outer", "left semi", "left anti", or
    "full outer" (key columns coalesced into the left key names, matching
    Acero). Semi/anti
    output only the left columns, and the right side ships ONLY its key
    columns through the shuffle — the both-sides-large set-membership path
    that broadcast_semi_anti_join cannot serve once the key set outgrows
    the object store.

    `left_schema`/`right_schema`: pass the side's schema when it is an
    unmaterialized shuffle/aggregate output — skips a .schema() probe that
    would otherwise EXECUTE that stage once just for the schema (and makes
    the join well-defined when the side aggregated to zero rows, where Ray
    Data reports schema None). `join_out_schema` computes the schema this
    function returns, for chaining.
    """
    lkeys = [left_key] if isinstance(left_key, str) else list(left_key)
    rkeys = [right_key] if isinstance(right_key, str) else list(right_key)
    assert len(lkeys) == len(rkeys)
    assert how in (
        "inner", "left outer", "left semi", "left anti", "full outer"
    )
    semi_anti = how in ("left semi", "left anti")

    if semi_anti:
        # membership only: the right side ships nothing but its keys
        right = right.select_columns(rkeys)
        if right_schema is not None:
            rt = dict(zip(right_schema.names, right_schema.types))
            right_schema = pa.schema([(n, rt[n]) for n in rkeys])

    # Unified superset schema so the tagged union has one block schema.
    # Schema probes on an UNMATERIALIZED shuffle/aggregate input execute
    # that whole stage once just to learn the schema (Ray Data has no
    # static inference through UDFs) and the real run executes it again —
    # callers chaining joins or joining aggregate outputs should pass
    # left_schema/right_schema (see join_out_schema) to skip the probe.
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    # A None schema means the side aggregated to ZERO rows (Ray Data then
    # has no blocks to infer from). Degenerate exactly where the output is
    # fully determined; otherwise the caller must supply the schema.
    if rschema is None:
        if how == "left anti":
            return left  # empty right excludes nothing
        if how == "left semi":
            return left.limit(0)
        raise ValueError(
            f"hash_join(how={how!r}): right side is empty with unknown "
            "schema (a zero-row aggregate output); pass right_schema="
        )
    if lschema is None:
        if how == "full outer":
            raise ValueError(
                "hash_join(how='full outer'): left side is empty with "
                "unknown schema (a zero-row aggregate output); pass "
                "left_schema="
            )
        # inner / left outer / semi / anti of an empty left is empty; the
        # left's schema is unknowable here, so the result is `left` itself
        return left
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    all_cols = lnames + [n for n in rnames if n not in lnames]
    all_types = {**rtypes, **ltypes}

    def _is_str(t) -> bool:
        return pa.types.is_string(t) or pa.types.is_large_string(t)

    def tag(side: str, keys: list[str], own: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            for key in keys:
                if batch[key].null_count:
                    batch = batch.filter(pc.is_valid(batch[key]))
            h = np.zeros(len(batch), dtype=np.uint64)
            for key in keys:
                if _is_str(all_types[key]):
                    kh = _string_hashes(batch[key])
                else:
                    kh = _mix64(np.asarray(batch[key], dtype=np.int64))
                h = _mix64(h ^ kh)
            bucket = (h % np.uint64(num_buckets)).astype(np.int32)
            cols = {}
            for name in all_cols:
                if name in own:
                    cols[name] = batch[name]
                else:
                    cols[name] = pa.nulls(len(batch), type=all_types[name])
            cols["__bucket"] = pa.array(bucket)
            cols["__side"] = pa.array(np.full(len(batch), side == "r"))
            return pa.table(cols)
        return fn

    tagged = left.map_batches(
        tag("l", lkeys, lnames), batch_format="pyarrow"
    ).union(
        right.map_batches(tag("r", rkeys, rnames), batch_format="pyarrow")
    )

    shared = {rk for lk, rk in zip(lkeys, rkeys) if lk == rk}
    out_cols = (
        lnames if semi_anti
        else [c for c in all_cols if c not in rkeys or c in shared]
    )

    out_schema = pa.schema([(c, all_types[c]) for c in out_cols])
    # right side carries only its keys + columns the left doesn't have, so
    # the Acero join output has no name collisions (same drop-duplicate
    # policy the previous pandas reindex applied)
    r_cols = rkeys + [c for c in rnames if c not in lnames and c not in rkeys]

    def join_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native group kernel: pa.Table.join (Acero hash join) — no
        # pandas conversion, no object-boxed string keys, zero-copy slices
        side = g["__side"].to_numpy(zero_copy_only=False).astype(bool)
        l = g.filter(pa.array(~side)).select(lnames)
        r = g.filter(pa.array(side)).select(r_cols)
        if l.num_rows == 0 and how != "full outer":
            return out_schema.empty_table()
        if r.num_rows == 0 and how in ("inner", "left semi"):
            return out_schema.empty_table()
        if r.num_rows == 0 and how == "left anti":
            return l.select(out_cols).cast(out_schema)
        if how == "full outer" and (l.num_rows == 0 or r.num_rows == 0):
            # one-sided bucket: emit the surviving side padded with nulls
            # (key columns come from that side — Acero would coalesce)
            src = l if r.num_rows == 0 else r
            key_of = dict(zip(lkeys, rkeys))
            cols = {}
            for c in out_cols:
                if c in src.column_names:
                    cols[c] = src[c]
                elif src is r and c in key_of:
                    cols[c] = src[key_of[c]]
                else:
                    cols[c] = pa.nulls(src.num_rows, type=all_types[c])
            return pa.table(cols).cast(out_schema)
        joined = l.join(
            r, keys=lkeys, right_keys=rkeys,
            join_type=how if how != "inner" else "inner",
        )
        return joined.select(out_cols).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def broadcast_semi_anti_join(
    ds,
    key: str,
    key_set,
    anti: bool = False,
):
    """Semi/anti join against a broadcast key set (guide pattern; the
    reference's `comm -23` new-product detection is exactly an anti join on a
    small list, tr2solr.sh:76 / processJSONs.sh:67).

    `key_set`: an iterable of keys or a `ray.ObjectRef` to a pyarrow Array —
    put once in the object store (zero-copy reads), read per task, no
    shuffle. For key sets too large to broadcast, swap in a Bloom filter at
    the same call site.

    Key typing: integer key sets broadcast as a deduplicated int64 array;
    any other hashable type (strings etc.) broadcasts as an Arrow array of
    its natural inferred type. Null semantics: a null batch key is never a
    member of the set, so semi drops null-key rows and anti KEEPS them
    (matching `comm`'s treatment of lines only in the left input).
    """
    import pyarrow.compute as pc
    import ray

    if isinstance(key_set, ray.ObjectRef):
        ref = key_set
    else:
        keys = list(key_set)
        try:
            arr = pa.array(
                np.unique(np.fromiter(keys, dtype=np.int64, count=len(keys))),
                pa.int64(),
            )
        except (TypeError, ValueError):
            arr = pa.array(sorted(set(keys)))
        ref = ray.put(arr)

    def filt(batch: pa.Table) -> pa.Table:
        value_set = ray.get(ref)
        mask = pc.is_in(batch[key], value_set=value_set)
        if anti:
            # null keys: is_in yields false (never a member) -> anti keeps
            mask = pc.invert(mask)
        mask = pc.fill_null(mask, anti)
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


def asof_join(
    left,
    right,
    by: str,
    on: str,
    tiebreak: str,
    num_buckets: int = 32,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Backward as-of join (the standard time-series operator Ray Data
    lacks): each left row matches the LAST right row with the same `by` key
    and right.on <= left.on. Inner semantics; among right rows tying on
    (by, on), the greatest `tiebreak` wins (deterministic across runs and
    partitionings).

    ONE shuffle: both sides hash-bucket by the `by` key (co-partitioning is
    exact — an as-of match never crosses keys), then each bucket resolves
    matches with a packed (key-code, on-rank) searchsorted — no per-row
    Python. Skew note: a hot key lands one bucket; salt by key+time-range
    and de-overlap if a single key exceeds worker memory.

    Returns left columns + right columns prefixed `r_`.
    `left_schema`/`right_schema`: same contract as hash_join — pass them
    for unmaterialized shuffle/aggregate inputs to skip the schema probe.
    """
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    # a side that is empty with unknown schema (zero-row aggregate /
    # repartitioned empty) cannot match anything under inner semantics;
    # the degenerate output has no r_ columns (they are unknowable)
    if lschema is None:
        return left
    if rschema is None:
        return left.limit(0)
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    all_cols = lnames + [n for n in rnames if n not in lnames]
    all_types = {**rtypes, **ltypes}

    def tag(side_is_right: bool, own: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            keys = np.asarray(batch[by], dtype=np.int64)
            bucket = (_mix64(keys) % np.uint64(num_buckets)).astype(np.int32)
            cols = {}
            for name in all_cols:
                cols[name] = (
                    batch[name]
                    if name in own
                    else pa.nulls(len(batch), type=all_types[name])
                )
            cols["__bucket"] = pa.array(bucket)
            cols["__side"] = pa.array(np.full(len(batch), side_is_right))
            return pa.table(cols)

        return fn

    tagged = left.map_batches(tag(False, lnames), batch_format="pyarrow").union(
        right.map_batches(tag(True, rnames), batch_format="pyarrow")
    )
    out_r = [n for n in rnames if n != by]

    def join_bucket(g: pa.Table) -> pa.Table:
        side = np.asarray(g["__side"])
        lt = g.filter(pa.array(~side))
        rt = g.filter(pa.array(side))
        empty_cols = {c: lt[c].slice(0, 0) for c in lnames}
        empty_cols.update(
            {f"r_{c}": pa.nulls(0, type=rtypes[c]) for c in out_r}
        )
        if lt.num_rows == 0 or rt.num_rows == 0:
            return pa.table(empty_cols)
        l_key = np.asarray(lt[by], dtype=np.int64)
        r_key = np.asarray(rt[by], dtype=np.int64)
        uniq_keys, inv = np.unique(np.concatenate((l_key, r_key)), return_inverse=True)
        l_kc, r_kc = inv[: l_key.size], inv[l_key.size :]
        l_on = np.asarray(lt[on]).astype(np.int64)
        r_on = np.asarray(rt[on]).astype(np.int64)
        ranks_src, rinv = np.unique(np.concatenate((l_on, r_on)), return_inverse=True)
        l_rank, r_rank = rinv[: l_on.size], rinv[l_on.size :]
        M = np.int64(ranks_src.size + 1)
        r_tie = np.asarray(rt[tiebreak]).astype(np.int64)
        order = np.lexsort((r_tie, r_rank, r_kc))
        r_pack = r_kc[order] * M + r_rank[order]
        l_pack = l_kc * M + l_rank
        idx = np.searchsorted(r_pack, l_pack, side="right") - 1
        valid = idx >= 0
        safe = np.maximum(idx, 0)
        valid &= r_kc[order][safe] == l_kc
        sel_l = np.flatnonzero(valid)
        sel_r = order[safe[valid]]
        out = {c: lt[c].take(pa.array(sel_l)) for c in lnames}
        for c in out_r:
            out[f"r_{c}"] = rt[c].take(pa.array(sel_r))
        return pa.table(out)

    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def range_join(
    left,
    right,
    by: str,
    on: str,
    window: int,
    num_buckets: int = 32,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Banded range join: all (left, right) pairs with the same `by` key and
    |left.on - right.on| <= window (int64 units). The other classic
    time-series operator Ray Data lacks.

    ONE shuffle: rows co-partition on (key-hash, on // window) with the
    RIGHT side replicated to its three adjacent bands (a qualifying pair's
    band distance is at most 1), so each pair materializes in exactly one
    group — the left row's band — and the in-group |dt| <= window filter is
    a vectorized key-segmented sweep. Replication factor is a constant 3x of
    the right side, independent of corpus size; skew = a hot (key, band),
    bounded by window width.

    Returns left columns + right columns prefixed `r_`.
    `left_schema`/`right_schema`: same contract as hash_join — pass them
    for unmaterialized shuffle/aggregate inputs to skip the schema probe.
    """
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    # same degenerates as asof_join: an empty unknown-schema side matches
    # nothing under inner semantics
    if lschema is None:
        return left
    if rschema is None:
        return left.limit(0)
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    rtypes = dict(zip(rschema.names, rschema.types))
    all_cols = lnames + [n for n in rnames if n not in lnames]
    all_types = {**rtypes, **dict(zip(lschema.names, lschema.types))}
    W = np.int64(window)

    def tag_left(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[by], dtype=np.int64)
        band = np.asarray(batch[on]).astype(np.int64) // W
        bucket = (
            _mix64(keys * np.int64(1_000_003) + band) % np.uint64(num_buckets)
        ).astype(np.int32)
        cols = {
            n: (batch[n] if n in lnames else pa.nulls(len(batch), all_types[n]))
            for n in all_cols
        }
        cols["__band"] = pa.array(band)
        cols["__bucket"] = pa.array(bucket)
        cols["__side"] = pa.array(np.zeros(len(batch), dtype=bool))
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[by], dtype=np.int64)
        band0 = np.asarray(batch[on]).astype(np.int64) // W
        n = len(batch)
        idx = np.repeat(np.arange(n, dtype=np.int64), 3)
        band = np.concatenate([band0 - 1, band0, band0 + 1]).reshape(3, n).T.ravel()
        rep = batch.take(pa.array(idx))
        keys3 = keys[idx]
        bucket = (
            _mix64(keys3 * np.int64(1_000_003) + band) % np.uint64(num_buckets)
        ).astype(np.int32)
        cols = {
            n: (rep[n] if n in rnames else pa.nulls(len(rep), all_types[n]))
            for n in all_cols
        }
        cols["__band"] = pa.array(band)
        cols["__bucket"] = pa.array(bucket)
        cols["__side"] = pa.array(np.ones(len(rep), dtype=bool))
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    out_r = [n for n in rnames if n != by]

    def join_bucket(g: pa.Table) -> pa.Table:
        side = np.asarray(g["__side"])
        lt = g.filter(pa.array(~side))
        rt = g.filter(pa.array(side))
        empty = {c: lt[c].slice(0, 0) for c in lnames}
        empty.update({f"r_{c}": pa.nulls(0, type=rtypes[c]) for c in out_r})
        if lt.num_rows == 0 or rt.num_rows == 0:
            return pa.table(empty)
        # pair only within matching (key, band): the left row's band is the
        # group identity; right rows were replicated INTO this band
        l_key = np.asarray(lt[by], dtype=np.int64)
        r_key = np.asarray(rt[by], dtype=np.int64)
        l_band = np.asarray(lt["__band"])
        r_band = np.asarray(rt["__band"])
        l_on = np.asarray(lt[on]).astype(np.int64)
        r_on = np.asarray(rt[on]).astype(np.int64)
        # collision-free composite (key, band) codes via rank encoding
        ku, kinv = np.unique(np.concatenate((l_key, r_key)), return_inverse=True)
        bu, binv = np.unique(np.concatenate((l_band, r_band)), return_inverse=True)
        code = kinv.astype(np.int64) * np.int64(bu.size) + binv
        l_code, r_code = code[: l_key.size], code[l_key.size :]
        # sort right rows by code; binary-search each left row's segment
        r_order = np.argsort(r_code, kind="stable")
        r_code_s = r_code[r_order]
        lo = np.searchsorted(r_code_s, l_code, side="left")
        hi = np.searchsorted(r_code_s, l_code, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return pa.table(empty)
        li = np.repeat(np.arange(l_key.size, dtype=np.int64), cnt)
        of = np.repeat(np.arange(l_key.size, dtype=np.int64), cnt)
        base = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        within = np.arange(total, dtype=np.int64) - base[of]
        ri = r_order[lo[of] + within]
        keep = np.abs(l_on[li] - r_on[ri]) <= W
        li, ri = li[keep], ri[keep]
        out = {c: lt[c].take(pa.array(li)) for c in lnames}
        for c in out_r:
            out[f"r_{c}"] = rt[c].take(pa.array(ri))
        return pa.table(out)

    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bloom-filter pre-filtered semi/anti join (Bloom 1970): the classic
# shuffle-reduction pattern for set membership at scale. The filter is an
# ORDER-INDEPENDENT mergeable bit array (per-batch partials OR together),
# has NO false negatives, and is built in one streaming pass over the
# right side; the left side then splits into rows the filter PROVES are
# non-members (no shuffle at all) and a usually-small candidate remainder
# that one partitioned hash_join resolves exactly. End result is EXACT.
# ---------------------------------------------------------------------------
def _bloom_positions(keys_h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions via double hashing g_i = h1 + i*h2 (Kirsch &
    Mitzenmacher 2006) over the 64-bit key hashes."""
    h1 = keys_h
    h2 = _mix64(keys_h ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    return np.stack(
        [((h1 + np.uint64(i) * h2) % np.uint64(m_bits)) for i in range(k)]
    )


def _key_hashes(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return _string_hashes(col)
    return _mix64(np.asarray(col, dtype=np.int64))


def bloom_build(ds, key: str, m_bits: int = 1 << 23, k: int = 4) -> np.ndarray:
    """Build a Bloom filter over a Dataset column: one streaming pass, one
    packed-uint64 bit array per batch (m_bits/8 bytes, constant), OR-merged.
    The merged array is what you `ray.put` and probe inside map_batches.
    m_bits sizing: FP rate ~ (1 - e^{-k n / m})^k; 2^23 bits / 1 MiB holds
    ~1M keys at ~2.4% FP with k=4."""
    n_words = (m_bits + 63) // 64

    def partial(batch: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        if len(batch):
            pos = _bloom_positions(_key_hashes(batch[key]), m_bits, k).ravel()
            np.bitwise_or.at(
                words, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return pa.table({"words": pa.array([words.tobytes()], pa.binary())})

    merged = np.zeros(n_words, dtype=np.uint64)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged |= np.frombuffer(row["words"], dtype=np.uint64)
    return merged


def bloom_might_contain(
    bloom: np.ndarray, col, m_bits: int, k: int = 4
) -> np.ndarray:
    """Boolean mask per row: False is PROOF of non-membership."""
    n = len(col)
    if n == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(_key_hashes(col), m_bits, k)
    hit = np.ones(n, dtype=bool)
    for i in range(k):
        w = bloom[(pos[i] >> np.uint64(6)).astype(np.int64)]
        hit &= (w >> (pos[i] & np.uint64(63))) & np.uint64(1) != 0
    return hit


def bloom_semi_anti_join(
    left,
    right,
    left_key: str,
    right_key: str,
    anti: bool = False,
    m_bits: int = 1 << 23,
    k: int = 4,
    num_buckets: int = 32,
):
    """Exact semi/anti join with a Bloom pre-filter: rows the filter proves
    absent from the right key set bypass the shuffle entirely (kept for
    anti, dropped for semi); only the might-contain remainder — true
    members plus the small FP fraction — goes through the partitioned
    hash_join. At a 2% FP rate an anti join against a selective right side
    shuffles ~2% of the left instead of 100%."""
    import ray

    bloom_ref = ray.put(bloom_build(right, right_key, m_bits, k))

    class Split:
        def __init__(self, keep_maybe: bool):
            self.bloom = ray.get(bloom_ref)
            self.keep_maybe = keep_maybe

        def __call__(self, batch: pa.Table) -> pa.Table:
            maybe = bloom_might_contain(self.bloom, batch[left_key], m_bits, k)
            mask = maybe if self.keep_maybe else ~maybe
            return batch.filter(pa.array(mask))

    candidates = left.map_batches(
        Split, fn_constructor_args=(True,), batch_format="pyarrow",
        concurrency=(1, 8),
    )
    resolved = hash_join(
        candidates, right.select_columns([right_key]), left_key, right_key,
        num_buckets=num_buckets,
        how="left anti" if anti else "left semi",
    )
    if not anti:
        return resolved
    definite = left.map_batches(
        Split, fn_constructor_args=(False,), batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return definite.union(resolved)
