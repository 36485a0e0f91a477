"""Deterministic sampling operators for training-data curation.

Large-scale pipelines need samples that are (a) reproducible across runs,
shards and cluster sizes, (b) auditable by an independent system, and (c)
computable as a pure map with no RNG state, no shuffle and no driver-side
coordination. Both operators here key the decision on a multiplicative hash
of an integer id column — the same arithmetic is one SQL expression, so a
DuckDB oracle (and any downstream auditor) can re-derive the exact sample.

The hash is Knuth's multiplicative method: h(id) = (id * 2654435761) mod 2^32
(the golden-ratio constant from TAOCP vol. 3 §6.4). It is NOT salted — that
is the point: determinism is the feature. For a differently-salted sample,
add a fixed offset to the id column first.

The reference has no sampling (it indexes everything); these extend the
engine per the graft brief's training-data-pipeline mandate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(1 << 32)


def _hash_ids(ids: np.ndarray) -> np.ndarray:
    return (ids.astype(np.uint64) * _KNUTH) % _MOD32


def stratified_sample(
    ds,
    rates: dict[str, int],
    key_col: str = "lang",
    id_col: str = "doc_id",
    denom: int = 1000,
):
    """Keep a row iff hash(id) % denom < rates[stratum] — an independent
    per-stratum Bernoulli sample with deterministic membership.

    Pure map_batches filter: no shuffle, no materialization, identical
    output for any batch size / shard layout / cluster size. Strata missing
    from `rates` are dropped (rate 0). SQL equivalent:

        WHERE ((id * 2654435761) % 4294967296) % denom
              < CASE key WHEN 'a' THEN ra WHEN 'b' THEN rb ELSE 0 END
    """

    def f(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        if ids.size == 0:
            return batch
        h = _hash_ids(ids) % np.uint64(denom)
        keys = np.asarray(batch[key_col].to_pylist(), dtype=object)
        uniq, inv = np.unique(keys.astype("U"), return_inverse=True)
        rate_of = np.array([rates.get(u, 0) for u in uniq], dtype=np.uint64)
        return batch.filter(pa.array(h < rate_of[inv]))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_take_n(
    ds,
    n_per_stratum: int,
    key_col: str = "lang",
    id_col: str = "doc_id",
):
    """Exactly min(n, stratum size) rows per stratum: the n rows with the
    smallest (hash(id), id) per stratum — a deterministic fixed-budget
    allocation (e.g. "200k docs per language for the eval set").

    Distributed as a partial top-n: each batch keeps its n best per stratum
    (vectorized lexsort + per-run rank), then one tiny groupby over
    candidates (<= n * strata * blocks rows) finishes globally. Nothing
    scales with corpus size except the streaming first pass. SQL equivalent:
    QUALIFY row_number() OVER (PARTITION BY key ORDER BY hash, id) <= n.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        if ids.size == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 key_col: pa.array([], pa.string()),
                 "__h": pa.array([], pa.int64())}
            )
        h = _hash_ids(ids).astype(np.int64)
        keys = np.asarray(batch[key_col].to_pylist(), dtype="U")
        uniq, inv = np.unique(keys, return_inverse=True)
        order = np.lexsort((ids, h, inv))
        g = inv[order]
        starts = np.concatenate(([0], np.cumsum(np.bincount(g))[:-1]))
        rank = np.arange(g.size) - starts[g]
        keep = order[rank < n_per_stratum]
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                key_col: pa.array(keys[keep], pa.string()),
                "__h": pa.array(h[keep], pa.int64()),
            }
        )

    def final(g: pa.Table) -> pa.Table:
        ids = np.asarray(g[id_col])
        h = np.asarray(g["__h"])
        keep = np.lexsort((ids, h))[:n_per_stratum]
        keep.sort()
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                key_col: g[key_col].take(pa.array(keep)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(final, batch_format="pyarrow")
    )


def weighted_sample(
    ds,
    weight_col: str,
    num: int = 1,
    denom: int = 1000,
    id_col: str = "doc_id",
):
    """Keep a row iff hash(id) % denom < min(weight * num, denom): an
    independent Bernoulli sample with inclusion probability
    min(weight * num / denom, 1) — sampling proportional to an integer
    weight column (token count, quality score), the standard
    quality-weighted data-mixing step of pretraining curation.

    Same discipline as stratified_sample: pure map, no RNG state, no
    shuffle, identical output under any partitioning, and the whole
    decision is one integer SQL expression:

        WHERE ((id * 2654435761) % 4294967296) % denom
              < least(weight * num, denom)

    (id * KNUTH must fit int64 on the SQL side — true for ids < ~3.4e9;
    the numpy side wraps mod 2^64 identically up to that bound.)
    """

    def f(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        if ids.size == 0:
            return batch
        h = (_hash_ids(ids) % np.uint64(denom)).astype(np.int64)
        w = np.asarray(batch[weight_col], dtype=np.int64)
        thr = np.minimum(w * np.int64(num), np.int64(denom))
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(f, batch_format="pyarrow")


def balanced_sample(
    ds,
    counts: dict[str, int],
    key_col: str = "lang",
    id_col: str = "doc_id",
):
    """Downsample every stratum to the smallest stratum's size: keep a row
    iff hash(id) % counts[stratum] < min(counts.values()) — the
    language/domain REBALANCING step of pretraining data mixing (uniform
    target mix). Expected kept per stratum = min_count; membership is
    deterministic and partitioning-invariant.

    `counts` comes from a tiny key-column-pruned groupby().count() pass
    (cardinality = #strata, broadcast into the closure); the sample itself
    is a pure map filter — no shuffle, no RNG state. The whole decision is
    one integer SQL expression per row:

        WHERE ((id * 2654435761) % 4294967296) % n_stratum < min_count

    Strata absent from `counts` are dropped.
    """
    mn = np.uint64(min(counts.values()))

    def f(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        if ids.size == 0:
            return batch
        h = _hash_ids(ids)
        keys = np.asarray(batch[key_col].to_pylist(), dtype="U")
        uniq, inv = np.unique(keys, return_inverse=True)
        n_of = np.array([counts.get(u, 1) for u in uniq], dtype=np.uint64)
        thr_of = np.array(
            [mn if u in counts else 0 for u in uniq], dtype=np.uint64
        )
        return batch.filter(pa.array((h % n_of[inv]) < thr_of[inv]))

    return ds.map_batches(f, batch_format="pyarrow")


def hash_split(
    ds,
    boundaries: dict[str, tuple[int, int]],
    id_col: str = "doc_id",
    denom: int = 1000,
):
    """Deterministic train/val/test assignment: split = the named
    [lo, hi) bucket-range that hash(id) % denom falls into (leakage-safe:
    membership is a pure function of the id, so re-runs, re-shards and
    incremental additions never move a row between splits — the property
    random splits lose). Pure map, no shuffle. SQL equivalent: CASE over
    the same multiplicative-hash expression stratified_sample documents."""

    def f(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        h = (
            _hash_ids(ids) % np.uint64(denom)
            if ids.size
            else np.empty(0, np.uint64)
        )
        out = np.full(ids.size, "", dtype="U16")
        for name, (lo, hi) in boundaries.items():
            out[(h >= lo) & (h < hi)] = name
        return batch.append_column("split", pa.array(out, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def dsir_logratio_weights(
    docs,
    is_target,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 10_000,
):
    """DSIR importance weights (Xie et al., NeurIPS 2023 — Data Selection
    via Importance Resampling): score every raw document by how much more
    likely it is under a unigram bag-LM fit on a TARGET subset than under
    one fit on the whole RAW corpus. log w(x) = sum_w tf_x(w) * lam(w)
    with lam(w) = ln(p_t(w) / p_r(w)), p add-one smoothed over the raw
    vocabulary: p_t(w) = (c_t(w)+1)/(N_t+V), p_r(w) = (c_r(w)+1)/(N_r+V).
    Feeding logw_e4 into `weighted_sample` completes DSIR's resampling
    step; `is_target` is a vectorized batch -> bool-mask predicate
    selecting the target subset (e.g. a quality or domain column).

    Fixed-point contract (same device as textstats.bigram_lm_scores):
    each term contributes lam_e4 = floor(ln(((c_t+1)*(N_r+V)) /
    ((c_r+1)*(N_t+V))) * scale + 0.5) as int64 — one ln over one exact
    rational on both oracle sides, and the e4 grid leaves headroom to any
    last-ulp libm difference; per-doc scores are int64 sums, order- and
    partitioning-independent. (The int64 cross-products bound validity at
    c*(N+V) < 2^63; past that, split the ln into a log difference and
    widen the grid.)

    Distributed shape (100-TB discipline): ONE tokenize pass emits
    per-(doc, term) tf rows with the doc's target flag folded in
    (materialized once for its two consumers); c_r/c_t are a single
    term-keyed Sum groupby over per-batch partials (vocabulary-sized,
    NEVER broadcast); N_r/N_t/V are three scalar aggregates of that counts
    table; lam flows back onto the tf rows via the string-keyed
    partitioned hash_join; the per-doc reduce is one groupby over
    per-batch partial sums. Docs with zero tokens emit no row (mirror the
    SQL inner shape).

    Returns a Dataset of (doc_id, n_tokens, logw_e4)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .joins import hash_join
    from .textstats import doc_term_tf

    def tf_rows(batch: pa.Table) -> pa.Table:
        mask = np.asarray(is_target(batch), dtype=bool)
        tfr = doc_term_tf(batch, text_col=text_col)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        d = np.asarray(tfr[id_col], dtype=np.int64)
        # vectorized id -> flag gather (ids are unique within a batch)
        order = np.argsort(ids, kind="stable")
        tgt = mask[order][np.searchsorted(ids[order], d)]
        tf = np.asarray(tfr["tf"], dtype=np.int64)
        return tfr.append_column(
            "tft", pa.array(np.where(tgt, tf, 0).astype(np.int64))
        )

    rows_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("tft", pa.int64()),
        ]
    )
    rows = docs.map_batches(tf_rows, batch_format="pyarrow").materialize()

    def count_partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            batch.select(["term", "tf", "tft"]), "term"
        ).aggregate([("tf", "sum"), ("tft", "sum")])
        return g.rename_columns(["term", "cr_p", "ct_p"])

    counts = (
        rows.map_batches(count_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cr_p", alias_name="c_r"), Sum("ct_p", alias_name="c_t"))
        .materialize()  # consumers: scalars + lam map
    )

    n_r = int(counts.sum("c_r") or 0)
    n_t = int(counts.sum("c_t") or 0)
    v = counts.count()

    def lam_map(batch: pa.Table) -> pa.Table:
        c_r = np.asarray(batch["c_r"], dtype=np.int64)
        c_t = np.asarray(batch["c_t"], dtype=np.int64)
        num = (c_t + 1) * np.int64(n_r + v)
        den = (c_r + 1) * np.int64(n_t + v)
        lam = np.floor(
            np.log(num.astype(np.float64) / den.astype(np.float64)) * scale
            + 0.5
        ).astype(np.int64)
        return pa.table({"term": batch["term"], "lam": pa.array(lam)})

    lam = counts.map_batches(lam_map, batch_format="pyarrow")

    joined = hash_join(
        rows,
        lam,
        "term",
        "term",
        left_schema=rows_schema,
        right_schema=pa.schema([("term", pa.string()), ("lam", pa.int64())]),
    )

    def doc_partial(batch: pa.Table) -> pa.Table:
        tf = np.asarray(batch["tf"], dtype=np.int64)
        lm = np.asarray(batch["lam"], dtype=np.int64)
        t = pa.table(
            {
                id_col: batch[id_col],
                "nt_p": pa.array(tf),
                "lw_p": pa.array(tf * lm),
            }
        )
        g = pa.TableGroupBy(t, id_col).aggregate(
            [("nt_p", "sum"), ("lw_p", "sum")]
        )
        return g.rename_columns([id_col, "nt_p", "lw_p"])

    return (
        joined.map_batches(doc_partial, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(
            Sum("nt_p", alias_name="n_tokens"),
            Sum("lw_p", alias_name="logw_e4"),
        )
    )
