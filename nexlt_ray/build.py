"""Index build — the Ray-Data-native re-expression of the reference's
indexing path (Passolo/Athena indexers -> Solr update -> Lucene segments;
SURVEY.md §3.1-3.2).

Pipeline (two explicit shuffles, both documented for skew; both default to a
disk-partitioned exchange — map outputs land in shared storage partitioned by
the key, one independent reduce task per bucket, atomic dir publish — with a
Ray-Data sort-based groupby kept as `shuffle="sort"`, byte-identical output):

  stage 1  storage-direct fragment tasks (each reads its own parquet row
           group — Ray 2.49 does not fuse read->map, so a Dataset read
           feeding a map would round-trip every batch through the object
           store): + content_sha256, + doc_bucket, count-only tokenize ->
           doc_len + SmallFloat norm byte, spill partitioned by doc_bucket
           exchange by doc_bucket -> per-bucket BucketWriter      [SHUFFLE 1]
             -> exact dedup by content sha (reference analog: md5 uniqueKey
                upsert, parseJSON.pl:330 + schema.xml:1033), deterministic
                sort by (sha, repo, path, commit), local_rank assignment,
                atomic write of docstore/bucket=N.parquet + lineage record.
  stage 2  driver: per-bucket doc counts -> doc_id offsets (dense prefix
           sums, content-sha-ordered and scheduling-independent; or strided
           bucket<<capacity for incremental maintenance).
  stage 3  storage-direct fragment tasks over the docstore:
           +doc_id (offsets table), integer-coded tokenize + per-slice
           partial posting aggregation (the combiner that makes
           stopword-skew survivable: each slice emits at most ONE row per
           (term, doc-range), so a ubiquitous term contributes #slices
           rows to the merge, not #postings rows), spill partitioned by
           (term_bucket, range_bucket)                            [SHUFFLE 2]
             -> one independent merge task per (term_bucket, range_bucket)
                pair (a hot term's ranges encode in PARALLEL — the
                single-term encode was the merge straggler), delta+varint
                encode with block-max metadata -> per-bucket assembly
                concatenates the encoded pieces into
                segments/bucket=N.parquet — or, with
                segment_range_groups > 1, one bucket=N/rg=G.parquet per
                doc-range group so maintenance I/O localizes —
                (I/O only) + lineage record.
  stage 4  driver: atomic manifest.json (the "commit"; analog of the
           reference's lastrefresh swap, tr2solr.sh:58,83).

Scale knobs (defaults sized for the 32-CPU sandbox; scale linearly):
  num_doc_buckets   — dedup/docID groups. Each group materializes in one
                      task; size it so corpus_bytes/num_doc_buckets fits a
                      worker (~2^16 at 100 TB).
  num_term_buckets  — merge groups; segment files. Hot (stopword-like) terms
                      are pre-combined per batch and split across doc-range
                      rows, so a bucket's group size stays bounded.
  range_bits        — doc-range width (doc_id >> range_bits) for splitting a
                      single term's postings across merge rows / segment rows.

Resumability: both shuffle stages skip partitions whose ledger record and
output file exist; outputs are written temp+rename; the final manifest is the
atomic commit point. Records carry content-sha digests for lineage.
"""

from __future__ import annotations

import hashlib
import json
import os
import zlib
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codec import BLOCK_SIZE, encoder_for, small_float_int_to_byte4
from .lineage import Ledger, atomic_write_json, atomic_write_parquet
from .tokenize import tokenize_batch

MANIFEST_VERSION = 1


@dataclass
class BuildConfig:
    profile: str = "code"              # tokenizer profile (tokenize.PROFILES)
    num_doc_buckets: int = 64          # dedup/docID shuffle partitions
    num_term_buckets: int = 32         # postings merge shuffle partitions
    # docID layout:
    #   "dense"   — docID = global content-sha rank (0..n-1). Deterministic
    #               and compact, but inserting a doc shifts every later id,
    #               so the index is rebuild-only.
    #   "strided" — docID = doc_bucket << bucket_capacity_bits + local rank.
    #               Untouched buckets keep their ids when new shards are
    #               merged, enabling extend_index() (the reference's
    #               continuous uniqueKey upsert, schema.xml:1030-1033) with
    #               re-dedup + re-encode of TOUCHED doc buckets only.
    id_mode: str = "dense"
    bucket_capacity_bits: int = 40     # strided: id space per doc bucket
    # doc-range salt: doc_id >> range_bits. None -> resolved adaptively at
    # build time (see _resolve_range_bits) so a hot term's postings split
    # into ~16 independently-mergeable ranges at ANY corpus size — the
    # single-term encode is otherwise the unbreakable merge straggler that
    # caps scaling (one task encodes the whole "the" posting list while
    # every other core idles).
    range_bits: int | None = None
    block_size: int = BLOCK_SIZE       # postings per skip block
    # postings block codec (the Lucene postings_format analog):
    #   "for"    — FOR bit-packed blocks (default; Lucene PackedInts
    #              discipline: per-block fixed width = block max bit
    #              length). Encode is a two-word scatter-OR (O(values)),
    #              decode a branch-free two-word gather; packs dense lists
    #              well below varint's 1-byte floor (−47% postings bytes,
    #              −16% position bytes on the synthetic corpus at build-time
    #              parity — BENCH/round4_codec_ab_50k.json).
    #   "varint" — LEB128 per value (byte-aligned; the pre-knob format,
    #              still read/written for old indexes).
    # Both codecs produce bit-identical decoded postings (tested), so
    # search results are codec-invariant; the manifest records the codec
    # and readers dispatch per row. Manifests written before this knob
    # existed are pinned to varint by extend/delete (setdefault above those
    # BuildConfig(**cfgd) calls) so one index never mixes codecs.
    postings_codec: str = "for"
    store_positions: bool = True       # positional index (phrase queries)
    # segment file sharding by doc-range group (the Lucene many-segments
    # analog, applied along the DOC axis instead of the commit axis):
    #   1  — one parquet per term bucket (segments/bucket=TB.parquet); a
    #        maintenance op (extend/delete) rewrites every segment file
    #        whole even when it re-encodes only the touched doc ranges —
    #        file I/O proportional to INDEX size, not update size.
    #   G  — each term bucket splits into G files keyed by a contiguous
    #        doc-bucket group (segments/bucket=TB/rg=GG.parquet); extend/
    #        delete rewrite only the groups holding touched doc buckets.
    #        The decisive 100 TB win is BOUNDED FILE SIZE (a term bucket's
    #        single parquet grows with corpus/num_term_buckets — unbounded
    #        at scale) + per-group parallel assembly I/O. Rewrite locality
    #        helps only bucket-concentrated updates: sha-uniform shards
    #        touch buckets uniformly, so rewrite_frac ~ 1-(1-1/G)^touched
    #        (measured: BENCH/round4_rg_ab.json). Cost: a cold term read
    #        fans out to <=G filtered reads per bucket (same trade Lucene
    #        makes across segments). Keep 1 single-node; size G so each
    #        group file lands at 2-4 GB at scale.
    # Rows are assigned by doc bucket (strided ids: contiguous groups of
    # doc buckets; dense ids: range_bucket mod G), a pure function of the
    # row key — so extend==rebuild byte-identity holds PER FILE.
    segment_range_groups: int = 1
    max_content_chars: int | None = None  # drop longer docs (reference: 5000,
                                          # parseJSON.pl:313,321)
    index_batch_size: int = 1024       # docs per posting-combiner slice
    index_concurrency: int | None = None  # actor pool size (None -> CPUs)
    # postings exchange strategy:
    #   "disk" — partial postings land in shared storage partitioned by
    #            term bucket (one atomic dir publish), then one independent
    #            merge task per bucket. No object-store all-to-all; scales
    #            with storage bandwidth and is what external shuffle
    #            services do. Requires storage shared by all nodes (true for
    #            this engine's docstore/segments writes anyway).
    #   "sort" — Ray Data sort-based groupby shuffle (in-memory/object
    #            store). Kept as the fallback; produces byte-identical
    #            segments.
    shuffle: str = "disk"
    # staging root for transient exchange data (docparts/partials). None ->
    # inside index_dir (shared durable storage). Point it at node-local fast
    # storage (/dev/shm, local NVMe) to keep shuffle staging off the durable
    # store — exchange data is transient (deleted after the build) and a lost
    # staging dir just means the resume regenerates it, so durability isn't
    # needed. On a multi-node cluster this must be a path visible to all
    # nodes OR the merge tasks must be co-located; default None is the
    # always-correct choice.
    exchange_root: str | None = None
    # codec for transient exchange files (docparts/partials/segment pieces).
    # zstd measured strictly better than lz4 end-to-end here (pyarrow's
    # parquet lz4 framing decodes SLOWER despite the lighter algorithm:
    # 17.4 s vs 12.3 s for the same sequential merge, and only ~18% fewer
    # bytes saved by zstd matter when the exchange crosses shared storage).
    # Knob kept for clusters where the trade differs.
    exchange_compression: str = "zstd"
    # store per-doc token vectors (tokens + positions) in the docstore so the
    # index stage never re-tokenizes (Lucene's stored-term-vectors tradeoff:
    # ~2x docstore size + ~60% more stage-1 shuffle volume for one analysis
    # pass instead of two — measured net-neutral on wall time locally, so
    # default OFF to keep the docstore lean; turn on when the analyzer is
    # expensive (e.g. morphological chains) or storage is cheap).
    store_token_vectors: bool = False
    # stemming-protected words for the text_en profile (the reference's
    # KeywordMarkerFilter + protwords.txt, schema.xml:292; 18 entries there)
    protected_words: tuple = ()
    # multiValued accumulation fields (the reference's atomic `{"add": ...}`
    # update on the multiValued `productname` field, parseJSON.pl:154-181 /
    # AthenaExportMt.java:559 / schema.xml:1006): for each named scalar
    # string input column f, the deduped doc gains a list column `{f}_all`
    # holding the SORTED DISTINCT values of f across every input row that
    # shares the doc's content sha. Sorted-distinct union is associative, so
    # extend_index() accumulates lists incrementally and stays byte-identical
    # to a full rebuild over the union input. Filter (fq) on `{f}_all`
    # matches list membership; like Solr, multiValued fields are not
    # sortable.
    multivalue_fields: tuple = ()
    # user-extension hook (the reference's StatelessScriptUpdateProcessor
    # processAdd analog, update-script.js:10-53 / solrconfig.xml:945-952):
    # a pa.Table -> pa.Table fn applied to each input batch before hashing /
    # dedup / indexing. Must be deterministic and row-wise (it runs before
    # the content-sha dedup, so it defines document identity).
    record_hook: object | None = None


def term_bucket_of(term: str, num_term_buckets: int) -> int:
    """Stable term -> merge-bucket hash (crc32; cross-process deterministic)."""
    return zlib.crc32(term.encode("utf-8")) % num_term_buckets


def _resolve_range_bits(
    cfg: BuildConfig, n_docs: int, target_ranges: int = 16, floor: int = 14
) -> int:
    """Adaptive doc-range width: the smallest shift >= `floor` that yields at
    most `target_ranges` ranges over the corpus. Depends only on n_docs, so
    rebuilds at any batch size / bucket count resolve identically. The floor
    bounds per-term row counts for rare/medium terms (a df-1000 term gets at
    most `target_ranges` rows, not one row per 16k docs)."""
    if cfg.range_bits is not None:
        return cfg.range_bits
    bits = floor
    while n_docs > 0 and ((n_docs - 1) >> bits) + 1 > target_ranges:
        bits += 1
    return bits


def _range_group_of(rb, cfg: BuildConfig):
    """range_bucket -> segment range group (segment_range_groups > 1).

    Strided ids embed the doc bucket in the range bucket
    (rb >> (bucket_capacity_bits - range_bits) == doc_bucket), so groups
    are CONTIGUOUS runs of doc buckets — a maintenance op touching doc
    bucket b rewrites exactly group (b*G)//num_doc_buckets of each term
    bucket. Dense ids have no doc-bucket structure (and no maintenance
    path), so plain modulo balances file sizes. Works on scalars and
    int64 numpy arrays."""
    G = cfg.segment_range_groups
    if cfg.id_mode == "strided":
        db = rb >> (cfg.bucket_capacity_bits - cfg.range_bits)
        return (db * G) // cfg.num_doc_buckets
    return rb % G


def _doc_bucket_group(db: int, cfg: BuildConfig) -> int:
    """Doc bucket -> range group (strided layout; see _range_group_of)."""
    return (db * cfg.segment_range_groups) // cfg.num_doc_buckets


def _as_chunks(col) -> list[pa.Array]:
    """Table column -> list of plain Arrays (pyarrow version-agnostic)."""
    return list(col.chunks) if isinstance(col, pa.ChunkedArray) else [col]


def _token_vectors_to_batch(batch: pa.Table):
    """Rebuild a TokenizedBatch from stored token-vector list columns."""
    from .tokenize import TokenizedBatch

    toks = batch["tokens"].combine_chunks() if isinstance(
        batch["tokens"], pa.ChunkedArray
    ) else batch["tokens"]
    poss = batch["tok_pos"].combine_chunks() if isinstance(
        batch["tok_pos"], pa.ChunkedArray
    ) else batch["tok_pos"]
    n = len(batch)
    t_off = np.asarray(toks.offsets, dtype=np.int64)
    p_off = np.asarray(poss.offsets, dtype=np.int64)
    counts = np.diff(t_off)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts).astype(np.int32)
    # slice child arrays by the logical offset window (sliced ListArrays keep
    # the full child buffer)
    terms = toks.values.to_numpy(zero_copy_only=False)[t_off[0] : t_off[-1]]
    positions = np.asarray(poss.values, dtype=np.int32)[p_off[0] : p_off[-1]]
    # doc_len counts non-overlapping tokens: positions strictly increase for
    # parts; overlaps repeat a position. Use max(pos)+1 per doc == doc_len.
    doc_len = np.zeros(n, dtype=np.int32)
    if positions.size:
        np.maximum.at(doc_len, doc_idx, positions + 1)
    return TokenizedBatch(
        terms=np.asarray(terms, dtype=object),
        positions=positions,
        doc_idx=doc_idx,
        doc_len=doc_len,
        n_docs=n,
    )


def _tokenize_cfg(batch: pa.Table, cfg: BuildConfig):
    """Tokenize per config: fixed profile, or per-language analyzer routing
    when profile == "auto" (reference: one analyzer chain per language
    field, schema.xml:466-887)."""
    from .tokenize import tokenize_by_lang

    if cfg.profile == "auto":
        return tokenize_by_lang(batch["content"], batch["lang"])
    return tokenize_batch(
        batch["content"], profile=cfg.profile,
        protected=frozenset(cfg.protected_words),
    )


def _sha_and_bucket(batch: pa.Table, cfg: BuildConfig) -> pa.Table:
    """Stateless map: content sha256 + doc bucket + doc_len/norm_byte
    (+ length-cap filter).

    Tokenization happens HERE (batch-parallel, before dedup) rather than in
    the per-bucket group stage: ~3% of tokenize work is wasted on rows that
    dedup later drops, but the group stage stays I/O-shaped and the heavy
    CPU runs at full map parallelism."""
    if cfg.record_hook is not None:
        batch = cfg.record_hook(batch)
    # drop rows with null identity/content fields (M3 blank-filter analog)
    valid = pc.is_valid(batch["content"])
    for col in ("repo", "path", "commit"):
        valid = pc.and_(valid, pc.is_valid(batch[col]))
    batch = batch.filter(valid)
    if cfg.max_content_chars is not None:
        mask = pc.less_equal(pc.utf8_length(batch["content"]), cfg.max_content_chars)
        batch = batch.filter(mask)
    contents = batch["content"].to_pylist()
    shas = [hashlib.sha256(c.encode("utf-8")).hexdigest() for c in contents]
    # RANGE-partition the uniform sha prefix: bucket boundaries are contiguous
    # sha ranges, so global doc order (doc_bucket asc, sha asc) == plain sha
    # order — docIDs are the global content-sha rank, independent of
    # num_doc_buckets and of scheduling (SURVEY.md §7.4.4 determinism).
    buckets = np.array(
        [(int(s[:8], 16) * cfg.num_doc_buckets) >> 32 for s in shas], dtype=np.int32
    )
    if cfg.store_token_vectors:
        tb = _tokenize_cfg(batch, cfg)
        doc_len = tb.doc_len
    else:
        # stage 1 needs only doc lengths; the count-only path skips the
        # per-occurrence term-array expansion (half the string traffic)
        from .tokenize import doc_token_lengths, doc_token_lengths_by_lang

        if cfg.profile == "auto":
            doc_len = doc_token_lengths_by_lang(batch["content"], batch["lang"])
        else:
            doc_len = doc_token_lengths(batch["content"], cfg.profile)
    norm = small_float_int_to_byte4(doc_len)
    out = (
        batch.append_column("content_sha256", pa.array(shas, pa.string()))
        .append_column("doc_bucket", pa.array(buckets, pa.int32()))
        .append_column("doc_len", pa.array(doc_len, pa.int32()))
        .append_column("norm_byte", pa.array(norm.astype(np.uint8), pa.uint8()))
    )
    if cfg.store_token_vectors:
        n = len(batch)
        order = np.argsort(tb.doc_idx, kind="stable")
        counts = np.bincount(tb.doc_idx, minlength=n).astype(np.int64)
        offs = pa.array(
            np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        )
        toks = pa.ListArray.from_arrays(
            offs, pa.array(tb.terms[order].astype("U"), pa.string())
        )
        poss = pa.ListArray.from_arrays(
            offs, pa.array(tb.positions[order], pa.int32())
        )
        out = out.append_column("tokens", toks).append_column("tok_pos", poss)
    return out


def _list_input_files(input_path: str | list[str]) -> list[str]:
    """Flat file listing (no parquet-footer opens — metadata-free)."""
    if isinstance(input_path, str):
        if os.path.isdir(input_path):
            return sorted(
                os.path.join(input_path, f)
                for f in os.listdir(input_path)
                if f.endswith(".parquet") or f.endswith(".jsonl")
            )
        return [input_path]
    return list(input_path)


def _list_fragments(input_path: str | list[str]) -> list[tuple[str, int]]:
    """(file, row_group) work units for storage-direct map tasks. Ray 2.49
    does NOT fuse ReadParquet with a following map_batches (verified via the
    execution plan), so a Dataset-read feeding a map round-trips every batch
    through the object store — pure memory-bandwidth cost at high CPU counts.
    Reading fragments INSIDE the map task leaves only tiny acks on the
    object store. (At 100 TB the listing itself parallelizes; metadata-only
    reads here.)

    Newline-delimited JSON inputs (`.jsonl` — the reference's actual ingest
    format, parseJSON.pl reads per-product JSON exports) are listed as one
    fragment per FILE (row_group = -1): a JSONL file has no internal split
    points without a scan, so read parallelism comes from the file count,
    which is exactly how the reference's exports arrive."""
    import pyarrow.parquet as pqt

    files = _list_input_files(input_path)
    frags = []
    for f in files:
        if f.endswith(".jsonl"):
            frags.append((f, -1))
            continue
        md = pqt.ParquetFile(f).metadata
        frags.extend((f, rg) for rg in range(md.num_row_groups))
    return frags


def _read_input_fragment(path: str, rg: int, columns: list[str]) -> pa.Table:
    """One storage-direct input read: a parquet row group, or (rg < 0) a
    whole newline-delimited JSON file parsed with pyarrow.json. Column
    pruning happens post-parse for JSONL (row-oriented formats cannot skip
    columns at read); schema is normalized to the requested column order."""
    if int(rg) < 0:
        from pyarrow import json as pj

        # pyarrow.json's default 1 MiB block_size fails with ArrowInvalid
        # ("straddling object straddles two block boundaries") on any JSON
        # line larger than the block — routine for big documents. Mirror
        # Ray's JSON datasource: retry with doubled block_size, capped by
        # the file size (one block = whole file always parses).
        block = 1 << 20
        fsize = max(os.path.getsize(path), 1)
        while True:
            try:
                opts = pj.ReadOptions(block_size=min(block, fsize + 1))
                return pj.read_json(path, read_options=opts).select(columns)
            except pa.ArrowInvalid:
                if block > fsize:
                    raise
                block *= 2
    import pyarrow.parquet as pqt

    return pqt.ParquetFile(path).read_row_group(int(rg), columns=columns)


def _fragment_dataset(frags: list[tuple[str, int]], per_task: int = 1):
    """Dataset of (file, row-group) specs, `per_task` fragments per block
    (= per map task). Grouping fragments shrinks the spill fan-out: a spill
    stage writes one file per partition per TASK, and thousands of tiny
    exchange files cost ~1ms each just to open on the reduce side."""
    import ray.data

    t = pa.table(
        {
            "path": pa.array([p for p, _ in frags], pa.string()),
            "rg": pa.array([r for _, r in frags], pa.int32()),
        }
    )
    n_blocks = max((len(frags) + per_task - 1) // max(per_task, 1), 1)
    return ray.data.from_arrow(t).repartition(n_blocks)


def _run_partial_indexing(
    docstore_path: str | list[str],
    cols: list[str],
    cfg3: BuildConfig,
    offsets,
    tmp_dir: str,
) -> None:
    """Stage-3 map as storage-direct fragment tasks: each task reads its own
    docstore row group and runs the posting combiner over index_batch_size
    slices (PartialIndexer is plain per-task state — the offsets table and
    term-bucket cache rebuild in milliseconds, no actor pool needed once the
    read happens in-task)."""

    def index_fragment(spec: pa.Table) -> pa.Table:
        import pyarrow.parquet as _pq

        pi = PartialIndexer(cfg3, offsets, tmp_dir)
        n_rows = 0
        for path, rg in zip(spec["path"].to_pylist(), spec["rg"].to_pylist()):
            tbl = _pq.ParquetFile(path).read_row_group(int(rg), columns=cols)
            for lo in range(0, tbl.num_rows, cfg3.index_batch_size):
                pi(tbl.slice(lo, cfg3.index_batch_size))
                n_rows += min(cfg3.index_batch_size, tbl.num_rows - lo)
            # one spill file per (tb, rb) per FRAGMENT; token from the
            # fragment identity so a task retry rewrites the same files.
            # Zero-padded rg: the merge reads parts in sorted-NAME order and
            # relies on it matching ascending (doc_bucket, row group) order.
            pi.flush(f"{os.path.basename(path)}-{int(rg):06d}")
        return pa.table({"n": pa.array([n_rows], pa.int64())})

    _fragment_dataset(_list_fragments(docstore_path)).map_batches(
        index_fragment, batch_format="pyarrow", batch_size=1, num_cpus=1
    ).count()


def _make_doc_spiller(cfg: BuildConfig, tmp_dir: str):
    """Stage-1 map fn factory: sha/bucket/doc_len a batch, spill partitioned
    by doc_bucket (content-derived part names — a task retry rewrites its own
    file). Shared by build_index and extend_index."""

    def map_and_spill(batch: pa.Table) -> pa.Table:
        out = _sha_and_bucket(batch, cfg)
        if out.num_rows == 0:
            return pa.table({"doc_bucket": pa.array([], pa.int32())})
        h = hashlib.sha256()
        h.update("\x1f".join(out["content_sha256"].to_pylist()).encode())
        h.update("\x1f".join(out["path"].to_pylist()).encode())
        fname = f"part-{h.hexdigest()[:32]}.parquet"
        b = np.asarray(out["doc_bucket"])
        order = np.argsort(b, kind="stable")
        out = out.take(pa.array(order))
        bs = b[order]
        bounds = np.flatnonzero(np.concatenate(([True], bs[1:] != bs[:-1])))
        ends = np.concatenate((bounds[1:], [bs.size]))
        acks = []
        for lo, hi in zip(bounds, ends):
            bb = int(bs[lo])
            atomic_write_parquet(
                os.path.join(tmp_dir, f"bucket={bb:05d}", fname),
                out.slice(lo, hi - lo),
                compression=cfg.exchange_compression,
            )
            acks.append(bb)
        return pa.table({"doc_bucket": pa.array(acks, pa.int32())})

    return map_and_spill


class BucketWriter:
    """Stage-1 group fn: dedup + rank + tokenize + atomic docstore write.
    `force=True` (extend_index) bypasses the completed-partition shortcut and
    overwrites the bucket (merge-upsert semantics)."""

    def __init__(self, index_dir: str, cfg: BuildConfig, force: bool = False):
        self.index_dir = index_dir
        self.cfg = cfg
        self.force = force

    def _summary_table(self, rec: dict) -> pa.Table:
        return pa.table(
            {
                "doc_bucket": pa.array([rec["partition_id"]], pa.int32()),
                "n_docs": pa.array([rec["n_docs"]], pa.int64()),
                "total_len": pa.array([rec["total_len"]], pa.int64()),
                "n_input_rows": pa.array([rec["n_input_rows"]], pa.int64()),
                "n_dups_removed": pa.array([rec["n_dups_removed"]], pa.int64()),
            }
        )

    def __call__(self, group: pa.Table) -> pa.Table:
        bucket = int(group["doc_bucket"][0].as_py())
        out_path = os.path.join(self.index_dir, "docstore", f"bucket={bucket:05d}.parquet")
        ledger = Ledger(self.index_dir, "docstore")
        if not self.force:
            rec = ledger.get(bucket, out_path)
            if rec is not None:
                return self._summary_table(rec)

        sha = np.asarray(group["content_sha256"].to_numpy(zero_copy_only=False))
        repo = group["repo"].to_numpy(zero_copy_only=False)
        path = group["path"].to_numpy(zero_copy_only=False)
        commit = group["commit"].to_numpy(zero_copy_only=False)
        order = np.lexsort((commit, path, repo, sha))
        group = group.take(pa.array(order))
        sha = sha[order]
        # keep first row per sha (deterministic: lexicographically smallest
        # (repo, path, commit) wins — the reference's last-write-wins upsert
        # replaced arrival-order nondeterminism; we pick a total order instead)
        keep = np.concatenate(([True], sha[1:] != sha[:-1]))
        # multiValued accumulation: per sha group, sorted distinct values of
        # each configured field across ALL raw rows (the reference's atomic
        # list-add on productname). Extend path: old survivors carry their
        # accumulated list in `{f}_all` (exploded here); rows without a list
        # (fresh input) contribute their scalar value — the union of distinct
        # sets is associative, so incremental == full rebuild.
        mv_arrays: dict[str, pa.Array] = {}
        n_groups = int(keep.sum())
        gi = np.cumsum(keep) - 1  # group ordinal per raw (sorted) row
        for f in self.cfg.multivalue_fields:
            fa = f + "_all"
            if fa in group.column_names:
                import pyarrow.compute as _pc

                la = group[fa].combine_chunks()
                valid = _pc.is_valid(la).to_numpy(zero_copy_only=False)
                ln = np.asarray(
                    _pc.fill_null(_pc.list_value_length(la), 0), dtype=np.int64
                )
                flat = la.flatten().to_numpy(zero_copy_only=False)
                scal = group[f].to_numpy(zero_copy_only=False)
                vals = np.concatenate([flat, scal[~valid]])
                gis = np.concatenate([np.repeat(gi, ln), gi[~valid]])
            else:
                vals = group[f].to_numpy(zero_copy_only=False)
                gis = gi
            o2 = np.lexsort((vals, gis))
            v2, g2 = vals[o2], gis[o2]
            uniq = np.concatenate(
                ([True], (g2[1:] != g2[:-1]) | (v2[1:] != v2[:-1]))
            )
            v2, g2 = v2[uniq], g2[uniq]
            counts = np.bincount(g2, minlength=n_groups)
            offs = np.concatenate(([0], np.cumsum(counts)))
            mv_arrays[fa] = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), pa.array(v2, pa.string())
            )
        group = group.filter(pa.array(keep))
        n = group.num_rows

        cols = {
            "doc_bucket": pa.array(np.full(n, bucket, dtype=np.int32)),
            "local_rank": pa.array(np.arange(n, dtype=np.int64)),
            "repo": group["repo"],
            "path": group["path"],
            "commit": group["commit"],
            "lang": group["lang"],
            "content_sha256": group["content_sha256"],
            "doc_len": group["doc_len"],
            "norm_byte": group["norm_byte"],
            **mv_arrays,
            "content": group["content"],
        }
        if "tokens" in group.column_names:
            cols["tokens"] = group["tokens"]
            cols["tok_pos"] = group["tok_pos"]
        table = pa.table(cols)
        atomic_write_parquet(out_path, table)
        shas_digest = hashlib.sha256("".join(map(str, sha[keep])).encode()).hexdigest()
        rec = {
            "partition_id": bucket,
            "n_docs": n,
            "total_len": int(np.asarray(table["doc_len"]).sum()),
            "n_input_rows": int(keep.size),
            "n_dups_removed": int(keep.size - n),
            "content_sha256s_digest": shas_digest,
            "output": os.path.relpath(out_path, self.index_dir),
        }
        ledger.put(bucket, rec)
        return self._summary_table(rec)


class PartialIndexer:
    """Stage-3 actor-pool batch fn: tokenize + per-batch posting combiner.

    Stateful actor (map_batches class UDF): the doc-id offset table is loaded
    once per actor in __init__ (broadcast-small-side pattern, SURVEY.md T1),
    not per batch."""

    def __init__(
        self, cfg: BuildConfig, offsets: list[int], partials_dir: str | None = None
    ):
        self.cfg = cfg
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.partials_dir = partials_dir  # set -> disk-shuffle mode
        self._tb_cache: dict[str, int] = {}
        # disk mode: (tb, rb) -> staged row slices, written by flush()
        self._pending: dict[tuple[int, int], list[pa.Table]] = {}

    def _term_buckets(self, terms: np.ndarray) -> np.ndarray:
        cache = self._tb_cache
        ntb = self.cfg.num_term_buckets
        out = np.empty(terms.size, dtype=np.int32)
        for i, t in enumerate(terms):
            t = str(t)
            v = cache.get(t)
            if v is None:
                v = zlib.crc32(t.encode("utf-8")) % ntb
                cache[t] = v
            out[i] = v
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        doc_id = (
            self.offsets[np.asarray(batch["doc_bucket"])]
            + np.asarray(batch["local_rank"])
        )
        norm_byte = np.asarray(batch["norm_byte"]).astype(np.uint8)

        if "tokens" in batch.column_names:
            tb = _token_vectors_to_batch(batch)
            if tb.terms.size == 0:
                codes = np.empty(0, np.int64)
            else:
                dictionary, codes = np.unique(
                    tb.terms.astype("U"), return_inverse=True
                )
                dictionary = dictionary.astype(object)
                codes = codes.astype(np.int64)
            positions, doc_idx = tb.positions, tb.doc_idx
        elif cfg.profile == "auto":
            from .tokenize import tokenize_by_lang

            tb = tokenize_by_lang(batch["content"], batch["lang"])
            if tb.terms.size == 0:
                codes = np.empty(0, np.int64)
            else:
                dictionary, codes = np.unique(
                    tb.terms.astype("U"), return_inverse=True
                )
                dictionary = dictionary.astype(object)
                codes = codes.astype(np.int64)
            positions, doc_idx = tb.positions, tb.doc_idx
        else:
            # integer-coded tokenize: no per-occurrence string arrays in the
            # hot path (the object-array + fixed-width-unicode expansion was
            # the stage's dominant memory traffic)
            from .tokenize import tokenize_batch_encoded

            eb = tokenize_batch_encoded(
                batch["content"], profile=cfg.profile,
                protected=frozenset(cfg.protected_words),
            )
            codes = eb.codes
            dictionary = eb.vocab
            positions, doc_idx = eb.positions, eb.doc_idx
        if codes.size == 0:
            if self.partials_dir is not None:
                return pa.table(
                    {
                        "term_bucket": pa.array([], pa.int32()),
                        "n_rows": pa.array([], pa.int64()),
                    }
                )
            return _empty_partial_table(cfg)

        d = doc_id[doc_idx]
        nb = norm_byte[doc_idx]
        order = np.lexsort((positions, d, codes))
        c, dd, pp, nn = codes[order], d[order], positions[order], nb[order]

        # posting boundaries: one posting per (term, doc)
        new_post = np.concatenate(([True], (c[1:] != c[:-1]) | (dd[1:] != dd[:-1])))
        post_of_tok = np.cumsum(new_post) - 1
        tf = np.bincount(post_of_tok).astype(np.int32)
        p_doc = dd[new_post]
        p_code = c[new_post]
        p_norm = nn[new_post]
        p_rb = p_doc >> np.int64(cfg.range_bits)

        # row boundaries: one output row per (term, doc-range)
        new_row = np.concatenate(
            ([True], (p_code[1:] != p_code[:-1]) | (p_rb[1:] != p_rb[:-1]))
        )
        row_of_post = np.cumsum(new_row) - 1
        n_rows = int(row_of_post[-1]) + 1
        row_code = p_code[new_row]
        row_rb = p_rb[new_row]
        row_npost = np.bincount(row_of_post).astype(np.int64)
        post_offsets = np.concatenate(([0], np.cumsum(row_npost))).astype(np.int32)

        # positions flat per row (token stream is already grouped by posting)
        row_of_tok = row_of_post[post_of_tok]
        row_ntok = np.bincount(row_of_tok, minlength=n_rows).astype(np.int64)
        tok_offsets = np.concatenate(([0], np.cumsum(row_ntok))).astype(np.int32)

        terms_str = dictionary[row_code]
        tbuckets = self._term_buckets(terms_str)

        def list_arr(offsets, values, typ):
            return pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(values, typ)
            )

        # doc ids spill RANGE-LOCAL (doc & (2^range_bits - 1)); the absolute
        # id reconstructs from the row's range_bucket at merge time. int32
        # when the range span allows halves the partials' dominant column.
        rbits = int(cfg.range_bits)
        p_dl = p_doc & np.int64((1 << rbits) - 1)
        dl_np, dl_pa = (
            (np.int32, pa.int32()) if rbits <= 31 else (np.int64, pa.int64())
        )
        # disk mode: tf/position columns narrow to uint16 when the batch's
        # values fit (the reference caps segments at 5000 chars,
        # parseJSON.pl:313, so positions are small; pathological batches
        # fall back to int32 and the merge concat promotes). The position
        # stream is the largest partials column — halving it halves the
        # encode leg's dominant decompress+gather traffic. Sort mode keeps
        # the fixed int32 schema (groupby requires stable block schemas).
        dynamic = self.partials_dir is not None
        if dynamic and (tf.size == 0 or int(tf.max()) < 65536):
            tf_arr, tf_pa = tf.astype(np.uint16), pa.uint16()
        else:
            tf_arr, tf_pa = tf, pa.int32()
        if dynamic and (pp.size == 0 or int(pp.max()) < 65536):
            pp_arr, pp_pa = pp.astype(np.uint16), pa.uint16()
        else:
            pp_arr, pp_pa = pp.astype(np.int32), pa.int32()
        out = pa.table(
            {
                "term_bucket": pa.array(tbuckets, pa.int32()),
                "term": pa.array(terms_str.astype("U"), pa.string()),
                "range_bucket": pa.array(row_rb, pa.int64()),
                "doc_local": list_arr(post_offsets, p_dl.astype(dl_np), dl_pa),
                "tfs": list_arr(post_offsets, tf_arr, tf_pa),
                "norms": list_arr(post_offsets, p_norm.astype(np.uint8), pa.uint8()),
                "pos_flat": list_arr(tok_offsets, pp_arr, pp_pa),
            }
        )
        if self.partials_dir is None:
            return out
        # disk-shuffle mode: slice this batch's rows by (term bucket, range
        # bucket) — the merge-task key; a hot term's ranges merge
        # INDEPENDENTLY so no single task encodes a stopword's whole posting
        # list. Rows are STAGED in memory; flush() (called once per fragment
        # task) writes one file per (tb, rb) — per-BATCH writes produced
        # n_docs/batch_size tiny files per hot dir, and the per-file
        # open/decompress overhead dominated the merge leg at 1M docs.
        # rb can exceed 32 bits under strided ids; tb < 2^15, rb < 2^48
        pair_key = tbuckets.astype(np.int64) * (1 << 48) + row_rb.astype(np.int64)
        order = np.argsort(pair_key, kind="stable")
        out = out.take(pa.array(order))
        key_sorted = pair_key[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], key_sorted[1:] != key_sorted[:-1]))
        )
        ends = np.concatenate((bounds[1:], [key_sorted.size]))
        acks = []
        for lo, hi in zip(bounds, ends):
            tb = int(key_sorted[lo] >> 48)
            rb = int(key_sorted[lo] & ((1 << 48) - 1))
            self._pending.setdefault((tb, rb), []).append(
                out.slice(lo, hi - lo)
            )
            acks.append((tb, hi - lo))
        return pa.table(
            {
                "term_bucket": pa.array([a[0] for a in acks], pa.int32()),
                "n_rows": pa.array([int(a[1]) for a in acks], pa.int64()),
            }
        )

    def flush(self, token: str) -> None:
        """Write staged partial rows: one part-{token}.parquet per (term
        bucket, range bucket) dir. `token` must be stable across Ray task
        RETRIES (derive it from the fragment's identity, not from time or
        randomness) so a retry rewrites its own files instead of leaving
        duplicates — duplicate postings would make encode_postings raise
        'doc_ids must be strictly increasing' and wedge the resume."""
        for (tb, rb), parts in self._pending.items():
            path = os.path.join(
                self.partials_dir, f"bucket={tb:05d}-r{rb:015d}",
                f"part-{token}.parquet",
            )
            atomic_write_parquet(
                path,
                pa.concat_tables(
                    parts, promote_options="permissive"
                ).combine_chunks(),
                compression=self.cfg.exchange_compression,
            )
        self._pending.clear()


def _empty_partial_table(cfg: BuildConfig) -> pa.Table:
    dl = pa.int32() if int(cfg.range_bits) <= 31 else pa.int64()
    return pa.table(
        {
            "term_bucket": pa.array([], pa.int32()),
            "term": pa.array([], pa.string()),
            "range_bucket": pa.array([], pa.int64()),
            "doc_local": pa.array([], pa.list_(dl)),
            "tfs": pa.array([], pa.list_(pa.int32())),
            "norms": pa.array([], pa.list_(pa.uint8())),
            "pos_flat": pa.array([], pa.list_(pa.int32())),
        }
    )


def _expand_slices(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Gather indices for concatenating slices [starts[i], starts[i]+counts[i]).

    idx[j] = starts[row(j)] + (j - offs[row(j)]) == repeat(starts-offs)[j] + j
    — the algebraic form needs ONE repeat and ONE arange, no per-output
    gathers (this runs over every posting in the merge leg)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(counts[:-1])))
    base = np.repeat(np.asarray(starts, dtype=np.int64) - offs, counts)
    base += np.arange(total, dtype=np.int64)
    return base


class SegmentWriter:
    """Stage-3 group fn: merge partial postings for one term bucket, encode,
    atomic segment write."""

    def __init__(self, index_dir: str, cfg: BuildConfig):
        self.index_dir = index_dir
        self.cfg = cfg

    def _summary_table(self, rec: dict) -> pa.Table:
        return pa.table(
            {
                "term_bucket": pa.array([rec["partition_id"]], pa.int32()),
                "n_terms": pa.array([rec["n_terms"]], pa.int64()),
                "n_rows": pa.array([rec["n_rows"]], pa.int64()),
                "n_postings": pa.array([rec["n_postings"]], pa.int64()),
            }
        )

    # ---- segment file layout (see BuildConfig.segment_range_groups) ----
    def _single_path(self, tb: int) -> str:
        return os.path.join(self.index_dir, "segments", f"bucket={tb:05d}.parquet")

    def _bucket_dir(self, tb: int) -> str:
        return os.path.join(self.index_dir, "segments", f"bucket={tb:05d}")

    def _rg_path(self, tb: int, rg: int) -> str:
        return os.path.join(self._bucket_dir(tb), f"rg={int(rg):05d}.parquet")

    def rec_outputs_exist(self, rec: dict) -> bool:
        outs = rec.get("outputs") or [rec["output"]]
        return all(
            os.path.exists(os.path.join(self.index_dir, p)) for p in outs
        )

    def completed(self, tb: int, ledger: Ledger | None = None) -> dict | None:
        """Ledger record for a finished bucket whose output file(s) all
        still exist (multi-file layouts can't use Ledger.get's single-path
        check), else None."""
        ledger = ledger or Ledger(self.index_dir, "segments")
        rec = ledger.get(tb)
        if rec is not None and self.rec_outputs_exist(rec):
            return rec
        return None

    def _write_bucket(
        self, tb: int, seg: pa.Table, n_terms: int, n_postings: int,
        ledger: Ledger,
    ) -> pa.Table:
        """Write one term bucket's sorted segment rows under the configured
        layout (single file, or one file per doc-range group) + ledger
        commit. Physical layout is normalized to single-chunk columns so
        disk- and sort-shuffle builds stay byte-identical (parquet encodes
        logical content + chunking only; the cast renames list children
        back to Arrow's "item" after any parquet round-trip renamed them
        "element")."""
        seg = seg.combine_chunks().cast(segment_schema())
        G = self.cfg.segment_range_groups
        if G <= 1:
            out_path = self._single_path(tb)
            atomic_write_parquet(out_path, seg)
            outputs = [os.path.relpath(out_path, self.index_dir)]
        else:
            bdir = self._bucket_dir(tb)
            os.makedirs(bdir, exist_ok=True)
            rgs = np.asarray(
                _range_group_of(
                    np.asarray(seg["range_bucket"], dtype=np.int64), self.cfg
                )
            )
            outputs, written = [], set()
            for rg in np.unique(rgs):
                sub = seg.filter(pa.array(rgs == rg)).combine_chunks()
                path = self._rg_path(tb, int(rg))
                atomic_write_parquet(path, sub)
                written.add(os.path.basename(path))
                outputs.append(os.path.relpath(path, self.index_dir))
            for name in os.listdir(bdir):  # stale groups from a prior run
                if (
                    name.startswith("rg=")
                    and name.endswith(".parquet")
                    and name not in written
                ):
                    os.remove(os.path.join(bdir, name))
        rec = {
            "partition_id": tb,
            "n_terms": n_terms,
            "n_rows": seg.num_rows,
            "n_postings": n_postings,
            "output": outputs[0],
            "outputs": outputs,
        }
        ledger.put(tb, rec)
        return self._summary_table(rec)

    def __call__(self, group: pa.Table) -> pa.Table:
        bucket = int(group["term_bucket"][0].as_py())
        ledger = Ledger(self.index_dir, "segments")
        rec = self.completed(bucket, ledger)
        if rec is not None:
            return self._summary_table(rec)
        rows, n_postings_total = self.merge_rows(group)
        rows.sort(key=lambda r: (r["term"], r["range_bucket"]))
        seg = pa.Table.from_pylist(rows, schema=segment_schema())
        n_terms = len({r["term"] for r in rows})
        return self._write_bucket(bucket, seg, n_terms, n_postings_total, ledger)

    def merge_dir_to_piece(self, partials_dir: str, name: str, pieces_dir: str) -> None:
        """Merge one (term_bucket, range_bucket) partials dir into an encoded
        piece file (idempotent: an existing piece is a completed merge).

        Part files are read in sorted-name order == ascending doc-bucket /
        row-group order, and each part's doc ranges are DISJOINT and ordered
        (a part spills exactly one docstore fragment, and both dense and
        strided doc ids ascend with (doc_bucket, local_rank)). A term's
        merged posting list is therefore the plain CONCATENATION of its rows
        in part order — no per-posting sort. encode_postings validates the
        strictly-increasing invariant, so a violated assumption fails loudly
        rather than corrupting the index."""
        import pyarrow.parquet as _pq

        piece_path = os.path.join(pieces_dir, f"{name}.parquet")
        if os.path.exists(piece_path):
            return
        dirpath = os.path.join(partials_dir, name)
        files = sorted(os.listdir(dirpath))
        if not files:
            return
        # ParquetFile.read(use_threads=False): the lean single-file path —
        # read_table spins per-call dataset machinery that costs ~1ms/file,
        # which dominates on thousands of small exchange parts
        tbl = pa.concat_tables(
            [
                _pq.ParquetFile(os.path.join(dirpath, f)).read(
                    use_threads=False
                )
                for f in files
            ],
            promote_options="permissive",  # mixed uint16/int32 tf/pos parts
        )
        if tbl.num_rows == 0:
            return
        rows, _ = self.merge_rows_presorted(tbl)
        atomic_write_parquet(
            piece_path, pa.Table.from_pylist(rows, schema=segment_schema()),
            compression=self.cfg.exchange_compression,
        )

    def merge_rows_presorted(self, group: pa.Table) -> tuple[list[dict], int]:
        """merge_rows for input whose rows, taken in order within each
        (term, range_bucket), hold postings with ascending disjoint doc
        ranges: a stable row-level sort by (term, range_bucket) + sequential
        gathers replaces the per-posting argsort (the encode leg's dominant
        cost). Output is identical to merge_rows on any row order."""
        cfg = self.cfg
        group = group.combine_chunks()
        denc = pc.dictionary_encode(group["term"])
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        row_code = np.asarray(denc.indices, dtype=np.int64)
        dictionary = denc.dictionary.to_numpy(zero_copy_only=False)

        docs_col = group["doc_local"].combine_chunks()
        tfs_col = group["tfs"].combine_chunks()
        norms_col = group["norms"].combine_chunks()
        pos_col = group["pos_flat"].combine_chunks()
        doc_loc = np.asarray(docs_col.values)
        tf_vals = np.asarray(tfs_col.values)
        norm_vals = np.asarray(norms_col.values)
        pos_vals = np.asarray(pos_col.values)
        row_post_off = np.asarray(docs_col.offsets, dtype=np.int64)
        row_pos_off = np.asarray(pos_col.offsets, dtype=np.int64)
        npost = np.diff(row_post_off)
        ntok = np.diff(row_pos_off)

        rb_rows = np.asarray(group["range_bucket"], dtype=np.int64)
        rb_u, rb_inv = np.unique(rb_rows, return_inverse=True)
        n_rb = int(rb_u.size)
        rkey = row_code * n_rb + rb_inv
        rorder = np.argsort(rkey, kind="stable")  # rows per key keep part order
        s_key = rkey[rorder]
        s_npost = npost[rorder]
        s_ntok = ntok[rorder]
        # gather postings row-by-row in sorted order (one pass, sequential
        # within each source row)
        g_idx = _expand_slices(row_post_off[rorder], s_npost)
        s_dl = doc_loc[g_idx]
        s_tf = tf_vals[g_idx]
        s_norm = norm_vals[g_idx]
        p_idx = _expand_slices(row_pos_off[rorder], s_ntok)
        s_pos = pos_vals[p_idx]

        new_out = np.concatenate(([True], s_key[1:] != s_key[:-1]))
        out_rows = np.flatnonzero(new_out)
        post_ends = np.cumsum(s_npost)
        post_starts = np.concatenate(([0], post_ends[:-1]))
        tok_ends = np.cumsum(s_ntok)
        tok_starts = np.concatenate(([0], tok_ends[:-1]))
        range_bits = int(cfg.range_bits)

        rows = []
        n_postings_total = 0
        for i, r0 in enumerate(out_rows):
            r1 = out_rows[i + 1] if i + 1 < out_rows.size else s_key.size
            lo, hi = int(post_starts[r0]), int(post_ends[r1 - 1])
            g = int(s_key[r0])
            rb = int(rb_u[g % n_rb])
            docs = s_dl[lo:hi].astype(np.int64) + np.int64(rb << range_bits)
            tfs = s_tf[lo:hi]
            pflat = None
            if cfg.store_positions:
                pflat = s_pos[int(tok_starts[r0]) : int(tok_ends[r1 - 1])]
            enc = encoder_for(cfg.postings_codec)(
                docs, tfs, s_norm[lo:hi], pos_flat=pflat,
                block_size=cfg.block_size,
            )
            n_postings_total += int(enc["df"])
            rows.append(
                {
                    "term": str(dictionary[g // n_rb]),
                    "range_bucket": rb,
                    "df": enc["df"],
                    "cf": enc["cf"],
                    "max_tf": enc["max_tf"],
                    "min_norm": enc["min_norm"],
                    "blob": enc["blob"],
                    "pos_blob": enc["pos_blob"],
                    "block_last": enc["block_last"].tolist(),
                    "block_off": enc["block_off"].tolist(),
                    "block_pos_off": enc["block_pos_off"].tolist(),
                    "block_max_tf": enc["block_max_tf"].tolist(),
                    "block_min_norm": enc["block_min_norm"].tolist(),
                }
            )
        return rows, n_postings_total

    def assemble(
        self,
        tb: int,
        pieces_dir: str,
        extra_rows: pa.Table | None = None,
        force: bool = False,
    ) -> pa.Table | None:
        """Concat + sort a bucket's piece files (plus optional retained rows
        from an existing segment) into the final segment file(s); ledger
        commit. Returns the summary table, or None when the bucket has no
        rows. (The from_pylist/to_pylist round-trip this path replaced
        burned a Python loop over every segment row's posting blobs — the
        stage-3 assembly straggler at 1M docs.)"""
        import pyarrow.parquet as _pq

        ledger = Ledger(self.index_dir, "segments")
        if not force:
            rec = self.completed(tb, ledger)
            if rec is not None:
                return self._summary_table(rec)
        piece_files = sorted(
            os.path.join(pieces_dir, f)
            for f in os.listdir(pieces_dir)
            if f.startswith(f"bucket={tb:05d}-") and f.endswith(".parquet")
        )
        tables = [_pq.ParquetFile(f).read(use_threads=False) for f in piece_files]
        if extra_rows is not None and extra_rows.num_rows:
            tables.append(extra_rows)
        tables = [t for t in tables if t.num_rows]
        if not tables:
            if force:
                # maintenance emptied the whole term bucket (every surviving
                # doc lacks terms hashing here): drop the stale file, else a
                # reader would keep serving deleted docs' postings from it
                out_path = self._single_path(tb)
                if os.path.exists(out_path):
                    os.remove(out_path)
                ledger.remove(tb)
            return None
        seg = pa.concat_tables(tables).combine_chunks()
        seg = seg.sort_by([("term", "ascending"), ("range_bucket", "ascending")])
        return self._write_bucket(
            tb,
            seg,
            len(pc.unique(seg["term"])),
            int(pc.sum(seg["df"]).as_py() or 0),
            ledger,
        )

    def assemble_maintenance(
        self, tb: int, pieces_dir: str, touched_db: np.ndarray
    ) -> pa.Table | None:
        """extend/delete assembly for the sharded layout
        (segment_range_groups > 1): rewrite ONLY the range groups holding
        touched doc buckets — untouched group files are left in place and
        opened just for a column-pruned (term, df) summary read, so
        maintenance file I/O scales with the update, not the index. Row
        content and order within each file are pure functions of the row
        keys, so each file stays byte-identical to a full rebuild's.
        `touched_db` is the int64 array of touched doc buckets. Returns the
        summary table, or None when the bucket ends empty."""
        import pyarrow.parquet as _pq

        cfg = self.cfg
        ledger = Ledger(self.index_dir, "segments")
        shift = np.int64(cfg.bucket_capacity_bits - cfg.range_bits)
        bdir = self._bucket_dir(tb)
        prefix = f"bucket={tb:05d}-r"
        # pieces exist only for touched doc buckets; group them by rg
        piece_by_rg: dict[int, list[str]] = {}
        for name in sorted(os.listdir(pieces_dir)):
            if not (name.startswith(prefix) and name.endswith(".parquet")):
                continue
            rb = int(name[len(prefix):-len(".parquet")])
            rg = int(_range_group_of(np.int64(rb), cfg))
            piece_by_rg.setdefault(rg, []).append(
                os.path.join(pieces_dir, name)
            )
        touched_rgs = {_doc_bucket_group(int(b), cfg) for b in touched_db}
        touched_rgs |= set(piece_by_rg)
        term_chunks: list[pa.Array] = []
        n_rows = 0
        n_postings = 0
        outputs: list[str] = []
        for rg in range(cfg.segment_range_groups):
            path = self._rg_path(tb, rg)
            exists = os.path.exists(path)
            if rg not in touched_rgs:
                if exists:  # carried over verbatim; summary read only
                    t = _pq.ParquetFile(path).read(
                        columns=["term", "df"], use_threads=False
                    )
                    term_chunks.extend(_as_chunks(t["term"]))
                    n_rows += t.num_rows
                    n_postings += int(pc.sum(t["df"]).as_py() or 0)
                    outputs.append(os.path.relpath(path, self.index_dir))
                continue
            tables = []
            if exists:
                old = _pq.ParquetFile(path).read(use_threads=False)
                rb_arr = np.asarray(old["range_bucket"], dtype=np.int64)
                keep = ~np.isin(rb_arr >> shift, touched_db)
                retained = old.filter(pa.array(keep))
                if retained.num_rows:
                    tables.append(retained)
            for p in piece_by_rg.get(rg, ()):
                t = _pq.ParquetFile(p).read(use_threads=False)
                if t.num_rows:
                    tables.append(t)
            if not tables:
                if exists:
                    os.remove(path)
                continue
            sub = pa.concat_tables(tables).combine_chunks()
            sub = sub.sort_by(
                [("term", "ascending"), ("range_bucket", "ascending")]
            )
            sub = sub.combine_chunks().cast(segment_schema())
            os.makedirs(bdir, exist_ok=True)
            atomic_write_parquet(path, sub)
            term_chunks.extend(_as_chunks(sub["term"]))
            n_rows += sub.num_rows
            n_postings += int(pc.sum(sub["df"]).as_py() or 0)
            outputs.append(os.path.relpath(path, self.index_dir))
        if not outputs:
            if os.path.isdir(bdir) and not os.listdir(bdir):
                os.rmdir(bdir)
            ledger.remove(tb)
            return None
        n_terms = len(pc.unique(pa.chunked_array(term_chunks)))
        rec = {
            "partition_id": tb,
            "n_terms": n_terms,
            "n_rows": n_rows,
            "n_postings": n_postings,
            "output": outputs[0],
            "outputs": outputs,
        }
        ledger.put(tb, rec)
        return self._summary_table(rec)

    def merge_rows(self, group: pa.Table) -> tuple[list[dict], int]:
        """Merge partial postings into encoded segment rows (one per
        (term, range_bucket)); deterministic given the multiset of partial
        rows, independent of their order. Returns (rows, n_postings)."""
        cfg = self.cfg

        group = group.combine_chunks()
        denc = pc.dictionary_encode(group["term"])
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        row_code = np.asarray(denc.indices, dtype=np.int64)
        dictionary = denc.dictionary.to_numpy(zero_copy_only=False)

        docs_col = group["doc_local"].combine_chunks()
        tfs_col = group["tfs"].combine_chunks()
        norms_col = group["norms"].combine_chunks()
        pos_col = group["pos_flat"].combine_chunks()
        doc_loc = np.asarray(docs_col.values)  # RANGE-LOCAL ids (int32/int64)
        tf_vals = np.asarray(tfs_col.values)
        norm_vals = np.asarray(norms_col.values)
        pos_vals = np.asarray(pos_col.values)
        row_post_off = np.asarray(docs_col.offsets, dtype=np.int64)
        row_pos_off = np.asarray(pos_col.offsets, dtype=np.int64)
        npost_per_row = np.diff(row_post_off)

        # explode: per posting -> (code, rb ordinal, doc_local, tf, norm,
        # pos_start). Range buckets are mapped to dense ordinals so the sort
        # key packs into ONE int64 (code, rb, doc_local) — a single argsort
        # over unique keys instead of a 3-pass int64 lexsort; this is the
        # encode leg's dominant memory traffic at 1M+ docs.
        rb_rows = np.asarray(group["range_bucket"], dtype=np.int64)
        rb_u, rb_inv = np.unique(rb_rows, return_inverse=True)
        post_code = np.repeat(row_code, npost_per_row)
        post_rb = np.repeat(rb_inv.astype(np.int64), npost_per_row)
        # pos_start per posting within pos_vals: row pos offset + cumsum of tfs
        # within the row
        tf_shift = np.concatenate(([0], np.cumsum(tf_vals, dtype=np.int64)[:-1]))
        row_of_post = np.repeat(np.arange(len(group), dtype=np.int64), npost_per_row)
        row_first_post = np.concatenate(([0], np.cumsum(npost_per_row)[:-1]))
        pos_start = (
            row_pos_off[row_of_post]
            + tf_shift
            - tf_shift[row_first_post][row_of_post]
        )

        range_bits = int(cfg.range_bits)
        n_rb = int(rb_u.size)
        if int(dictionary.size) * max(n_rb, 1) < (1 << (62 - range_bits)):
            key = ((post_code * n_rb + post_rb) << np.int64(range_bits)) | (
                doc_loc.astype(np.int64, copy=False)
            )
            order = np.argsort(key)  # (term, rb, doc) unique -> keys unique
            s_key = key[order]
            s_grp = s_key >> np.int64(range_bits)
            s_dl = s_key & np.int64((1 << range_bits) - 1)
        else:  # degenerate huge-vocab/range case: plain 3-key lexsort
            order = np.lexsort((doc_loc, post_rb, post_code))
            s_grp = post_code[order] * n_rb + post_rb[order]
            s_dl = doc_loc[order].astype(np.int64)
        s_tf = tf_vals[order]
        s_norm = norm_vals[order]
        s_pstart = pos_start[order]

        new_out = np.concatenate(([True], s_grp[1:] != s_grp[:-1]))
        out_starts = np.flatnonzero(new_out)
        out_ends = np.concatenate((out_starts[1:], [s_grp.size]))

        rows = []
        n_postings_total = 0
        for lo, hi in zip(out_starts, out_ends):
            g = int(s_grp[lo])
            rb = int(rb_u[g % n_rb])
            docs = s_dl[lo:hi] + np.int64(rb << range_bits)
            tfs = s_tf[lo:hi]
            norms = s_norm[lo:hi]
            pflat = None
            if cfg.store_positions:
                idx = _expand_slices(s_pstart[lo:hi], tfs.astype(np.int64))
                pflat = pos_vals[idx]
            enc = encoder_for(cfg.postings_codec)(
                docs, tfs, norms, pos_flat=pflat, block_size=cfg.block_size
            )
            term = str(dictionary[g // n_rb])
            n_postings_total += int(enc["df"])
            rows.append(
                {
                    "term": term,
                    "range_bucket": rb,
                    "df": enc["df"],
                    "cf": enc["cf"],
                    "max_tf": enc["max_tf"],
                    "min_norm": enc["min_norm"],
                    "blob": enc["blob"],
                    "pos_blob": enc["pos_blob"],
                    "block_last": enc["block_last"].tolist(),
                    "block_off": enc["block_off"].tolist(),
                    "block_pos_off": enc["block_pos_off"].tolist(),
                    "block_max_tf": enc["block_max_tf"].tolist(),
                    "block_min_norm": enc["block_min_norm"].tolist(),
                }
            )
        return rows, n_postings_total


def segment_schema() -> pa.Schema:
    return pa.schema(
        [
            ("term", pa.string()),
            ("range_bucket", pa.int64()),
            ("df", pa.int64()),
            ("cf", pa.int64()),
            ("max_tf", pa.int32()),
            ("min_norm", pa.uint8()),
            ("blob", pa.binary()),
            ("pos_blob", pa.binary()),
            ("block_last", pa.list_(pa.int64())),
            ("block_off", pa.list_(pa.int32())),
            ("block_pos_off", pa.list_(pa.int32())),
            ("block_max_tf", pa.list_(pa.int32())),
            ("block_min_norm", pa.list_(pa.uint8())),
        ]
    )


def build_index(
    input_path: str | list[str],
    index_dir: str,
    cfg: BuildConfig | None = None,
) -> dict:
    """Run the full build; returns the manifest dict. Resumable: re-running
    after a partial failure skips completed partitions (see Ledger)."""
    import ray
    import ray.data

    import time

    cfg = cfg or BuildConfig()
    os.makedirs(index_dir, exist_ok=True)

    manifest_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f)
    t_start = time.perf_counter()

    ncpu = int(ray.cluster_resources().get("CPU", 8))

    # lineage: the input shards this index was built from
    if isinstance(input_path, str) and os.path.isdir(input_path):
        input_shards = sorted(os.listdir(input_path))
    else:
        input_shards = (
            [input_path] if isinstance(input_path, str) else list(input_path)
        )
    cfg_dict = asdict(cfg)
    cfg_dict["record_hook"] = (
        None if cfg.record_hook is None
        else getattr(cfg.record_hook, "__name__", "custom")
    )
    # Exchange staging is namespaced by the BUILD IDENTITY (destination +
    # input + config): on a shared exchange_root, a crashed build's stale
    # docparts/partials can only ever be reused by a build with the same
    # identity (for which they ARE valid resume data); concurrent builds
    # into different indexes can't interleave their map outputs.
    stage_token = hashlib.sha256(
        json.dumps(
            {
                "index_dir": os.path.abspath(index_dir),
                "input": input_shards,
                "cfg": cfg_dict,
            },
            sort_keys=True,
        ).encode()
    ).hexdigest()[:16]
    exroot = os.path.join(
        cfg.exchange_root or index_dir, f"exchange-{stage_token}"
    )

    # ---- stage 1: dedup + local rank per doc bucket (shuffle 1) ----
    bucket_writer = BucketWriter(index_dir, cfg)
    input_cols = ["repo", "path", "commit", "lang", "content"]

    if cfg.shuffle == "disk":
        # disk-partitioned dedup exchange (same pattern as the postings
        # exchange): storage-direct map tasks read their own (file, row
        # group) fragment, spill rows partitioned by doc_bucket to shared
        # storage (atomic dir publish), then one independent
        # dedup+rank+docstore task per bucket. No object-store traffic
        # beyond tiny acks (see _list_fragments).
        docparts_dir = os.path.join(exroot, "docparts")
        if not os.path.isdir(docparts_dir):
            tmp_dir = docparts_dir + ".tmp"
            if os.path.isdir(tmp_dir):
                import shutil

                shutil.rmtree(tmp_dir)
            os.makedirs(tmp_dir, exist_ok=True)  # empty input still publishes
            spiller = _make_doc_spiller(cfg, tmp_dir)

            def read_and_spill(spec: pa.Table) -> pa.Table:
                tbls = [
                    _read_input_fragment(path, rg, input_cols)
                    for path, rg in zip(
                        spec["path"].to_pylist(), spec["rg"].to_pylist()
                    )
                ]
                return spiller(pa.concat_tables(tbls))

            # one fragment per task: A/B-measured faster in-pipeline than
            # grouping several row groups per task (grouping cut file count
            # 3x but cost +4s of stage wall at 16 CPUs — bigger per-task
            # working sets contend for bandwidth; the reduce side's per-file
            # cost is instead addressed by the lean ParquetFile reads there)
            _fragment_dataset(_list_fragments(input_path)).map_batches(
                read_and_spill, batch_format="pyarrow", batch_size=None,
                num_cpus=1,
            ).count()
            os.replace(tmp_dir, docparts_dir)
        t_s1_map = time.perf_counter()

        def dedup_bucket(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as _pq

            outs = []
            for b in batch["doc_bucket"].to_pylist():
                bdir = os.path.join(docparts_dir, f"bucket={int(b):05d}")
                if not os.path.isdir(bdir):
                    continue
                fs = sorted(os.listdir(bdir))
                if not fs:
                    continue
                tbl = pa.concat_tables(
                    [
                        _pq.ParquetFile(os.path.join(bdir, f)).read(
                            use_threads=False
                        )
                        for f in fs
                    ]
                )
                if tbl.num_rows:
                    outs.append(bucket_writer(tbl))
            if outs:
                return pa.concat_tables(outs)
            return bucket_writer._summary_table(
                {"partition_id": -1, "n_docs": 0, "total_len": 0,
                 "n_input_rows": 0, "n_dups_removed": 0}
            ).slice(0, 0)

        summaries = (
            ray.data.from_arrow(
                pa.table(
                    {"doc_bucket": pa.array(range(cfg.num_doc_buckets), pa.int32())}
                )
            )
            .repartition(cfg.num_doc_buckets)
            .map_batches(dedup_bucket, batch_format="pyarrow", batch_size=1,
                         num_cpus=1)
            .take_all()
        )
    else:
        # override_num_blocks: the sort-shuffle's reduce parallelism tracks
        # the upstream block count, so small local inputs must be split
        # explicitly; batch_size=None keeps one batch per block (no
        # coalescing -> the downstream shuffle keeps its parallelism)
        # suffix-only listing — _list_fragments would open every parquet
        # footer serially on the driver just to detect .jsonl files, and
        # read_parquet below lists the same files again anyway
        frag_files = set(_list_input_files(input_path))
        jsonl_files = sorted(f for f in frag_files if f.endswith(".jsonl"))
        if jsonl_files:
            # mixed or pure-JSONL input on the sort path: read each format
            # with its native reader, then union (same rows, same columns)
            parts = []
            pq_files = sorted(f for f in frag_files if f.endswith(".parquet"))
            if pq_files:
                parts.append(
                    ray.data.read_parquet(
                        pq_files,
                        columns=input_cols,
                        override_num_blocks=max(4 * ncpu, 32),
                    )
                )
            parts.append(
                ray.data.read_json(
                    jsonl_files,
                    override_num_blocks=max(4 * ncpu, 32),
                ).select_columns(input_cols)
            )
            ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
        else:
            ds = ray.data.read_parquet(
                input_path,
                columns=input_cols,
                override_num_blocks=max(4 * ncpu, 32),
            )
        mapped = ds.map_batches(
            lambda b: _sha_and_bucket(b, cfg), batch_format="pyarrow",
            batch_size=None,
        )

        def write_doc_bucket(group: pa.Table) -> pa.Table:
            return bucket_writer(group)

        summaries = (
            mapped.groupby("doc_bucket")
            .map_groups(write_doc_bucket, batch_format="pyarrow")
            .take_all()
        )
    t_stage1 = time.perf_counter()

    # ---- stage 2: driver-side prefix sums (tiny: one row per bucket) ----
    counts = np.zeros(cfg.num_doc_buckets, dtype=np.int64)
    total_len = 0
    n_input = 0
    n_dups = 0
    for row in summaries:
        counts[row["doc_bucket"]] = row["n_docs"]
        total_len += row["total_len"]
        n_input += row["n_input_rows"]
        n_dups += row["n_dups_removed"]
    if cfg.id_mode == "strided":
        if int(counts.max(initial=0)) >= (1 << cfg.bucket_capacity_bits):
            raise ValueError("doc bucket overflows bucket_capacity_bits")
        offsets = [
            b << cfg.bucket_capacity_bits for b in range(cfg.num_doc_buckets)
        ]
    else:
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1])).tolist()
    n_docs = int(counts.sum())

    # ---- stage 3: tokenize + partial postings + term-bucket merge ----
    if n_docs == 0:
        # empty corpus: commit an empty index (no docstore/segments)
        if cfg.shuffle == "disk":
            import shutil

            shutil.rmtree(exroot, ignore_errors=True)
        # resolve range_bits even for an empty corpus: extend_index
        # round-trips the manifest config through BuildConfig and assumes
        # an int (a null here crashes its bucket/shift arithmetic)
        manifest = {
            "version": MANIFEST_VERSION,
            "config": {
                **asdict(cfg),
                "range_bits": _resolve_range_bits(cfg, 0),
                "record_hook": None,
            },
            "input_shards": [],
            "n_docs": 0,
            "n_input_rows": 0,
            "n_dups_removed": 0,
            "total_len": 0,
            "avgdl": 0.0,
            "doc_offsets": offsets,
            "doc_counts": counts.tolist(),
            "n_terms": 0,
            "n_postings": 0,
            "timings": {},
        }
        atomic_write_json(manifest_path, manifest)
        return manifest

    if cfg.index_concurrency is None:
        # proportional headroom for the producer (read) stage: a FIXED -2
        # handicaps small clusters (at 4 CPUs it halves the pool) and is a
        # scale-dependent distortion; 1/8 of the cluster is the same
        # fraction at every size
        concurrency = max(2, ncpu - max(1, ncpu // 8))
    else:
        concurrency = cfg.index_concurrency
    def _docstore_cols() -> list[str]:
        if cfg.store_token_vectors:
            return ["doc_bucket", "local_rank", "norm_byte", "tokens", "tok_pos"]
        cols = ["doc_bucket", "local_rank", "norm_byte", "content"]
        if cfg.profile == "auto":
            cols.append("lang")
        return cols

    def read_docstore():
        return ray.data.read_parquet(
            os.path.join(index_dir, "docstore"),
            columns=_docstore_cols(),
            override_num_blocks=max(4 * ncpu, cfg.num_doc_buckets),
        )

    # resolve the adaptive doc-range salt now that n_docs is known; record
    # it in the manifest so readers/incremental builds see the concrete value
    from dataclasses import replace as _dc_replace

    cfg3 = _dc_replace(cfg, range_bits=_resolve_range_bits(cfg, n_docs))
    cfg_dict["range_bits"] = cfg3.range_bits

    segment_writer = SegmentWriter(index_dir, cfg3)

    if cfg.shuffle == "disk":
        # map side: storage-direct tasks read docstore fragments themselves
        # (no object-store round trip; see _list_fragments) and spill
        # partial postings partitioned by (term bucket, range bucket);
        # reduce side: one independent merge task per pair.
        partials_dir = os.path.join(exroot, "partials")
        if not os.path.isdir(partials_dir):
            tmp_dir = partials_dir + ".tmp"
            if os.path.isdir(tmp_dir):
                import shutil

                shutil.rmtree(tmp_dir)
            os.makedirs(tmp_dir, exist_ok=True)  # token-less corpus edge
            _run_partial_indexing(
                os.path.join(index_dir, "docstore"), _docstore_cols(),
                cfg3, offsets, tmp_dir,
            )
            os.replace(tmp_dir, partials_dir)
        t_s3_map = time.perf_counter()

        # ---- merge: one task per (term_bucket, range_bucket) dir, so hot
        # terms' ranges encode in parallel; pieces land in transient staging.
        pieces_dir = os.path.join(exroot, "segpieces")
        os.makedirs(pieces_dir, exist_ok=True)
        seg_ledger = Ledger(index_dir, "segments")

        def group_tb(name: str) -> int:
            return int(name[len("bucket=") : len("bucket=") + 5])

        group_names = []
        for name in sorted(os.listdir(partials_dir)):
            if not name.startswith("bucket="):
                continue
            tb = group_tb(name)
            if segment_writer.completed(tb, seg_ledger) is not None:
                continue  # bucket fully assembled in a previous run
            d = os.path.join(partials_dir, name)
            size = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))
            group_names.append((size, name))
        # LPT scheduling: biggest (stopword-heavy) groups first
        group_names.sort(reverse=True)

        def merge_group(batch: pa.Table) -> pa.Table:
            for name in batch["name"].to_pylist():
                segment_writer.merge_dir_to_piece(partials_dir, name, pieces_dir)
            return pa.table({"n": pa.array([len(batch)], pa.int64())})

        if group_names:
            ray.data.from_arrow(
                pa.table({"name": pa.array([n for _, n in group_names])})
            ).repartition(len(group_names)).map_batches(
                merge_group, batch_format="pyarrow", batch_size=1, num_cpus=1
            ).count()
        t_s3_enc = time.perf_counter()

        # ---- assemble: concat + sort each bucket's pieces into its final
        # segment file (I/O only, no re-encode); ledger commit per bucket.
        def assemble_bucket(batch: pa.Table) -> pa.Table:
            outs = []
            for tb in batch["term_bucket"].to_pylist():
                s = segment_writer.assemble(int(tb), pieces_dir)
                if s is not None:
                    outs.append(s)
            return (
                pa.concat_tables(outs)
                if outs
                else segment_writer._summary_table(
                    {"partition_id": -1, "n_terms": 0, "n_rows": 0, "n_postings": 0}
                ).slice(0, 0)
            )

        seg_summaries = (
            ray.data.from_arrow(
                pa.table(
                    {
                        "term_bucket": pa.array(
                            range(cfg.num_term_buckets), pa.int32()
                        )
                    }
                )
            )
            .repartition(cfg.num_term_buckets)
            .map_batches(
                assemble_bucket, batch_format="pyarrow", batch_size=1, num_cpus=1
            )
            .take_all()
        )
    else:
        partials = read_docstore().map_batches(
            PartialIndexer,
            fn_constructor_args=(cfg3, offsets),
            batch_format="pyarrow",
            batch_size=cfg.index_batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )

        def write_segment_bucket(group: pa.Table) -> pa.Table:
            return segment_writer(group)

        seg_summaries = (
            partials.groupby("term_bucket")
            .map_groups(write_segment_bucket, batch_format="pyarrow")
            .take_all()
        )
    t_stage3 = time.perf_counter()
    n_terms = sum(r["n_terms"] for r in seg_summaries)
    n_postings = sum(r["n_postings"] for r in seg_summaries)

    # ---- stage 4: atomic manifest (the commit point) ----
    if cfg.shuffle == "disk":
        import shutil

        shutil.rmtree(exroot, ignore_errors=True)
    manifest = {
        "version": MANIFEST_VERSION,
        "config": cfg_dict,
        "input_shards": input_shards,
        "n_docs": n_docs,
        "n_input_rows": n_input,
        "n_dups_removed": n_dups,
        "total_len": int(total_len),
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "doc_offsets": offsets,
        "doc_counts": counts.tolist(),
        "n_terms": n_terms,
        "n_postings": n_postings,
        "timings": {
            "stage1_dedup_docstore_sec": round(t_stage1 - t_start, 3),
            "stage3_index_merge_sec": round(t_stage3 - t_stage1, 3),
            **(
                {
                    "stage1_map_sec": round(t_s1_map - t_start, 3),
                    "stage1_reduce_sec": round(t_stage1 - t_s1_map, 3),
                    "stage3_map_sec": round(t_s3_map - t_stage1, 3),
                    "stage3_merge_sec": round(t_stage3 - t_s3_map, 3),
                    "stage3_encode_sec": round(t_s3_enc - t_s3_map, 3),
                    "stage3_assemble_sec": round(t_stage3 - t_s3_enc, 3),
                }
                if cfg.shuffle == "disk"
                else {}
            ),
        },
    }
    atomic_write_json(manifest_path, manifest)
    return manifest


def reindex(
    index_dir: str, out_dir: str, cfg: BuildConfig | None = None
) -> dict:
    """Rebuild an index from its own docstore under a (possibly different)
    analyzer/config — the reindex-after-schema-change maintenance op (the
    reference's answer to an analyzer change is a full re-crawl + re-post
    via parseJSON.pl; here the stored fields ARE the source of truth, like
    Solr with stored="true"). The docstore parquet is column-compatible
    with corpus input (stage 1 reads only [repo, path, commit, lang,
    content] and re-derives sha/ids/norms), so a reindex with the same
    config is byte-identical to the original build and a profile change is
    rank-identical to building the new profile from the raw corpus — both
    tested (tests/test_incremental.py)."""
    src = os.path.join(index_dir, "docstore")
    files = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"no docstore parquet under {src}")
    return build_index(files, out_dir, cfg)


def extend_index(
    input_path: str | list[str],
    index_dir: str,
) -> dict:
    """Merge a new input shard into an EXISTING index — the reference's
    continuous uniqueKey-upsert maintenance (schema.xml:1030-1033; the Perl
    indexer posts add-or-replace batches forever, parseJSON.pl:143-181) —
    without a full rebuild:

      * requires id_mode="strided" (docID = doc_bucket << capacity + local
        rank), so untouched doc buckets keep their ids;
      * stage 1: new rows spill by doc bucket; each TOUCHED bucket re-dedups
        (existing survivors ∪ new rows — associative, so incremental == full
        rebuild) and rewrites its docstore file; untouched files unchanged;
      * stage 3: partials regenerate for touched buckets only; each segment
        reassembles from (old rows of untouched doc ranges) + (re-encoded
        rows of touched ranges) — encode cost scales with the TOUCHED
        BUCKETS (sha-uniform shards touch min(|shard|, num_doc_buckets)
        buckets, so a shard much larger than the bucket count re-encodes
        everything; the raw-input ingest of the base corpus is still always
        skipped);
      * byte-identical to a full strided rebuild over the union input
        (tested); the manifest is the atomic commit. Precondition: the
        rebuild must use the same resolved range_bits — extend inherits the
        base index's value, while a fresh adaptive build resolves from the
        UNION's n_docs (pin cfg.range_bits explicitly when the corpus growth
        would cross a resolution boundary and byte-level comparison
        matters; query results are identical either way).

    Scale guidance: size num_doc_buckets well above the expected update
    shard (at 100 TB, 2^16 buckets make a 1k-doc hotfix touch <=1.5% of the
    index). Byte-identity with a rebuild is a STRONGER contract than
    Lucene's append-a-segment upsert — the cost is touched-bucket re-encode
    instead of background segment merges. With the default single-file
    layout, segment FILES are rewritten whole (I/O proportional to index
    size, encode only to touched ranges); build with
    segment_range_groups > 1 to shard each term bucket's segment by
    doc-range group, so extend/delete rewrite ONLY the group files holding
    touched doc buckets and file I/O localizes to the update too (each
    group file stays byte-identical to a full rebuild's — tested).
    """
    import shutil
    import time

    import ray
    import ray.data
    import pyarrow.parquet as pqt

    manifest_path = os.path.join(index_dir, "manifest.json")
    with open(manifest_path) as f:
        old = json.load(f)
    cfgd = {k: v for k, v in old["config"].items() if k != "record_hook"}
    # manifests written before the codec knob existed are varint-encoded;
    # pin that so untouched buckets and re-encoded buckets stay one codec
    cfgd.setdefault("postings_codec", "varint")
    cfg = BuildConfig(**cfgd)  # range_bits already resolved to an int
    if cfg.id_mode != "strided":
        raise ValueError(
            "extend_index requires id_mode='strided' (dense ids shift on "
            "insert; build with BuildConfig(id_mode='strided'))"
        )
    t_start = time.perf_counter()
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    if isinstance(input_path, str) and os.path.isdir(input_path):
        new_shards = sorted(os.listdir(input_path))
    else:
        new_shards = (
            [input_path] if isinstance(input_path, str) else list(input_path)
        )
    token = hashlib.sha256(
        json.dumps(
            {
                "extend": new_shards,
                "base": old["input_shards"],
                "index_dir": os.path.abspath(index_dir),
            },
            sort_keys=True,
        ).encode()
    ).hexdigest()[:16]
    exroot = os.path.join(cfg.exchange_root or index_dir, f"exchange-{token}")

    # ---- stage 1: spill new rows by doc bucket ----
    docparts_dir = os.path.join(exroot, "docparts")
    if not os.path.isdir(docparts_dir):
        tmp_dir = docparts_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        spiller = _make_doc_spiller(cfg, tmp_dir)
        in_cols = ["repo", "path", "commit", "lang", "content"]

        def read_and_spill(spec: pa.Table) -> pa.Table:
            outs = []
            for path, rg in zip(spec["path"].to_pylist(), spec["rg"].to_pylist()):
                tbl = _read_input_fragment(path, rg, in_cols)
                outs.append(spiller(tbl))
            return pa.concat_tables(outs)

        _fragment_dataset(_list_fragments(input_path)).map_batches(
            read_and_spill, batch_format="pyarrow", batch_size=1, num_cpus=1
        ).count()
        os.replace(tmp_dir, docparts_dir)
    touched = sorted(
        int(n[len("bucket="):])
        for n in os.listdir(docparts_dir)
        if n.startswith("bucket=")
    )
    touched_set = set(touched)

    base_cols = [
        "repo", "path", "commit", "lang", "content", "content_sha256",
        "doc_bucket", "doc_len", "norm_byte",
    ]
    if cfg.store_token_vectors:
        base_cols += ["tokens", "tok_pos"]
    bucket_writer = BucketWriter(index_dir, cfg, force=True)

    def extend_bucket(batch: pa.Table) -> pa.Table:
        outs = []
        for b in batch["doc_bucket"].to_pylist():
            b = int(b)
            bdir = os.path.join(docparts_dir, f"bucket={b:05d}")
            new_tbl = pqt.read_table(bdir)
            parts = [new_tbl.select(base_cols)]
            old_path = os.path.join(
                index_dir, "docstore", f"bucket={b:05d}.parquet"
            )
            if os.path.exists(old_path):
                # old survivors also carry their accumulated multiValued
                # lists; new raw rows get null there (promote) and
                # contribute their scalar value instead (BucketWriter)
                old_cols = base_cols + [
                    f + "_all" for f in cfg.multivalue_fields
                ]
                parts.append(pqt.read_table(old_path).select(old_cols))
            group = pa.concat_tables(
                parts, promote_options="default"
            ).combine_chunks()
            s = bucket_writer(group)
            s = s.append_column(
                "n_new_rows", pa.array([new_tbl.num_rows], pa.int64())
            )
            outs.append(s)
        return pa.concat_tables(outs)

    ext_summaries = (
        ray.data.from_arrow(
            pa.table({"doc_bucket": pa.array(touched, pa.int32())})
        )
        .repartition(max(len(touched), 1))
        .map_batches(extend_bucket, batch_format="pyarrow", batch_size=1,
                     num_cpus=1)
        .take_all()
    ) if touched else []
    t_stage1 = time.perf_counter()

    # ---- stage 2: recompute counts / totals ----
    counts = np.asarray(old["doc_counts"], dtype=np.int64).copy()
    # per-bucket total_len: untouched from the docstore ledger records
    lens = {
        r["partition_id"]: int(r["total_len"])
        for r in Ledger(index_dir, "docstore").records()
    }
    n_new_input = 0
    for row in ext_summaries:
        counts[row["doc_bucket"]] = row["n_docs"]
        lens[int(row["doc_bucket"])] = int(row["total_len"])
        n_new_input += int(row["n_new_rows"])
    total_len = sum(lens.values())
    n_docs = int(counts.sum())
    offsets = [b << cfg.bucket_capacity_bits for b in range(cfg.num_doc_buckets)]

    # ---- stage 3: partials for touched buckets; reassemble segments ----
    touched_paths = [
        os.path.join(index_dir, "docstore", f"bucket={b:05d}.parquet")
        for b in touched
        if os.path.exists(
            os.path.join(index_dir, "docstore", f"bucket={b:05d}.parquet")
        )
    ]
    partials_dir = os.path.join(exroot, "partials")
    if not os.path.isdir(partials_dir) and touched_paths:
        tmp_dir = partials_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        if cfg.store_token_vectors:
            cols = ["doc_bucket", "local_rank", "norm_byte", "tokens", "tok_pos"]
        else:
            cols = ["doc_bucket", "local_rank", "norm_byte", "content"]
            if cfg.profile == "auto":
                cols.append("lang")
        _run_partial_indexing(touched_paths, cols, cfg, offsets, tmp_dir)
        os.replace(tmp_dir, partials_dir)

    segment_writer = SegmentWriter(index_dir, cfg)
    pieces_dir = os.path.join(exroot, "segpieces")
    os.makedirs(pieces_dir, exist_ok=True)
    group_names = sorted(
        n for n in (os.listdir(partials_dir) if os.path.isdir(partials_dir) else [])
        if n.startswith("bucket=")
    )

    def merge_group(batch: pa.Table) -> pa.Table:
        for name in batch["name"].to_pylist():
            segment_writer.merge_dir_to_piece(partials_dir, name, pieces_dir)
        return pa.table({"n": pa.array([len(batch)], pa.int64())})

    if group_names:
        ray.data.from_arrow(
            pa.table({"name": pa.array(group_names)})
        ).repartition(len(group_names)).map_batches(
            merge_group, batch_format="pyarrow", batch_size=1, num_cpus=1
        ).count()

    # retained old rows = ranges of UNTOUCHED doc buckets
    shift = np.int64(cfg.bucket_capacity_bits - cfg.range_bits)
    touched_arr = np.fromiter(
        touched_set, dtype=np.int64, count=len(touched_set)
    )

    def assemble_ext(batch: pa.Table) -> pa.Table:
        outs = []
        for tb in batch["term_bucket"].to_pylist():
            tb = int(tb)
            if cfg.segment_range_groups > 1:
                # sharded layout: rewrite only touched range groups
                s = segment_writer.assemble_maintenance(
                    tb, pieces_dir, touched_arr
                )
                if s is not None:
                    outs.append(s)
                continue
            seg_path = os.path.join(
                index_dir, "segments", f"bucket={tb:05d}.parquet"
            )
            extra = None
            if os.path.exists(seg_path):
                old_seg = pqt.read_table(seg_path)
                rb = np.asarray(old_seg["range_bucket"], dtype=np.int64)
                keep = ~np.isin(rb >> shift, touched_arr)
                extra = old_seg.filter(pa.array(keep))
            s = segment_writer.assemble(tb, pieces_dir, extra_rows=extra,
                                        force=True)
            if s is not None:
                outs.append(s)
        return (
            pa.concat_tables(outs)
            if outs
            else segment_writer._summary_table(
                {"partition_id": -1, "n_terms": 0, "n_rows": 0, "n_postings": 0}
            ).slice(0, 0)
        )

    seg_summaries = (
        ray.data.from_arrow(
            pa.table(
                {"term_bucket": pa.array(range(cfg.num_term_buckets), pa.int32())}
            )
        )
        .repartition(cfg.num_term_buckets)
        .map_batches(assemble_ext, batch_format="pyarrow", batch_size=1,
                     num_cpus=1)
        .take_all()
    )
    t_stage3 = time.perf_counter()
    n_terms = sum(r["n_terms"] for r in seg_summaries)
    n_postings = sum(r["n_postings"] for r in seg_summaries)

    shutil.rmtree(exroot, ignore_errors=True)
    n_input = int(old["n_input_rows"]) + n_new_input
    manifest = {
        "version": MANIFEST_VERSION,
        "config": {**cfgd, "record_hook": None},
        "input_shards": list(old["input_shards"]) + new_shards,
        "n_docs": n_docs,
        "n_input_rows": n_input,
        "n_dups_removed": n_input - n_docs,
        "total_len": int(total_len),
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "doc_offsets": offsets,
        "doc_counts": counts.tolist(),
        "n_terms": n_terms,
        "n_postings": n_postings,
        "timings": {
            "stage1_dedup_docstore_sec": round(t_stage1 - t_start, 3),
            "stage3_index_merge_sec": round(t_stage3 - t_stage1, 3),
        },
    }
    atomic_write_json(manifest_path, manifest)
    return manifest


def delete_docs(index_dir: str, shas: list[str]) -> dict:
    """Remove documents by uniqueKey (content sha256) from an EXISTING
    strided index — the takedown / contaminated-data-removal maintenance a
    training-data pipeline needs (the reference only ever upserts,
    parseJSON.pl:143-181; Solr's equivalent is deleteByQuery + commit).

    Same touched-bucket discipline as `extend_index`: only the sha-range doc
    buckets holding deleted ids re-rank/re-encode; untouched docstore files
    and segment ranges are carried over verbatim. Byte-identical to a full
    strided rebuild over (corpus minus deleted docs) with the same resolved
    range_bits (tested). The manifest is the atomic commit; a bucket whose
    docs all vanish drops its docstore file and its segment ranges.
    """
    import shutil
    import time

    import ray
    import ray.data
    import pyarrow.parquet as pqt

    manifest_path = os.path.join(index_dir, "manifest.json")
    with open(manifest_path) as f:
        old = json.load(f)
    cfgd = {k: v for k, v in old["config"].items() if k != "record_hook"}
    cfgd.setdefault("postings_codec", "varint")  # pre-knob manifests are varint
    cfg = BuildConfig(**cfgd)
    if cfg.id_mode != "strided":
        raise ValueError(
            "delete_docs requires id_mode='strided' (dense ids shift on "
            "delete; build with BuildConfig(id_mode='strided'))"
        )
    t_start = time.perf_counter()
    shas = sorted(set(shas))
    nb = cfg.num_doc_buckets
    by_bucket: dict[int, list[str]] = {}
    for s in shas:
        by_bucket.setdefault((int(s[:8], 16) * nb) >> 32, []).append(s)
    touched = sorted(
        b for b in by_bucket
        if os.path.exists(
            os.path.join(index_dir, "docstore", f"bucket={b:05d}.parquet")
        )
    )
    touched_set = set(touched)
    token = hashlib.sha256(
        json.dumps(
            {"delete": shas, "index_dir": os.path.abspath(index_dir)},
            sort_keys=True,
        ).encode()
    ).hexdigest()[:16]
    exroot = os.path.join(cfg.exchange_root or index_dir, f"exchange-{token}")

    base_cols = [
        "repo", "path", "commit", "lang", "content", "content_sha256",
        "doc_bucket", "doc_len", "norm_byte",
    ]
    if cfg.store_token_vectors:
        base_cols += ["tokens", "tok_pos"]
    bucket_writer = BucketWriter(index_dir, cfg, force=True)
    ledger = Ledger(index_dir, "docstore")

    def delete_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        outs = []
        for b in batch["doc_bucket"].to_pylist():
            b = int(b)
            path = os.path.join(
                index_dir, "docstore", f"bucket={b:05d}.parquet"
            )
            cols = base_cols + [f + "_all" for f in cfg.multivalue_fields]
            tbl = pqt.read_table(path).select(cols)
            drop = pa.array(sorted(by_bucket[b]))
            keep = pc.invert(
                pc.is_in(tbl["content_sha256"], value_set=drop)
            )
            n_del = tbl.num_rows - int(
                pc.sum(pc.cast(keep, pa.int64())).as_py() or 0
            )
            survivors = tbl.filter(keep)
            if survivors.num_rows == 0:
                os.remove(path)
                ledger.remove(b)
                s = BucketWriter(index_dir, cfg)._summary_table(
                    {"partition_id": b, "n_docs": 0, "total_len": 0,
                     "n_input_rows": 0, "n_dups_removed": 0}
                )
            else:
                s = bucket_writer(survivors.combine_chunks())
            s = s.append_column(
                "n_deleted", pa.array([n_del], pa.int64())
            )
            outs.append(s)
        return pa.concat_tables(outs)

    del_summaries = (
        ray.data.from_arrow(
            pa.table({"doc_bucket": pa.array(touched, pa.int32())})
        )
        .repartition(max(len(touched), 1))
        .map_batches(delete_bucket, batch_format="pyarrow", batch_size=1,
                     num_cpus=1)
        .take_all()
    ) if touched else []
    t_stage1 = time.perf_counter()

    counts = np.asarray(old["doc_counts"], dtype=np.int64).copy()
    lens = {
        r["partition_id"]: int(r["total_len"]) for r in ledger.records()
    }
    n_deleted = 0
    for row in del_summaries:
        counts[row["doc_bucket"]] = row["n_docs"]
        lens[int(row["doc_bucket"])] = int(row["total_len"])
        n_deleted += int(row["n_deleted"])
    for b in touched:
        if counts[b] == 0:
            lens.pop(b, None)
    total_len = sum(lens.values())
    n_docs = int(counts.sum())
    offsets = [b << cfg.bucket_capacity_bits for b in range(cfg.num_doc_buckets)]

    touched_paths = [
        os.path.join(index_dir, "docstore", f"bucket={b:05d}.parquet")
        for b in touched
        if os.path.exists(
            os.path.join(index_dir, "docstore", f"bucket={b:05d}.parquet")
        )
    ]
    partials_dir = os.path.join(exroot, "partials")
    if not os.path.isdir(partials_dir) and touched_paths:
        tmp_dir = partials_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        if cfg.store_token_vectors:
            cols = ["doc_bucket", "local_rank", "norm_byte", "tokens", "tok_pos"]
        else:
            cols = ["doc_bucket", "local_rank", "norm_byte", "content"]
            if cfg.profile == "auto":
                cols.append("lang")
        _run_partial_indexing(touched_paths, cols, cfg, offsets, tmp_dir)
        os.replace(tmp_dir, partials_dir)

    segment_writer = SegmentWriter(index_dir, cfg)
    pieces_dir = os.path.join(exroot, "segpieces")
    os.makedirs(pieces_dir, exist_ok=True)
    group_names = sorted(
        n for n in (os.listdir(partials_dir) if os.path.isdir(partials_dir) else [])
        if n.startswith("bucket=")
    )

    def merge_group(batch: pa.Table) -> pa.Table:
        for name in batch["name"].to_pylist():
            segment_writer.merge_dir_to_piece(partials_dir, name, pieces_dir)
        return pa.table({"n": pa.array([len(batch)], pa.int64())})

    if group_names:
        ray.data.from_arrow(
            pa.table({"name": pa.array(group_names)})
        ).repartition(len(group_names)).map_batches(
            merge_group, batch_format="pyarrow", batch_size=1, num_cpus=1
        ).count()

    shift = np.int64(cfg.bucket_capacity_bits - cfg.range_bits)
    touched_arr = np.fromiter(
        touched_set, dtype=np.int64, count=len(touched_set)
    )

    def assemble_del(batch: pa.Table) -> pa.Table:
        outs = []
        for tb in batch["term_bucket"].to_pylist():
            tb = int(tb)
            if cfg.segment_range_groups > 1:
                s = segment_writer.assemble_maintenance(
                    tb, pieces_dir, touched_arr
                )
                if s is not None:
                    outs.append(s)
                continue
            seg_path = os.path.join(
                index_dir, "segments", f"bucket={tb:05d}.parquet"
            )
            extra = None
            if os.path.exists(seg_path):
                old_seg = pqt.read_table(seg_path)
                rb = np.asarray(old_seg["range_bucket"], dtype=np.int64)
                keep = ~np.isin(rb >> shift, touched_arr)
                extra = old_seg.filter(pa.array(keep))
            s = segment_writer.assemble(tb, pieces_dir, extra_rows=extra,
                                        force=True)
            if s is not None:
                outs.append(s)
        return (
            pa.concat_tables(outs)
            if outs
            else segment_writer._summary_table(
                {"partition_id": -1, "n_terms": 0, "n_rows": 0, "n_postings": 0}
            ).slice(0, 0)
        )

    seg_summaries = (
        ray.data.from_arrow(
            pa.table(
                {"term_bucket": pa.array(range(cfg.num_term_buckets), pa.int32())}
            )
        )
        .repartition(cfg.num_term_buckets)
        .map_batches(assemble_del, batch_format="pyarrow", batch_size=1,
                     num_cpus=1)
        .take_all()
    )
    t_stage3 = time.perf_counter()
    n_terms = sum(r["n_terms"] for r in seg_summaries)
    n_postings = sum(r["n_postings"] for r in seg_summaries)

    shutil.rmtree(exroot, ignore_errors=True)
    n_input = int(old["n_input_rows"])
    manifest = {
        "version": MANIFEST_VERSION,
        "config": {**cfgd, "record_hook": None},
        "input_shards": list(old["input_shards"]),
        "n_docs": n_docs,
        "n_input_rows": n_input,
        "n_dups_removed": n_input - n_docs,
        "n_deleted": int(old.get("n_deleted", 0)) + n_deleted,
        "total_len": int(total_len),
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "doc_offsets": offsets,
        "doc_counts": counts.tolist(),
        "n_terms": n_terms,
        "n_postings": n_postings,
        "timings": {
            "stage1_dedup_docstore_sec": round(t_stage1 - t_start, 3),
            "stage3_index_merge_sec": round(t_stage3 - t_stage1, 3),
        },
    }
    atomic_write_json(manifest_path, manifest)
    return manifest


def delete_by_query(index_dir: str, query: str, lang: str | None = None,
                    filters: dict | None = None) -> dict:
    """Solr deleteByQuery analog: resolve the query's matching docs through
    the standard match path (terms / phrase / prefix / wildcard / fuzzy /
    boolean, fq-composable), collect their uniqueKeys, and delete them via
    `delete_docs` (touched-bucket rewrite, atomic manifest commit)."""
    from .query import IndexReader

    r = IndexReader(index_dir)
    docs = r._matching_docs(query, lang=lang, filters=filters)
    if docs.size == 0:
        with open(os.path.join(index_dir, "manifest.json")) as f:
            return json.load(f)
    shas = r.doc_fields(
        docs.tolist(), columns=["content_sha256"]
    )["content_sha256"].to_pylist()
    return delete_docs(index_dir, shas)
