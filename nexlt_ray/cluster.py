"""Doc-partitioned distributed search over per-shard indexes — the
SolrCloud analog for this engine.

The reference runs one Solr core (solr/NeXLT/solr/collection1/conf/
solrconfig.xml) whose scale path in the Solr ecosystem is SolrCloud:
hash-route documents on the uniqueKey into shards, fan each query out to
every shard, and merge. The reference's uniqueKey is the content hash
(schema.xml:1030-1033), which is exactly what this module routes on.

Design (all public Solr/Lucene semantics, re-expressed for Ray):

* **Router** — range partition of the 32-bit sha prefix, the SAME function
  the monolithic build uses for doc buckets (build._sha_and_bucket). Two
  consequences: (a) duplicate contents land in one shard, so per-shard
  dedup IS global dedup; (b) shard order is sha order, so the monolithic
  dense docID (= global sha rank) equals `doc_base[shard] + local docID` —
  the cluster serves the SAME doc ids as a monolithic index over the union
  corpus (Lucene's MultiReader docBase discipline).
* **Exact distributed scoring** — Solr's ExactStatsCache two-phase query:
  phase 1 collects each shard's local df per scoring term plus corpus
  (N, total_len); the coordinator sums and pushes global stats
  (IndexReader.set_global_stats), so every shard scores with the SAME
  float32 (idf, k-table) a monolithic index would use. Phase 2 runs the
  normal per-shard top-k; the merge is (score desc, global doc id asc) —
  bit-identical results to the monolith, by test (tests/test_cluster.py).
  Stats pushes are memoized per (query, lang): repeat queries skip phase 1
  entirely (df cannot drift between commits — NRT deletes keep df/N like
  Lucene liveDocs), keeping per-shard queryResultCaches hot.
* **Counts/facets merge by sum** — numFound adds; facet counts add per
  value (shards return full value lists, so the merge is EXACT — no
  Solr-style refinement pass needed; facet fields are low-cardinality
  metadata by the same assumption the reader's facets() makes).
* **Suggest/spellcheck merge on (term, summed df)** — shards return their
  full prefix slice (bounded by prefix selectivity, the same artifact the
  monolithic reader scans), so distributed top-n is exact, not the
  per-shard-top-n approximation.
* **RealTimeGet / deletes route by sha** — only the owning shard is
  touched. Deletes are NRT tombstones (IndexReader.set_deleted): masked
  from every match/filter path immediately, expunged from df/N only by
  index maintenance (build.delete_docs), exactly Lucene's liveDocs.

Scale notes (256-node / 100 TB): one ShardWorker actor per shard (pin with
`actor_options={"num_cpus": ...}`); coordinator work is O(shards · k) per
query — merge of top-k lists and tiny df dicts, never doc data. Shard
builds are full build_index() pipelines (each internally parallel and
resumable); the routing spill is the same storage-partitioned exchange the
monolithic build uses (fragment-direct reads, atomic dir publish, no
object-store all-to-all).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .build import BuildConfig, build_index, _list_fragments, _fragment_dataset
from .query import IndexReader

CLUSTER_MANIFEST = "cluster.json"


def shard_of_sha(sha_hex: str, num_shards: int) -> int:
    """compositeId-router analog: range partition of the uniform 32-bit sha
    prefix — the same function the docstore uses for doc buckets, so shard
    order == sha order == monolithic docID order."""
    return (int(sha_hex[:8], 16) * num_shards) >> 32


def _shard_dir(cluster_dir: str, s: int) -> str:
    return os.path.join(cluster_dir, f"shard={s:03d}")


def _route_input(
    input_path: str | list[str],
    dest_dir: str,
    num_shards: int,
    hook=None,
) -> None:
    """Routing spill: partition the input into per-shard parquet staging by
    sha-range (the compositeId exchange). Storage-direct fragment tasks
    (one read per row group, no object-store all-to-all); the whole dest
    dir publishes atomically (tmp + rename), so a crashed run restarts
    clean and a finished run is never re-spilled. Task retries rewrite the
    same deterministic per-fragment filenames."""
    if os.path.isdir(dest_dir):
        return
    tmp = dest_dir + ".tmp"
    if os.path.isdir(tmp):
        import shutil

        shutil.rmtree(tmp)
    for s in range(num_shards):
        os.makedirs(os.path.join(tmp, f"shard={s:03d}"), exist_ok=True)
    nsh = num_shards

    def route_and_spill(spec: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq

        n_out = 0
        for path, rg in zip(spec["path"].to_pylist(), spec["rg"].to_pylist()):
            tbl = _pq.ParquetFile(path).read_row_group(int(rg))
            if hook is not None:
                tbl = hook(tbl)
            # rows build_index would drop (null identity fields) are
            # dropped here too — they have no routable identity
            valid = _pc.is_valid(tbl["content"])
            for col in ("repo", "path", "commit"):
                if col in tbl.column_names:
                    valid = _pc.and_(valid, _pc.is_valid(tbl[col]))
            tbl = tbl.filter(valid)
            pre = np.array(
                [
                    int(hashlib.sha256(c.encode("utf-8")).hexdigest()[:8], 16)
                    for c in tbl["content"].to_pylist()
                ],
                dtype=np.int64,
            )
            shards = (pre * nsh) >> 32
            token = hashlib.sha256(f"{path}:{int(rg)}".encode()).hexdigest()[
                :16
            ]
            for s in np.unique(shards).tolist():
                part = tbl.filter(pa.array(shards == s))
                _pq.write_table(
                    part,
                    os.path.join(
                        tmp, f"shard={int(s):03d}", f"{token}.parquet"
                    ),
                    compression="zstd",
                )
                n_out += part.num_rows
        return pa.table({"n": pa.array([n_out], pa.int64())})

    _fragment_dataset(_list_fragments(input_path)).map_batches(
        route_and_spill, batch_format="pyarrow", batch_size=1, num_cpus=1
    ).count()
    os.rename(tmp, dest_dir)


def _write_cluster_manifest(
    cluster_dir: str, num_shards: int, id_mode: str
) -> dict:
    """(Re)derive cluster.json from the per-shard manifests — the atomic
    cluster-level commit point (per-shard manifests are each shard's own)."""
    n_docs, total_len = [], []
    for s in range(num_shards):
        with open(os.path.join(_shard_dir(cluster_dir, s), "manifest.json")) as f:
            m = json.load(f)
        n_docs.append(int(m["n_docs"]))
        total_len.append(int(m["total_len"]))
    manifest = {
        "num_shards": num_shards,
        "router": "sha32-range",
        "id_mode": id_mode,
        "shards": [f"shard={s:03d}" for s in range(num_shards)],
        "n_docs": n_docs,
        "total_len": total_len,
    }
    man_path = os.path.join(cluster_dir, CLUSTER_MANIFEST)
    tmp_man = man_path + ".tmp"
    with open(tmp_man, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_man, man_path)
    return manifest


def build_sharded_index(
    input_path: str | list[str],
    cluster_dir: str,
    num_shards: int,
    cfg: BuildConfig | None = None,
) -> dict:
    """Route the corpus into `num_shards` sha-range shards and build one
    index per shard. Returns the cluster manifest. Resumable end to end:
    the routing spill publishes atomically (tmp dir + rename), and each
    shard build is build_index() with its own ledger.

    If `cfg.record_hook` is set it runs HERE (it defines document identity,
    so the router must hash hooked content) and is stripped from the
    per-shard config — shard builds index the already-hooked rows.

    Shards build serially: each build_index() saturates the whole Ray
    cluster internally. On a real multi-tenant cluster, run them as
    concurrent jobs over resource subsets instead; results are identical
    (every stage is deterministic in its inputs)."""
    import ray  # noqa: F401  (build_index needs an initialised Ray)

    cfg = cfg or BuildConfig()
    os.makedirs(cluster_dir, exist_ok=True)
    man_path = os.path.join(cluster_dir, CLUSTER_MANIFEST)
    if os.path.exists(man_path):
        with open(man_path) as f:
            return json.load(f)

    routed = os.path.join(cluster_dir, "routed")
    _route_input(input_path, routed, num_shards, cfg.record_hook)

    shard_cfg = cfg
    if cfg.record_hook is not None:
        from dataclasses import replace

        shard_cfg = replace(cfg, record_hook=None)
    for s in range(num_shards):
        build_index(
            os.path.join(routed, f"shard={s:03d}"),
            _shard_dir(cluster_dir, s),
            shard_cfg,
        )
    return _write_cluster_manifest(cluster_dir, num_shards, cfg.id_mode)


def extend_sharded_index(
    input_path: str | list[str],
    cluster_dir: str,
    record_hook=None,
) -> dict:
    """Merge a new input shard into an EXISTING cluster — the distributed
    form of build.extend_index (continuous uniqueKey upsert). New rows
    route by the SAME sha-range function that placed the base corpus, so
    upserts land on the shard holding their uniqueKey; each touched shard
    then runs its own incremental extend (touched-doc-bucket re-dedup +
    re-encode; byte-identical to a per-shard rebuild over the union, by
    build.extend_index's own contract). Shards that receive no rows are
    untouched. Requires the cluster's shards to be id_mode='strided'
    (extend_index's precondition). Returns the updated cluster manifest —
    the atomic commit; call DistributedSearcher.refresh() to serve it."""
    from .build import extend_index

    with open(os.path.join(cluster_dir, CLUSTER_MANIFEST)) as f:
        manifest = json.load(f)
    num_shards = int(manifest["num_shards"])
    token = hashlib.sha256(
        json.dumps(
            {"extend": input_path, "cluster": os.path.abspath(cluster_dir)},
            sort_keys=True,
            default=str,
        ).encode()
    ).hexdigest()[:16]
    routed = os.path.join(cluster_dir, f"routed_ext_{token}")
    _route_input(input_path, routed, num_shards, record_hook)
    for s in range(num_shards):
        shard_in = os.path.join(routed, f"shard={s:03d}")
        if not any(f.endswith(".parquet") for f in os.listdir(shard_in)):
            continue  # no upserts routed here — shard untouched
        extend_index(shard_in, _shard_dir(cluster_dir, s))
    return _write_cluster_manifest(
        cluster_dir, num_shards, manifest.get("id_mode", "dense")
    )


def reshard_cluster(
    src_cluster_dir: str,
    dst_cluster_dir: str,
    new_num_shards: int,
    cfg: BuildConfig | None = None,
) -> dict:
    """Change a cluster's shard count — the SolrCloud SPLITSHARD /
    collection-reshape analog. The source shards' docstores are the input
    (stored fields are the source of truth, build.reindex's discipline
    applied cluster-wide): every row re-routes by the same sha-range
    function, so the result is IDENTICAL — byte-for-byte per shard — to
    building the new shard count from the original corpus (tested). The
    source cluster stays untouched and servable throughout; cut over by
    opening a DistributedSearcher on the destination. By default the
    destination inherits the source's build config with `range_bits`
    re-resolved adaptively for the new shard sizes (exactly what a fresh
    build would pick). NRT tombstones are replica state, not files — make
    deletes permanent first (delete_docs_sharded) if they must survive the
    reshard."""
    with open(os.path.join(src_cluster_dir, CLUSTER_MANIFEST)) as f:
        src = json.load(f)
    files = []
    for s in range(int(src["num_shards"])):
        d = os.path.join(_shard_dir(src_cluster_dir, s), "docstore")
        files.extend(
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        )
    if not files:
        raise ValueError(f"no docstore parquet under {src_cluster_dir}")
    if cfg is None:
        with open(
            os.path.join(_shard_dir(src_cluster_dir, 0), "manifest.json")
        ) as f:
            cfgd = {
                k: v
                for k, v in json.load(f)["config"].items()
                if k != "record_hook"
            }
        cfgd.setdefault("postings_codec", "varint")  # pre-knob manifests
        cfgd["range_bits"] = None  # re-resolve for the new shard sizes
        for k in ("protected_words", "multivalue_fields"):
            if k in cfgd and cfgd[k] is not None:
                cfgd[k] = tuple(cfgd[k])
        cfg = BuildConfig(**cfgd)
    return build_sharded_index(files, dst_cluster_dir, new_num_shards, cfg)


def delete_docs_sharded(cluster_dir: str, shas: list[str]) -> dict:
    """Expunge docs by uniqueKey from the index files themselves — the
    distributed form of build.delete_docs (the merge that makes NRT
    tombstones permanent: df/N shrink, segments rewrite). Routed to owning
    shards only. Returns the updated cluster manifest."""
    from .build import delete_docs

    with open(os.path.join(cluster_dir, CLUSTER_MANIFEST)) as f:
        manifest = json.load(f)
    num_shards = int(manifest["num_shards"])
    by: dict[int, list[str]] = {}
    for s in shas:
        by.setdefault(shard_of_sha(s, num_shards), []).append(s)
    for s, part in sorted(by.items()):
        delete_docs(_shard_dir(cluster_dir, s), part)
    return _write_cluster_manifest(
        cluster_dir, num_shards, manifest.get("id_mode", "dense")
    )


def check_cluster(
    cluster_dir: str, *, verify_shas: bool = True, deep: bool = False
) -> dict:
    """Cluster-level CheckIndex (check.check_index per shard, plus the
    invariants no single shard can see):

      * per-shard integrity — the full structural / decoded-postings /
        block-max / sha check runs inside every shard (distributed, one
        Ray task per file);
      * router placement — EVERY doc's content sha must route to the
        shard holding it (a misplaced doc silently breaks global dedup,
        RealTimeGet and delete routing; checked storage-direct, one task
        per docstore file, only counters cross the wire);
      * manifest consistency — cluster.json's per-shard n_docs/total_len
        must equal the shard manifests' own.

    Returns {"ok", "errors", "stats"}."""
    import ray.data

    from .check import check_index

    errors: list[str] = []
    man_path = os.path.join(cluster_dir, CLUSTER_MANIFEST)
    if not os.path.exists(man_path):
        return {"ok": False, "errors": ["cluster.json missing"], "stats": {}}
    with open(man_path) as f:
        manifest = json.load(f)
    nsh = int(manifest["num_shards"])
    stats = {"num_shards": nsh, "n_docs": 0, "files_routed": 0}

    route_specs: list[tuple[str, int]] = []
    for s in range(nsh):
        sd = _shard_dir(cluster_dir, s)
        res = check_index(sd, verify_shas=verify_shas, deep=deep)
        errors.extend(f"shard {s}: {e}" for e in res["errors"])
        if res["stats"]:
            stats["n_docs"] += int(res["stats"].get("n_docs", 0))
        try:
            with open(os.path.join(sd, "manifest.json")) as f:
                m = json.load(f)
            for key in ("n_docs", "total_len"):
                if int(m[key]) != int(manifest[key][s]):
                    errors.append(
                        f"shard {s}: cluster.json {key}={manifest[key][s]} "
                        f"!= shard manifest {m[key]}"
                    )
        except FileNotFoundError:
            errors.append(f"shard {s}: manifest.json missing")
            continue
        ds_dir = os.path.join(sd, "docstore")
        if os.path.isdir(ds_dir):
            route_specs.extend(
                (os.path.join(ds_dir, f), s)
                for f in sorted(os.listdir(ds_dir))
                if f.endswith(".parquet")
            )

    if route_specs:
        spec_t = pa.table(
            {
                "path": pa.array([p for p, _ in route_specs], pa.string()),
                "shard": pa.array([s for _, s in route_specs], pa.int32()),
            }
        )

        def check_route(spec: pa.Table) -> pa.Table:
            import pyarrow.parquet as _pq

            bad, n, example = 0, 0, ""
            for path, s in zip(
                spec["path"].to_pylist(), spec["shard"].to_pylist()
            ):
                col = _pq.read_table(path, columns=["content_sha256"])[
                    "content_sha256"
                ].to_pylist()
                pre = np.array(
                    [int(x[:8], 16) for x in col], dtype=np.int64
                )
                owner = (pre * nsh) >> 32
                m = owner != int(s)
                if m.any() and not example:
                    example = (
                        f"{os.path.basename(path)}: sha {col[int(np.argmax(m))]}"
                        f" belongs to shard {int(owner[np.argmax(m)])}"
                    )
                bad += int(m.sum())
                n += len(col)
            return pa.table(
                {
                    "bad": pa.array([bad], pa.int64()),
                    "n": pa.array([n], pa.int64()),
                    "example": pa.array([example], pa.string()),
                }
            )

        parts = (
            ray.data.from_arrow(spec_t)
            .repartition(len(route_specs))
            .map_batches(
                check_route, batch_format="pyarrow", batch_size=1, num_cpus=1
            )
            .take_all()
        )
        bad = sum(int(r["bad"]) for r in parts)
        stats["files_routed"] = len(route_specs)
        if bad:
            ex = next((r["example"] for r in parts if r["example"]), "")
            errors.append(
                f"router violation: {bad} doc(s) stored on the wrong shard"
                + (f" (first: {ex})" if ex else "")
            )
    return {"ok": not errors, "errors": errors, "stats": stats}


class ShardWorker:
    """One shard's serving state: an IndexReader plus the global docID
    base. Runs as a Ray actor in DistributedSearcher (instantiable inline
    for single-process debugging — it is a plain class).

    All doc ids crossing the actor boundary are GLOBAL (doc_base + local):
    the coordinator never sees shard-local ids, so its merge logic is
    exactly a monolithic reader's tie-break."""

    def __init__(self, shard_dir: str, doc_base: int, **reader_kwargs):
        self.reader = IndexReader(shard_dir, **reader_kwargs)
        self.doc_base = int(doc_base)
        self._deleted_shas: list[str] = []  # survives refresh re-resolution

    # ---- phase 1: stats ------------------------------------------------
    def shard_stats(self) -> dict:
        return {
            "n_docs": int(self.reader.n_docs_local),
            "total_len": int(self.reader.manifest["total_len"]),
        }

    def term_dfs(self, query: str, lang: str | None = None) -> dict:
        return self.reader.term_dfs(query, lang)

    def set_global_stats(
        self, n_docs: int, avgdl: float, df_by_term: dict
    ) -> None:
        self.reader.set_global_stats(n_docs, avgdl, df_by_term)

    def set_doc_base(self, doc_base: int) -> None:
        self.doc_base = int(doc_base)

    # ---- phase 2: query ------------------------------------------------
    def search(self, query: str, k: int = 10, **kw) -> list:
        return [
            (self.doc_base + d, s) for d, s in self.reader.search(query, k, **kw)
        ]

    def match_count(self, query: str, **kw) -> int:
        # the *:* fast path must count LOCAL docs (reader.n_docs is the
        # cluster-global N after set_global_stats)
        if IndexReader.parse(query)[0] == "all" and not kw.get("filters"):
            dead = (
                0
                if self.reader.deleted_docs is None
                else int(self.reader.deleted_docs.size)
            )
            return int(self.reader.n_docs_local) - dead
        return int(self.reader.match_count(query, **kw))

    def facets(self, query: str, fields: list[str], **kw) -> dict:
        return self.reader.facets(query, fields, **kw)

    def facet_pivot(self, query: str, fields: tuple, **kw) -> list:
        return self.reader.facet_pivot(query, fields, **kw)

    def prefix_term_rows(self, prefix: str) -> list:
        return self.reader._prefix_term_rows(prefix)

    def sorted_candidates(
        self,
        query: str,
        sort_fields: list[str],
        asc: list[bool],
        need: int,
        mode: str = "OR",
        lang: str | None = None,
        filters: dict | None = None,
        cursor: tuple | None = None,
    ):
        """Field-sort phase 1: this shard's top-`need` (global ids, key
        columns, local numFound). id_offset makes the cursor's doc-id
        tie-break compare in the global id space."""
        return self.reader.sorted_candidates(
            query, sort_fields, asc, need, mode, lang, filters, cursor,
            id_offset=self.doc_base,
        )

    def highlight_docs(
        self,
        query: str,
        global_ids: list[int],
        context: int = 2,
        lang: str | None = None,
    ) -> pa.Table:
        tbl = self.reader.highlight_for_docs(
            query,
            [int(g) - self.doc_base for g in global_ids],
            context=context,
            lang=lang,
        )
        return self._globalize(tbl)

    def mlt_source_terms(
        self, global_id: int, lang: str | None = None, min_tf: int = 2
    ) -> list:
        return self.reader.mlt_source_terms(
            int(global_id) - self.doc_base, lang=lang, min_tf=min_tf
        )

    def explain(
        self, query: str, global_id: int, lang: str | None = None
    ) -> list:
        """Per-term score breakdown in GLOBAL statistics (the df the
        coordinator pushed — identical to the monolith's explain)."""
        return self.reader.explain(
            query, int(global_id) - self.doc_base, lang=lang
        )

    def analyze(self, text: str, lang: str | None = None,
                query_time: bool = False) -> list:
        return self.reader.analyze(text, lang=lang, query_time=query_time)

    def raw_term_dfs(self, terms: list[str]) -> dict:
        """Local df for the GIVEN terms (MLT phase 1 — term selection
        needs cluster-global df before any query string exists)."""
        out: dict[str, int] = {}
        for t in terms:
            tp = self.reader.postings(t)
            if tp is not None:
                out[t] = int(getattr(tp, "df_local", tp.df))
        return out

    def search_analyzed(
        self,
        qterms: list[str],
        k: int,
        exclude_local: tuple = (),
        lang: str | None = None,
        filters: dict | None = None,
    ) -> list:
        return [
            (self.doc_base + d, s)
            for d, s in self.reader.search_analyzed_terms(
                qterms, k, exclude=exclude_local, lang=lang, filters=filters
            )
        ]

    def get(self, shas: list[str], columns: list[str] | None = None):
        tbl = self.reader.get(shas, columns)
        return self._globalize(tbl)

    def doc_fields(
        self, global_ids: list[int], columns: list[str] | None = None
    ):
        tbl = self.reader.doc_fields(
            [g - self.doc_base for g in global_ids], columns
        )
        return self._globalize(tbl)

    def _globalize(self, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or "doc_id" not in tbl.column_names:
            return tbl
        gid = pa.array(
            np.asarray(tbl["doc_id"], dtype=np.int64) + self.doc_base,
            pa.int64(),
        )
        return tbl.set_column(tbl.schema.get_field_index("doc_id"), "doc_id", gid)

    # ---- NRT deletes / commit ------------------------------------------
    def delete(self, shas: list[str]) -> int:
        """Tombstone docs by uniqueKey. Returns how many NEW docs died."""
        before = (
            0
            if self.reader.deleted_docs is None
            else int(self.reader.deleted_docs.size)
        )
        self._deleted_shas.extend(shas)
        self._apply_tombstones()
        after = (
            0
            if self.reader.deleted_docs is None
            else int(self.reader.deleted_docs.size)
        )
        return after - before

    def _apply_tombstones(self) -> None:
        if not self._deleted_shas:
            self.reader.set_deleted(None)
            return
        tbl = self.reader.get(
            self._deleted_shas, columns=["content_sha256"]
        )
        ids = (
            np.asarray(tbl["doc_id"], dtype=np.int64)
            if tbl.num_rows
            else np.empty(0, np.int64)
        )
        self.reader.set_deleted(ids)

    def deleted_count(self) -> int:
        return (
            0
            if self.reader.deleted_docs is None
            else int(self.reader.deleted_docs.size)
        )

    def refresh(self) -> dict:
        """Re-open at the current commit point; tombstones re-resolve from
        their shas (maintenance may have shifted local doc ids, or expunged
        the docs entirely). Returns fresh shard stats + reload flag."""
        reloaded = self.reader.refresh()
        if reloaded:
            self._apply_tombstones()
        return {"reloaded": bool(reloaded), **self.shard_stats()}


class DistributedSearcher:
    """Coordinator over a built shard cluster. Query surface mirrors
    IndexReader's; every result is bit-identical to a monolithic index over
    the union corpus (scores float32-exact via pushed global stats, doc ids
    via sha-range doc bases, tie-breaks via (score desc, doc_id asc) merge).

    Replication/HA (the SolrCloud replica analog): `replication_factor=R`
    spawns R ShardWorkers per shard. Fan-out reads rotate round-robin
    across replicas (load spreading); a dead replica (RayActorError) fails
    over to the next one and is respawned in place with its FULL serving
    state replayed — the coordinator keeps the replay log: the accumulated
    global-df map (every term ever pushed) and each shard's tombstoned
    uniqueKeys — so a restarted replica can never silently serve
    shard-local statistics or resurrect deleted docs. Writes that mutate
    replica state (stats pushes, NRT deletes, refresh) broadcast to ALL
    replicas of the target shard(s)."""

    def __init__(
        self,
        cluster_dir: str,
        actor_options: dict | None = None,
        replication_factor: int = 1,
        **reader_kwargs,
    ):
        self.cluster_dir = cluster_dir
        with open(os.path.join(cluster_dir, CLUSTER_MANIFEST)) as f:
            self.manifest = json.load(f)
        self.num_shards = int(self.manifest["num_shards"])
        self._actor_options = actor_options or {"num_cpus": 1}
        self._reader_kwargs = reader_kwargs
        self.id_mode = self.manifest.get("id_mode", "dense")
        shard_n = [int(x) for x in self.manifest["n_docs"]]
        self._doc_bases = self._bases(shard_n)
        # replay log for respawned replicas
        self._df_cache: dict[str, int] = {}
        self._deleted: list[list[str]] = [[] for _ in range(self.num_shards)]
        self._rr = 0  # round-robin cursor (advances once per fan-out)
        self._pool: list[list] = [
            [self._spawn(s) for _ in range(max(1, replication_factor))]
            for s in range(self.num_shards)
        ]
        self._refresh_globals(shard_n, [int(x) for x in self.manifest["total_len"]])
        # (query, lang) pairs whose global dfs are already pushed — repeat
        # queries skip phase 1 and hit warm per-shard result caches
        self._stats_pushed: set = set()
        # coordinator queryResultCache: repeat queries skip even the
        # phase-2 actor round trips (the distributed warm floor, ~3.4 ms
        # measured — BENCH/round4_cluster_overhead.json). Invalidated by
        # refresh() and delete(); bounded LRU like the reader's.
        from collections import OrderedDict

        self._result_cache: "OrderedDict[tuple, list]" = OrderedDict()
        self._result_cache_cap = 512

    # ---- replica pool ----------------------------------------------------
    def _spawn(self, s: int):
        import ray

        Worker = ray.remote(**self._actor_options)(ShardWorker)
        return Worker.remote(
            _shard_dir(self.cluster_dir, s),
            int(self._doc_bases[s]),
            **self._reader_kwargs,
        )

    def _respawn(self, s: int, idx: int):
        """Replace a dead replica and replay its serving state: cluster
        stats with the full accumulated df map, then the shard's NRT
        tombstones. After this the fresh replica is indistinguishable from
        one that lived through every push."""
        import ray

        w = self._spawn(s)
        ray.get(
            w.set_global_stats.remote(
                self.n_docs, self.avgdl, dict(self._df_cache)
            )
        )
        if self._deleted[s]:
            ray.get(w.delete.remote(list(self._deleted[s])))
        self._pool[s][idx] = w
        return w

    def _gather(self, calls: list[tuple]) -> list:
        """Submit one call per (shard, method, args, kwargs) to the current
        round-robin replica, gather with failover: a dead replica is
        respawned in place (state replayed) and the call retries on the
        next replica, wrapping around to the fresh one."""
        import ray

        rr = self._rr
        self._rr += 1
        futs = []
        for s, method, args, kwargs in calls:
            idx = rr % len(self._pool[s])
            futs.append(
                (s, idx, method, args, kwargs,
                 getattr(self._pool[s][idx], method).remote(
                     *args, **(kwargs or {})
                 ))
            )
        out = []
        for s, idx, method, args, kwargs, f in futs:
            for attempt in range(len(self._pool[s]) + 1):
                try:
                    out.append(ray.get(f))
                    break
                except ray.exceptions.RayActorError:
                    self._respawn(s, idx)
                    idx = (idx + 1) % len(self._pool[s])
                    f = getattr(self._pool[s][idx], method).remote(
                        *args, **(kwargs or {})
                    )
            else:
                raise RuntimeError(f"shard {s}: every replica failing")
        return out

    def _fanout(self, method: str, *args, **kwargs) -> list:
        return self._gather(
            [(s, method, args, kwargs) for s in range(self.num_shards)]
        )

    def _shard_call(self, s: int, method: str, *args, **kwargs):
        return self._gather([(s, method, args, kwargs)])[0]

    def _broadcast(self, method: str, *args, shards=None, **kwargs) -> list:
        """Invoke on EVERY replica of the target shards (state-mutating
        calls: stats pushes, deletes, refresh). A replica that died gets
        respawned — the respawn replay already carries the new state, since
        callers update the replay log BEFORE broadcasting — and the method
        re-invokes on it for its return value."""
        import ray

        target = range(self.num_shards) if shards is None else shards
        futs = [
            (s, i, getattr(w, method).remote(*args, **kwargs))
            for s in target
            for i, w in enumerate(self._pool[s])
        ]
        out = []
        for s, i, f in futs:
            try:
                out.append(ray.get(f))
            except ray.exceptions.RayActorError:
                w = self._respawn(s, i)
                out.append(
                    ray.get(getattr(w, method).remote(*args, **kwargs))
                )
        return out

    def _bases(self, shard_n: list[int]) -> np.ndarray:
        """Global docID base per shard. Dense shards: cumulative counts —
        shard order is sha order, so `base + local` EQUALS the monolithic
        dense docID (tested identity). Strided shards: local ids are
        already sparse (bucket << capacity_bits, < 2^56 at <= 2^16
        buckets), so bases are `shard << 58` — monotonic in (shard, local),
        which is still global sha order, so ranking tie-breaks stay
        monolith-identical; the ids themselves are cluster-serving ids
        (Lucene MultiReader docBase discipline), not the monolith's."""
        if self.id_mode == "strided":
            return (np.arange(self.num_shards, dtype=np.int64) << 58)
        return np.concatenate(([0], np.cumsum(shard_n[:-1]))).astype(np.int64)

    def _refresh_globals(self, shard_n: list[int], shard_len: list[int]) -> None:
        self.n_docs = int(sum(shard_n))
        total_len = int(sum(shard_len))
        self.avgdl = (total_len / self.n_docs) if self.n_docs else 0.0
        # base push: global N/avgdl with no df overrides — constant-score
        # and phrase paths are correct immediately; scoring queries add
        # their term dfs in phase 1
        self._broadcast("set_global_stats", self.n_docs, self.avgdl, {})

    # ---- two-phase distributed query ------------------------------------
    def _ensure_stats(self, query: str, lang: str | None) -> None:
        key = (query, lang)
        if key in self._stats_pushed:
            return
        per_shard = self._fanout("term_dfs", query, lang)
        total: dict[str, int] = {}
        for dfs in per_shard:
            for t, d in dfs.items():
                total[t] = total.get(t, 0) + int(d)
        if total:
            self._df_cache.update(total)  # replay log first (see _broadcast)
            self._broadcast("set_global_stats", self.n_docs, self.avgdl, total)
        self._stats_pushed.add(key)

    def search(
        self,
        query: str,
        k: int = 10,
        mode: str = "OR",
        algorithm: str = "wand",
        lang: str | None = None,
        filters: dict | None = None,
        min_should_match: int = 0,
    ) -> list[tuple[int, float]]:
        fk = (
            tuple(
                (f, tuple(sorted([v] if isinstance(v, str) else v)))
                for f, v in sorted(filters.items())
            )
            if filters
            else None
        )
        ckey = (query, k, mode, algorithm, lang, fk, min_should_match)
        hit = self._result_cache.get(ckey)
        if hit is not None:
            self._result_cache.move_to_end(ckey)
            return list(hit)
        self._ensure_stats(query, lang)
        parts = self._fanout(
            "search",
            query,
            k,
            mode=mode,
            algorithm=algorithm,
            lang=lang,
            filters=filters,
            min_should_match=min_should_match,
        )
        merged = [hit for p in parts for hit in p]
        merged.sort(key=lambda ds: (-ds[1], ds[0]))
        out = merged[: max(k, 0)]
        self._result_cache[ckey] = out
        if len(self._result_cache) > self._result_cache_cap:
            self._result_cache.popitem(last=False)
        return list(out)

    def match_count(self, query: str, **kw) -> int:
        self._ensure_stats(query, kw.get("lang"))
        return sum(self._fanout("match_count", query, **kw))

    def facets(
        self, query: str, fields: list[str], **kw
    ) -> dict[str, list[tuple[str, int]]]:
        self._ensure_stats(query, kw.get("lang"))
        parts = self._fanout("facets", query, fields, **kw)
        out: dict[str, list[tuple[str, int]]] = {}
        for f in fields:
            acc: dict[str, int] = {}
            for p in parts:
                for v, c in p.get(f, []):
                    acc[v] = acc.get(v, 0) + int(c)
            out[f] = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return out

    def facet_pivot(self, query: str, fields: tuple, **kw) -> list:
        self._ensure_stats(query, kw.get("lang"))
        parts = self._fanout("facet_pivot", query, fields, **kw)
        acc: dict[tuple[str, str], int] = {}
        for p in parts:
            for v1, v2, c in p:
                acc[(v1, v2)] = acc.get((v1, v2), 0) + int(c)
        return [
            (v1, v2, c)
            for (v1, v2), c in sorted(
                acc.items(), key=lambda kv: (-kv[1], kv[0])
            )
        ]

    def search_sorted(
        self,
        query: str,
        sort_by: str | list[str],
        ascending: bool | list[bool] = True,
        start: int = 0,
        rows: int = 10,
        mode: str = "OR",
        lang: str | None = None,
        filters: dict | None = None,
        cursor: tuple | None = None,
    ) -> pa.Table:
        """Distributed field sort with (start, rows) paging and cursorMark
        deep paging — IndexReader.search_sorted's contract, fanned out:
        each shard returns its top-(start+rows) candidates WITH sort keys
        (bounded: O(shards × page) rows reach the coordinator, never match
        sets), the merge re-sorts by the same subset-invariant lex order,
        and only the final page's stored fields are fetched. Matching is
        df-independent, so no stats push is needed."""
        from .query import _lex_order

        sort_fields = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        asc = (
            [ascending] * len(sort_fields)
            if isinstance(ascending, bool)
            else list(ascending)
        )
        if len(asc) != len(sort_fields):
            raise ValueError("ascending must match sort_by length")
        if cursor is not None and start:
            raise ValueError("cursor and start are mutually exclusive")
        parts = self._fanout(
            "sorted_candidates", query, sort_fields, asc, start + rows,
            mode, lang, filters, cursor,
        )
        num_found = sum(nf for _, _, nf in parts)
        if num_found == 0:
            return pa.table({}).replace_schema_metadata({b"num_found": b"0"})
        docs = np.concatenate([d for d, _, _ in parts])
        keys = [
            np.concatenate([p[1][i].astype("U") for p in parts])
            for i in range(len(sort_fields))
        ]
        order = _lex_order(docs, keys, asc)
        sel = order[start : start + rows]
        page = docs[sel]
        meta = {b"num_found": str(num_found).encode()}
        if sel.size:
            import json as _json

            nc = [str(ks[sel[-1]]) for ks in keys] + [int(docs[sel[-1]])]
            meta[b"next_cursor"] = _json.dumps(nc).encode()
        fields = self.doc_fields([int(d) for d in page])
        if fields.num_rows == 0:
            return fields.replace_schema_metadata(meta)
        pos = {int(d): i for i, d in enumerate(fields["doc_id"].to_pylist())}
        out = fields.take(pa.array([pos[int(d)] for d in page]))
        return out.replace_schema_metadata(meta)

    def highlight(
        self,
        query: str,
        k: int = 10,
        context: int = 2,
        lang: str | None = None,
        filters: dict | None = None,
    ) -> pa.Table:
        """Distributed highlighting: the exact global top-k first (two-phase
        scoring), then each shard snippets ONLY its own hits from its own
        positional postings + stored fields — snippet work and doc content
        never cross shards."""
        top = self.search(query, k=k, lang=lang, filters=filters)
        by: dict[int, list[int]] = {}
        for g, _ in top:
            s = int(np.searchsorted(self._doc_bases, g, side="right") - 1)
            by.setdefault(s, []).append(int(g))
        results = self._gather(
            [
                (s, "highlight_docs", (query, part, context, lang), None)
                for s, part in sorted(by.items())
            ]
        )
        tbls = [t for t in results if t.num_rows]
        if not tbls:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "first_pos": pa.array([], pa.int64()),
                    "snippet": pa.array([], pa.string()),
                }
            )
        out = pa.concat_tables(tbls)
        order = np.lexsort(
            (
                np.asarray(out["term"].to_pylist(), dtype="U"),
                np.asarray(out["doc_id"], dtype=np.int64),
            )
        )
        return out.take(pa.array(order))

    def more_like_this(
        self,
        doc_id: int,
        k: int = 10,
        max_query_terms: int = 25,
        min_tf: int = 2,
        min_df: int = 2,
        lang: str | None = None,
        filters: dict | None = None,
    ) -> list[tuple[int, float]]:
        """Distributed MoreLikeThis, monolith-exact: phase 0 pulls the
        source doc's candidate (term, tf) pairs from its OWNING shard;
        phase 1 sums each candidate's df across shards so tf·idf term
        selection uses CLUSTER-global statistics; phase 2 pushes those
        global dfs and fans out the analyzed-term query (source doc
        excluded on its owner only)."""
        from . import bm25

        owner = int(
            np.searchsorted(self._doc_bases, int(doc_id), side="right") - 1
        )
        pairs = self._shard_call(
            owner, "mlt_source_terms", int(doc_id), lang, min_tf
        )
        if not pairs:
            return []
        terms = [t for t, _ in pairs]
        df_parts = self._fanout("raw_term_dfs", terms)
        df_global: dict[str, int] = {}
        for p in df_parts:
            for t, d in p.items():
                df_global[t] = df_global.get(t, 0) + int(d)
        cands = [
            (float(tf) * bm25.idf(df_global[t], self.n_docs), t)
            for t, tf in pairs
            if df_global.get(t, 0) >= min_df
        ]
        cands.sort(key=lambda x: (-x[0], x[1]))
        qterms = [t for _, t in cands[:max_query_terms]]
        if not qterms or k <= 0:
            return []
        push = {t: df_global[t] for t in qterms}
        self._df_cache.update(push)  # replay log first (see _broadcast)
        self._broadcast("set_global_stats", self.n_docs, self.avgdl, push)
        base = int(self._doc_bases[owner])
        parts = self._gather(
            [
                (
                    s,
                    "search_analyzed",
                    (
                        qterms,
                        k,
                        (int(doc_id) - base,) if s == owner else (),
                        lang,
                        filters,
                    ),
                    None,
                )
                for s in range(self.num_shards)
            ]
        )
        merged = [hit for p in parts for hit in p]
        merged.sort(key=lambda ds: (-ds[1], ds[0]))
        return merged[: max(k, 0)]

    def explain(
        self, query: str, doc_id: int, lang: str | None = None
    ) -> list[dict]:
        """Distributed debugQuery: routed to the doc's owning shard, scored
        with the pushed cluster-global stats — term dfs and float32
        contributions identical to a monolithic explain."""
        self._ensure_stats(query, lang)
        owner = int(
            np.searchsorted(self._doc_bases, int(doc_id), side="right") - 1
        )
        return self._shard_call(owner, "explain", query, int(doc_id), lang)

    def analyze(
        self, text: str, lang: str | None = None, query_time: bool = False
    ) -> list:
        """Analyzer passthrough (any shard — the chain is config, not
        data)."""
        return self._shard_call(0, "analyze", text, lang, query_time)

    def search_elevated(
        self,
        query: str,
        elevate: list[int],
        exclude: list[int] | tuple = (),
        k: int = 10,
        mode: str = "OR",
        lang: str | None = None,
        filters: dict | None = None,
    ) -> list[tuple[int, float]]:
        """Distributed QueryElevationComponent: pinned docs first in
        editorial order (a pin outside the organic top-k gets its EXACT
        score from the owner's explain under global stats), excludes
        removed, remainder by the normal distributed order — the same
        composition as IndexReader.search_elevated."""
        pins = [int(d) for d in elevate]
        drop = set(pins) | {int(d) for d in exclude}
        hits = self.search(
            query, k=k + len(drop), mode=mode, lang=lang, filters=filters
        )
        smap = dict(hits)
        out: list[tuple[int, float]] = []
        for pid in pins:
            s = smap.get(pid)
            if s is None:
                acc = np.float32(0.0)
                for e in self.explain(query, pid, lang=lang):
                    acc = np.float32(acc + np.float32(e["contribution"]))
                s = float(acc)
            out.append((pid, s))
        for d, s in hits:
            if len(out) >= k:
                break
            if d in drop:
                continue
            out.append((d, s))
        return out[:k]

    # ---- dictionary surface ---------------------------------------------
    def _merged_prefix_rows(self, prefix: str) -> list[tuple[str, int]]:
        parts = self._fanout("prefix_term_rows", prefix)
        acc: dict[str, int] = {}
        for p in parts:
            for t, d in p:
                acc[t] = acc.get(t, 0) + int(d)
        return sorted(acc.items())

    def suggest(self, prefix: str, n: int = 10) -> list[tuple[str, int]]:
        """Distributed terms component: EXACT global top-n — shards return
        their whole prefix slice, so no refinement pass is needed."""
        rows = self._merged_prefix_rows(prefix)
        return sorted(rows, key=lambda r: (-r[1], r[0]))[:n]

    def spellcheck(self, term: str, n: int = 1) -> list[tuple[str, int]]:
        from .query import _lev1_hits

        rows = self._merged_prefix_rows("")
        uniq = np.array([t for t, _ in rows], dtype="U")
        dfs = np.array([d for _, d in rows], dtype=np.int64)
        hit = _lev1_hits(term, uniq)
        hit &= uniq != term
        idx = np.flatnonzero(hit)
        order = np.lexsort((uniq[idx], -dfs[idx]))[:n]
        return [(str(uniq[idx[o]]), int(dfs[idx[o]])) for o in order]

    # ---- sha-routed point ops --------------------------------------------
    def _route(self, shas: list[str]) -> dict[int, list[str]]:
        by: dict[int, list[str]] = {}
        for s in shas:
            by.setdefault(shard_of_sha(s, self.num_shards), []).append(s)
        return by

    def get(
        self, shas: list[str], columns: list[str] | None = None
    ) -> pa.Table:
        tbls = self._gather(
            [
                (s, "get", (part, columns), None)
                for s, part in sorted(self._route(shas).items())
            ]
        )
        tbls = [t for t in tbls if t.num_rows]
        if not tbls:
            return pa.table({})
        out = pa.concat_tables(tbls)
        return out.take(
            pa.array(np.argsort(np.asarray(out["doc_id"], dtype=np.int64)))
        )

    def doc_fields(
        self, global_ids: list[int], columns: list[str] | None = None
    ) -> pa.Table:
        by: dict[int, list[int]] = {}
        for g in global_ids:
            s = int(np.searchsorted(self._doc_bases, g, side="right") - 1)
            by.setdefault(s, []).append(int(g))
        tbls = self._gather(
            [
                (s, "doc_fields", (part, columns), None)
                for s, part in sorted(by.items())
            ]
        )
        tbls = [t for t in tbls if t.num_rows]
        if not tbls:
            return pa.table({})
        out = pa.concat_tables(tbls)
        return out.take(
            pa.array(np.argsort(np.asarray(out["doc_id"], dtype=np.int64)))
        )

    def delete(self, shas: list[str]) -> int:
        """NRT delete-by-uniqueKey: routed to owning shards (broadcast to
        ALL their replicas — tombstones are replica state), effective on
        the next query (no commit wait). Returns docs newly tombstoned."""
        total = 0
        self._result_cache.clear()  # tombstones change every result set
        for s, part in sorted(self._route(shas).items()):
            self._deleted[s].extend(part)  # replay log first
            counts = self._broadcast("delete", part, shards=[s])
            # live replicas agree on the newly-dead count; a replica
            # respawned mid-broadcast already got the tombstones in its
            # replay and reports 0 — take the max, not an arbitrary one
            total += int(max(counts))
        return total

    def refresh(self) -> bool:
        """Re-open every shard replica at its current commit point and
        recompute global stats. Returns True if any replica reloaded. The
        accumulated df replay log resets — a new commit may change any
        term's df, so the next query of each (query, lang) re-runs
        phase 1."""
        with open(os.path.join(self.cluster_dir, CLUSTER_MANIFEST)) as f:
            self.manifest = json.load(f)
        self.id_mode = self.manifest.get("id_mode", "dense")
        self._df_cache = {}
        self._stats_pushed = set()
        self._result_cache.clear()
        stats = self._broadcast("refresh")
        # one row per (shard, replica), shard-major order; replicas of one
        # shard read the same manifest, so take each shard's first row
        per_shard = []
        i = 0
        for s in range(self.num_shards):
            per_shard.append(stats[i])
            i += len(self._pool[s])
        shard_n = [s["n_docs"] for s in per_shard]
        self._doc_bases = self._bases(shard_n)
        changed = any(s["reloaded"] for s in stats)
        for s in range(self.num_shards):
            self._broadcast(
                "set_doc_base", int(self._doc_bases[s]), shards=[s]
            )
        self._refresh_globals(shard_n, [s["total_len"] for s in per_shard])
        return changed

    def shutdown(self) -> None:
        """Release the shard actors (and their reserved CPUs) immediately
        instead of waiting for handle GC — call when done serving."""
        import ray

        for pool in self._pool:
            for w in pool:
                ray.kill(w)
        self._pool = [[] for _ in range(self.num_shards)]
