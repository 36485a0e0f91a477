"""Fielded filter queries (Solr fq analog: corpus.cgi:328-339 /
solrTestLib_v2.js:38-102), facet drill-down, match-all, multi-key sort +
numFound, and doc-range shard locality of the serving state."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest


def _doc_meta(idx, manifest, cols):
    meta = pq.read_table(
        os.path.join(idx, "docstore"), columns=["doc_bucket", "local_rank"] + cols
    )
    did = (
        np.asarray(manifest["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    return did, meta


def test_filtered_search_rank_identity(built_index):
    """filters= must equal the unfiltered full ranking restricted to the
    filter's doc set, and WAND must equal exhaustive under filters."""
    from nexlt_ray.query import IndexReader

    idx, manifest = built_index
    r = IndexReader(idx)
    did, meta = _doc_meta(idx, manifest, ["lang"])
    langs = np.asarray(meta["lang"].to_pylist(), dtype=object)
    lang = str(langs[0])
    fset = set(did[langs.astype("U") == lang].tolist())
    for q in ["parse", "http parse", "alloc buffer free"]:
        full = r.search(q, k=int(manifest["n_docs"]), algorithm="exhaustive")
        exp = [(d, s) for d, s in full if d in fset][:10]
        got_ex = r.search(q, k=10, algorithm="exhaustive",
                          filters={"lang": lang})
        got_wand = r.search(q, k=10, algorithm="wand", filters={"lang": lang})
        assert got_ex == exp, q
        assert got_wand == exp, q


def test_filter_composition_and_or(built_index):
    """Values OR within a field, AND across fields."""
    from nexlt_ray.query import IndexReader

    idx, manifest = built_index
    r = IndexReader(idx)
    did, meta = _doc_meta(idx, manifest, ["lang", "repo"])
    langs = np.asarray(meta["lang"].to_pylist(), dtype=object).astype("U")
    repos = np.asarray(meta["repo"].to_pylist(), dtype=object).astype("U")
    l0, l1 = np.unique(langs)[:2]
    rp = repos[0]
    docs = r._matching_docs("parse")
    sel = np.isin(did, docs) & ((langs == l0) | (langs == l1)) & (repos == rp)
    exp = int(sel.sum())
    got = r.match_count(
        "parse", filters={"lang": [str(l0), str(l1)], "repo": str(rp)}
    )
    assert got == exp


def test_match_all_with_filters(built_index):
    """q=*:* + fq — the reference's flagship query shape
    (q=<lang>:[* TO *], solrTestLib_v2.js:38-44)."""
    from nexlt_ray.query import IndexReader

    idx, manifest = built_index
    r = IndexReader(idx)
    did, meta = _doc_meta(idx, manifest, ["lang"])
    langs = np.asarray(meta["lang"].to_pylist(), dtype=object).astype("U")
    lang = str(langs[0])
    n_lang = int((langs == lang).sum())
    assert r.match_count("*:*") == manifest["n_docs"]
    assert r.match_count("*:*", filters={"lang": lang}) == n_lang
    hits = r.search("*:*", k=5, filters={"lang": lang})
    assert len(hits) == min(5, n_lang)
    assert all(s == 1.0 for _, s in hits)
    exp_ids = np.sort(did[langs == lang])[:5].tolist()
    assert [d for d, _ in hits] == exp_ids


def test_facet_drilldown(built_index):
    """Clicking a facet value (ResultWidget.js:11-38) adds an fq; counts on
    other fields must re-narrow accordingly."""
    from nexlt_ray.query import IndexReader

    idx, manifest = built_index
    r = IndexReader(idx)
    base = r.facets("parse", ["lang", "repo"])
    lang, n_lang = base["lang"][0]
    drilled = r.facets("parse", ["lang", "repo"], filters={"lang": lang})
    assert drilled["lang"] == [(lang, n_lang)]
    assert sum(c for _, c in drilled["repo"]) == n_lang
    # drill-down counts are bounded by the undrilled counts
    base_repo = dict(base["repo"])
    assert all(c <= base_repo[v] for v, c in drilled["repo"])


def test_multikey_sort_and_num_found(built_index):
    """Multi-key field sort (product asc, srclc asc discipline,
    solrTestLib_v2.js:83-96) + numFound in the schema metadata."""
    from nexlt_ray.query import IndexReader

    idx, manifest = built_index
    r = IndexReader(idx)
    docs = r._matching_docs("parse")
    langs = r._meta_values("lang", docs).astype("U")
    paths = r._meta_values("path", docs).astype("U")
    order = np.lexsort((docs, paths, langs))  # lang primary, path secondary
    exp = docs[order][:7].tolist()
    page = r.search_sorted("parse", sort_by=["lang", "path"], rows=7)
    assert page["doc_id"].to_pylist() == exp
    assert int(page.schema.metadata[b"num_found"]) == docs.size
    # mixed ascending: lang desc, path asc
    lrank = np.unique(langs, return_inverse=True)[1]
    order2 = np.lexsort((docs, paths, -lrank))
    exp2 = docs[order2][:7].tolist()
    page2 = r.search_sorted(
        "parse", sort_by=["lang", "path"], ascending=[False, True], rows=7
    )
    assert page2["doc_id"].to_pylist() == exp2


def test_serving_state_shard_locality(built_index):
    """A reader must load only the doc buckets its docs live in (doc-range
    sharded norms/meta; no whole-column concatenation)."""
    from nexlt_ray.query import IndexReader

    idx, manifest = built_index
    r = IndexReader(idx)
    counts = np.asarray(manifest["doc_counts"])
    offsets = np.asarray(manifest["doc_offsets"])
    b0 = int(np.flatnonzero(counts > 0)[0])
    d0 = np.array([offsets[b0]], dtype=np.int64)
    r._norm_bytes_for(d0)
    r._meta_values("lang", d0)
    assert r._shard_loads == [("norm", b0), ("lang", b0)]
    # filters legitimately scan every bucket's column once — but only that
    # column, and the cache means once
    r._shard_loads.clear()
    r.match_count("parse", filters={"lang": "python"})
    loaded = set(r._shard_loads)
    assert all(name == "lang" for name, _ in loaded)
    r._shard_loads.clear()
    r.match_count("parse", filters={"lang": "python"})  # filterCache hit
    assert r._shard_loads == []


def test_match_all_browse_never_materializes_corpus(built_index, monkeypatch):
    """The reference UI's default view (q=*:* + sort + facet sidebar,
    solrTestLib_v2.js:38-96) must stream per doc bucket: no O(n_docs) doc
    array (_all_docs / FilterSet.all_docs) and no corpus-wide lexsort —
    per-bucket partial top-(start+rows) + a bounded merge instead."""
    from nexlt_ray.query import FilterSet, IndexReader

    idx, manifest = built_index
    r = IndexReader(idx)
    # oracle page computed the straightforward way BEFORE the traps go in
    docs = r._matching_docs("*:*")
    paths = r._meta_values("path", docs).astype("U")
    order = np.lexsort((docs, paths))
    exp_page = docs[order][3:10].tolist()
    exp_facets = r.facets("*:*", ["lang"])

    def trap(*a, **k):  # pragma: no cover - failing is the point
        raise AssertionError("O(n_docs) materialization on the browse path")

    monkeypatch.setattr(IndexReader, "_all_docs", trap)
    monkeypatch.setattr(FilterSet, "all_docs", trap)
    lex_calls = []
    real_lexsort = np.lexsort
    max_bucket = int(np.asarray(manifest["doc_counts"]).max())

    def counting_lexsort(keys, *a, **k):
        lex_calls.append(len(keys[0]))
        return real_lexsort(keys, *a, **k)

    monkeypatch.setattr(np, "lexsort", counting_lexsort)
    page = r.search_sorted("*:*", sort_by="path", start=3, rows=7)
    assert page["doc_id"].to_pylist() == exp_page
    assert int(page.schema.metadata[b"num_found"]) == manifest["n_docs"]
    # every lexsort is per-bucket (<= max bucket size) or the bounded
    # candidate merge (<= buckets * (start+rows)), never corpus-sized
    n_buckets = int((np.asarray(manifest["doc_counts"]) > 0).sum())
    bound = max(max_bucket, n_buckets * 10)
    assert lex_calls and all(n <= bound for n in lex_calls)
    assert r.facets("*:*", ["lang"]) == exp_facets
    assert r.match_count("*:*") == manifest["n_docs"]
    # filtered match-all count/browse also avoid the global array
    lang = exp_facets["lang"][0][0]
    n_lang = exp_facets["lang"][0][1]
    assert r.match_count("*:*", filters={"lang": lang}) == n_lang
    fpage = r.search_sorted("*:*", "path", rows=5, filters={"lang": lang})
    assert int(fpage.schema.metadata[b"num_found"]) == n_lang


def test_selective_filter_bucket_locality(built_index):
    """An fq on a selective term query must evaluate its doc sets only on
    the buckets the query's candidate docs touch (lazy per-bucket
    FilterSet), not full-corpus column scans (VERDICT r2 item 2)."""
    from nexlt_ray.query import IndexReader

    idx, manifest = built_index
    r = IndexReader(idx)
    # pick a genuinely rare term (df small => candidates touch few buckets)
    # straight out of the segment files, requiring that it round-trips
    # through the query tokenizer unchanged
    from nexlt_ray.tokenize import tokenize_query

    seg = pq.read_table(os.path.join(idx, "segments"), columns=["term", "df"])
    agg: dict[str, int] = {}
    for t, d in zip(seg["term"].to_pylist(), seg["df"].to_pylist()):
        agg[t] = agg.get(t, 0) + int(d)
    term = min(
        (t for t in agg if tokenize_query(t, profile="code") == [t]),
        key=lambda t: agg[t],
    )
    tp = r.postings(term)
    cand_buckets = set(r._buckets_of(tp.decode_all()[0]).tolist())
    assert len(cand_buckets) < int((np.asarray(manifest["doc_counts"]) > 0).sum())
    r._shard_loads.clear()
    r.search(term, k=10, filters={"lang": "python"})
    lang_loads = {b for name, b in r._shard_loads if name == "lang"}
    assert lang_loads <= cand_buckets
    # WAND and exhaustive agree under the lazy filter
    w = r.search(term, k=10, algorithm="wand", filters={"lang": "python"})
    e = r.search(term, k=10, algorithm="exhaustive", filters={"lang": "python"})
    assert w == e


def test_query_valued_fq(built_index):
    """fq can be a full QUERY over the analyzed field (Solr: every fq is a
    query whose doc set lands in the filterCache; the reference UI's
    target-text box issues fq=<lang>:"<phrase>", solrTestLib_v2.js:50-53).
    The filtered ranking must equal the unfiltered ranking restricted to the
    fq query's match set, with corpus-global BM25 (fq never re-weights)."""
    from nexlt_ray.query import IndexReader

    idx, manifest = built_index
    r = IndexReader(idx)

    fq_sets = [
        "import",                 # term fq
        '"the import"',           # phrase fq
        ["buffer", "cache"],      # OR-of-queries fq
    ]
    for fq in fq_sets:
        qs = [fq] if isinstance(fq, str) else fq
        allowed = set()
        for q in qs:
            allowed |= set(r._matching_docs(q).tolist())
        full = r.search("merge block data", k=r.n_docs, use_cache=False)
        expect = [(d, s) for d, s in full if d in allowed][:10]
        got = r.search(
            "merge block data", k=10, filters={"content": fq}, use_cache=False
        )
        assert got == expect, fq
        # WAND == exhaustive under the query-valued fq
        e = r.search(
            "merge block data", k=10, algorithm="exhaustive",
            filters={"content": fq}, use_cache=False,
        )
        assert got == e, fq
        # numFound composition
        n = r.match_count("merge block data", filters={"content": fq})
        base = set(r._matching_docs("merge block data").tolist())
        assert n == len(base & allowed), fq

    # match-all + content fq: the fq alone selects (the UI's default view
    # composes q=*:* with fq filters)
    n_all = r.match_count("*:*", filters={"content": '"the import"'})
    assert n_all == r.match_count('"the import"')

    # compose content fq with a meta filter (AND across fields)
    did, meta = _doc_meta(idx, manifest, ["lang"])
    langs = dict(zip(did.tolist(), meta["lang"].to_pylist()))
    allowed = {
        d for d in r._matching_docs("import").tolist()
        if langs[d] == "python"
    }
    got = r.search(
        "merge", k=r.n_docs,
        filters={"content": "import", "lang": "python"}, use_cache=False,
    )
    assert {d for d, _ in got} <= allowed
    n = r.match_count("*:*", filters={"content": "import", "lang": "python"})
    assert n == len(allowed)

    # facets under a content fq stream per bucket and match a manual count
    fac = r.facets("*:*", ["lang"], filters={"content": "import"})["lang"]
    manual: dict[str, int] = {}
    for d in r._matching_docs("import").tolist():
        manual[langs[d]] = manual.get(langs[d], 0) + 1
    assert dict(fac) == manual


def test_range_fq(built_index):
    """Solr range-literal fq (field:[lo TO hi], inclusive, * = open end):
    doc set matches brute force over the meta column; composes with BM25
    (WAND == exhaustive == brute-force-filtered ranking) and ORs with plain
    values of the same field."""
    from nexlt_ray.query import IndexReader

    idx, manifest = built_index
    r = IndexReader(idx)
    did, meta = _doc_meta(idx, manifest, ["path", "lang"])
    paths = np.asarray(meta["path"].to_pylist(), dtype=object)
    langs = np.asarray(meta["lang"].to_pylist(), dtype=object)
    lo, hi = "src/e", "src/p"
    in_range = (paths >= lo) & (paths <= hi)

    flt = {"path": f"[{lo} TO {hi}]"}
    assert r.match_count("*:*", filters=flt) == int(in_range.sum())
    got = r.search("parse", k=8, filters=flt)
    exh = r.search("parse", k=8, filters=flt, algorithm="exhaustive")
    assert got == exh
    allowed = set(did[in_range].tolist())
    full = r.search("parse", k=10_000)
    exp = [(d, s) for d, s in full if d in allowed][:8]
    assert got == exp

    # open end + OR with a plain value on ANOTHER field (AND across fields)
    flt2 = {"path": f"[{hi} TO *]", "lang": "python"}
    m2 = (paths >= hi) & (langs == "python")
    assert r.match_count("*:*", filters=flt2) == int(m2.sum())

    # range ORs with a plain value of the SAME field
    some_path = paths[~in_range][0]
    flt3 = {"path": [f"[{lo} TO {hi}]", some_path]}
    m3 = in_range | (paths == some_path)
    assert r.match_count("*:*", filters=flt3) == int(m3.sum())
