"""CLI entry points — the `ray job submit` surface replacing the reference's
cron/shell drivers (tr2solr.sh, athena2nexlt.sh, processJSONs.sh).

  python -m nexlt_ray.cli build  --input corpus.parquet --index /tmp/idx
  python -m nexlt_ray.cli search --index /tmp/idx --query "http server" -k 10
  python -m nexlt_ray.cli stats  --index /tmp/idx

Owns a Ray session when run standalone (guarded with is_initialized so the
same commands work inside `ray job submit` where the driver already did it).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_build(args) -> int:
    _ensure_ray(args.num_cpus)
    from .build import BuildConfig, build_index

    cfg = BuildConfig(
        profile=args.profile,
        id_mode=args.id_mode,
        num_doc_buckets=args.doc_buckets,
        num_term_buckets=args.term_buckets,
        store_positions=not args.no_positions,
        max_content_chars=args.max_chars,
    )
    manifest = build_index(args.input, args.index, cfg)
    print(json.dumps({k: manifest[k] for k in
                      ("n_docs", "n_input_rows", "n_dups_removed", "n_terms",
                       "n_postings", "avgdl")}))
    return 0


def cmd_extend(args) -> int:
    """Merge a new shard into an existing strided-id index (the reference's
    continuous upsert loop, tr2solr.sh cron analog)."""
    _ensure_ray(args.num_cpus)
    from .build import extend_index

    manifest = extend_index(args.input, args.index)
    print(json.dumps({k: manifest[k] for k in
                      ("n_docs", "n_input_rows", "n_dups_removed", "n_terms",
                       "n_postings", "avgdl")}))
    return 0


def cmd_search(args) -> int:
    from .query import IndexReader

    reader = IndexReader(args.index)
    filters = json.loads(args.filters) if args.filters else None
    hits = reader.search(args.query, k=args.k, mode=args.mode,
                         algorithm=args.algorithm, filters=filters)
    fields = reader.doc_fields([d for d, _ in hits]) if hits else None
    meta = (
        {int(r["doc_id"]): r for r in fields.to_pylist()} if fits(fields) else {}
    )
    for rank, (doc, score) in enumerate(hits):
        row = meta.get(doc, {})
        print(json.dumps({
            "rank": rank, "doc_id": doc, "score": round(score, 6),
            "repo": row.get("repo"), "path": row.get("path"),
            "commit": row.get("commit"), "lang": row.get("lang"),
        }))
    print(
        json.dumps(
            {
                "num_found": reader.match_count(
                    args.query, mode=args.mode, filters=filters
                )
            }
        ),
        file=sys.stderr,
    )
    return 0


def fits(t) -> bool:
    return t is not None and t.num_rows > 0


def cmd_stats(args) -> int:
    from .query import IndexReader

    reader = IndexReader(args.index)
    print(json.dumps(reader.manifest, indent=1))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="nexlt_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index from parquet")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument(
        "--profile", default="code",
        choices=["code", "text_en", "text_de", "text_fr", "text_es",
                 "text_it", "text_pt", "text_nl", "text_ru",
                 "simple", "cjk_bigram", "auto"],
    )
    b.add_argument("--id-mode", default="dense", choices=["dense", "strided"])
    b.add_argument("--doc-buckets", type=int, default=64)
    b.add_argument("--term-buckets", type=int, default=32)
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--max-chars", type=int, default=None)
    b.add_argument("--num-cpus", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    e = sub.add_parser("extend", help="merge a new shard into a strided index")
    e.add_argument("--input", required=True)
    e.add_argument("--index", required=True)
    e.add_argument("--num-cpus", type=int, default=None)
    e.set_defaults(fn=cmd_extend)

    s = sub.add_parser("search", help="top-k BM25 search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--mode", default="OR", choices=["OR", "AND"])
    s.add_argument("--algorithm", default="wand", choices=["wand", "exhaustive"])
    s.add_argument("--filters", default=None,
                   help='fq JSON, e.g. \'{"lang": ["python", "c"]}\'')
    s.set_defaults(fn=cmd_search)

    st = sub.add_parser("stats", help="print index manifest")
    st.add_argument("--index", required=True)
    st.set_defaults(fn=cmd_stats)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
