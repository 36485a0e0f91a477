"""Deterministic synthetic source-code corpus (FIXTURES.md F1) + reference
query set (F2).

Shape per BASELINE.json `input_hint`: one Parquet table
(repo:string, path:string, commit:string, lang:string, content:string).
Seeded (seed=42), content-derived, no wall-clock — regenerating with the same
(n_docs, seed) is byte-identical. The content generator exercises:
  - Zipf vocabulary with stopword-like ubiquitous tokens (`the`, `import`,
    `return`, `0`, `i`) — the term-skew / salted-pre-aggregation path;
  - mixed-case identifiers, snake_case, digits, punctuation — the
    WordDelimiter-style tokenizer (reference schema.xml:273-308);
  - HTML-ish fragments (`<b>`, `&amp;x`) — the char-filter steps;
  - doc lengths ~5..2000 tokens — norm-byte quantization buckets;
  - ~3% exact-duplicate content across distinct (repo, path) rows — the
    content-sha dedup path (reference md5-id upsert, parseJSON.pl:330).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_EXTS = ["py", "java", "cpp", "js", "md"]
_LANGS = {"py": "python", "java": "java", "cpp": "cpp", "js": "javascript", "md": "markdown"}

_STOPLIKE = ["the", "import", "return", "0", "i", "a", "to", "of", "in", "is"]

_WORDS = [
    "get", "set", "foo", "bar", "baz", "http", "server", "client", "parse",
    "json", "index", "query", "token", "stream", "batch", "merge", "block",
    "data", "file", "path", "node", "tree", "hash", "list", "map", "value",
    "key", "read", "write", "open", "close", "init", "config", "util", "test",
    "main", "run", "start", "stop", "count", "total", "sum", "min", "max",
    "buffer", "cache", "error", "warn", "info", "debug", "trace", "user",
    "name", "type", "size", "len", "next", "prev", "first", "last", "load",
    "save", "send", "recv", "pack", "unpack", "encode", "decode", "build",
    "make", "free", "alloc", "copy", "move", "swap", "sort", "search", "find",
]


def _build_vocab(rng: np.random.Generator, size: int = 2000) -> np.ndarray:
    vocab: list[str] = list(_STOPLIKE)
    vocab += ["def", "class", "if", "else", "for", "while", "int", "float",
              "str", "void", "public", "static", "final", "const", "let",
              "var", "function", "self", "this", "new", "try", "except",
              "catch", "raise", "throw", "lambda", "yield", "async", "await"]
    # mixed-case identifiers: camelCase / PascalCase / acronym+digits
    n = len(_WORDS)
    while len(vocab) < size:
        k = len(vocab)
        a, b, c = _WORDS[k % n], _WORDS[(k * 7 + 3) % n], _WORDS[(k * 13 + 5) % n]
        style = k % 8
        if style == 0:
            vocab.append(a + b.capitalize())                      # camelCase
        elif style == 1:
            vocab.append(a.capitalize() + b.capitalize())          # PascalCase
        elif style == 2:
            vocab.append(f"{a}_{b}")                               # snake_case
        elif style == 3:
            vocab.append(f"{a.upper()}{b.capitalize()}{k % 10}")   # HTTPServer2
        elif style == 4:
            vocab.append(f"{a}.{b}({c})")                          # punctuated
        elif style == 5:
            vocab.append(f"{a}={k % 100};")                        # assignment
        elif style == 6:
            vocab.append(str(k * 37 % 10000))                      # number
        else:
            vocab.append(f"{a}-{b}")                               # hyphenated
    vocab[30] = "<b>"
    vocab[31] = "&amp;x"
    vocab[32] = "</b>"
    vocab[33] = "&File"
    return np.array(vocab[:size], dtype=object)


def generate_corpus(n_docs: int, seed: int = 42, dup_frac: float = 0.03) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = _build_vocab(rng)
    v = vocab.size
    ranks = np.arange(1, v + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.05
    probs /= probs.sum()

    lens = np.clip(
        np.round(np.exp(rng.normal(4.0, 1.0, size=n_docs))).astype(np.int64), 5, 2000
    )
    total = int(lens.sum())
    tok_ids = rng.choice(v, size=total, p=probs)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    toks = vocab[tok_ids]
    contents = [" ".join(toks[offsets[d]: offsets[d + 1]]) for d in range(n_docs)]

    # exact duplicates: last dup_frac of docs copy content from earlier docs
    n_dup = int(n_docs * dup_frac)
    if n_dup:
        src = rng.integers(0, n_docs - n_dup, size=n_dup)
        for j, s in enumerate(src):
            contents[n_docs - n_dup + j] = contents[s]

    i = np.arange(n_docs)
    repos = [f"org{a % 7}/repo{a % 23}" for a in i]
    exts = [_EXTS[a % len(_EXTS)] for a in i]
    dirs = [_WORDS[(a * 11 + 2) % len(_WORDS)] for a in i]
    names = [_WORDS[(a * 5 + 1) % len(_WORDS)] + str(a) for a in i]
    paths = [f"src/{d}/{nm}.{e}" for d, nm, e in zip(dirs, names, exts)]
    commits = [hashlib.sha256(f"commit-{r}".encode()).hexdigest()[:40] for r in repos]
    langs = [_LANGS[e] for e in exts]

    return pa.table(
        {
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array(contents, type=pa.string()),
        }
    )


def corpus_path(
    n_docs: int, seed: int = 42, root: str = "/tmp/nexlt_corpus", shards: int = 16
) -> str:
    """Write-once cached corpus under /tmp; returns a DIRECTORY of parquet
    shards (parallel-readable, like a real multi-file corpus; a single giant
    file would serialize the read stage). Row groups are capped at 4096 rows
    so `override_num_blocks` can actually split files — a shard with one
    giant row group is an indivisible read task, and at high CPU counts the
    read stage then runs as one ragged wave (real 100 TB inputs have many
    row groups per file)."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"corpus_n{n_docs}_s{seed}_sh{shards}_rg4096")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        table = generate_corpus(n_docs, seed)
        per = (n_docs + shards - 1) // shards
        for i in range(shards):
            part = table.slice(i * per, per)
            if part.num_rows:
                pq.write_table(
                    part,
                    os.path.join(tmp, f"part-{i:04d}.parquet"),
                    row_group_size=4096,
                )
        os.replace(tmp, path)  # atomic publish: dir exists => complete
    return path


def n_docs_for_sf(sf_dir: str) -> int:
    """Corpus sizes per FIXTURES.md F1: smoke ~1k, correctness ~20k, bench ~200k."""
    name = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": 1_000, "sf0.01": 20_000, "sf0.1": 200_000}.get(name, 20_000)


def reference_queries() -> list[dict]:
    """FIXTURES.md F2: deterministic query set — single terms (rare and
    ubiquitous), multi-term OR (Solr default q.op=OR, schema.xml:1039-1041),
    quoted phrases (UI phrase fq, solrTestLib_v2.js:43-53), mixed-case
    identifiers. k=10 (reference default rows=10, solrconfig.xml:846)."""
    qs = [
        "the",                      # ubiquitous stopword-like
        "import",                   # ubiquitous
        "parse",                    # common word
        "buffer cache",             # multi-term OR
        "http server client",       # multi-term OR
        "getFooBar",                # mixed-case identifier -> word parts
        "HTTPServer2",              # acronym + digit identifier
        "token_stream",             # snake_case
        '"index query"',            # quoted phrase
        '"the import"',             # phrase of ubiquitous terms
        "unpack",                   # rarer word
        "decode encode build",      # OR of mid-freq terms
        "swap",                     # rare-ish
        "0",                        # pure number ubiquitous
        "merge block data file",    # 4-term OR
        '"batch merge"',            # phrase
        "trace",                    # tail term
        "alloc free",               # OR pair
        "Wi-Fi",                    # hyphenated mixed-case (not in vocab: 0 hits ok)
        "query index token",        # OR triple
    ]
    return [{"qid": i, "query": q, "k": 10} for i, q in enumerate(qs)]
