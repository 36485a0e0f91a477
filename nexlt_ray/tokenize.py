"""Analyzer chains (tokenizers) — vectorized with pyarrow.compute + numpy.

Re-expresses the reference's index-time analysis for the `enu` field
(`text_en_splitting`, /root/reference/solr/NeXLT/solr/collection1/conf/
schema.xml:273-308):

  1. HTMLStripCharFilter            (schema.xml:275)  -> regex tag strip
  2. PatternReplaceCharFilter &(.)  (schema.xml:276)  -> accelerator removal
  3. WhitespaceTokenizer            (schema.xml:277)
  4. WordDelimiterFilter generateWordParts=1 generateNumberParts=1
     catenateWords=1 catenateNumbers=1 splitOnCaseChange=1 (schema.xml:290)
  5. LowerCaseFilter                (schema.xml:291)
  6. [KeywordMarkerFilter + PorterStemFilter for the `text_en` profile]
     (schema.xml:292-293)

as four precisely-specified profiles (plus a per-language registry,
`profile_for_lang`/`tokenize_by_lang`):

  * ``code``    — steps 1-5 (the identifier/source-code tokenizer; default for
                  the graft corpus). Subword split points: lower->Upper case
                  change, end of an UPPER run followed by Upper+lower,
                  ASCII letter<->digit boundary, any non-[A-Za-z0-9] char.
                  Emitted per whitespace token: each subword part (lowercased,
                  consecutive positions), plus — overlapping at the position of
                  the token's first part — the catenation of its letter chars
                  when it has >=2 letter parts and the catenation of its digit
                  chars when it has >=2 digit parts ("Wi-Fi" -> wi, fi, wifi).
                  doc_len counts only non-overlapping parts (Lucene
                  discountOverlaps discipline).
  * ``text_en`` — ``code`` + Porter stemming of every emitted token (minus
                  tokens in the protected set; reference protwords.txt).
  * ``simple``  — lowercase + split on ``[^a-z0-9]+`` (SQL-parity profile:
                  exactly DuckDB ``string_split_regex(lower(t),'[^a-z0-9]+')``
                  with empty strings removed). Used by the DuckDB-checked
                  oracle queries.
  * ``cjk_bigram`` — NFKC width fold + lowercase + CJK runs as overlapping
                  bigrams (reference CJK chain, schema.xml:501-510).

Query-time analysis is identical minus the catenated (overlapping) tokens,
mirroring the reference's query chain (schema.xml:295-307, catenation off).

Performance: the WordDelimiter regex chain runs over *dictionary-encoded
unique* whitespace tokens (source code and natural text are highly
repetitive), then results are expanded back to occurrences with numpy
gathers — no per-row Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .porter import porter_stem
from .snowball import (
    arabic_stem,
    danish_stem,
    dutch_stem,
    finnish_stem,
    french_stem,
    german_stem,
    italian_stem,
    norwegian_stem,
    portuguese_stem,
    romanian_stem,
    russian_stem,
    spanish_stem,
    swedish_stem,
)
from .stemmers_light import (
    armenian_stem,
    basque_stem,
    bulgarian_stem,
    catalan_stem,
    czech_stem,
    galician_stem,
    greek_stem,
    hebrew_normalize,
    hindi_stem,
    hungarian_stem,
    indonesian_stem,
    latvian_stem,
    persian_normalize,
    slovak_stem,
    turkish_stem,
    vietnamese_norm,
)

PROFILES = (
    "code", "text_en", "simple", "cjk_bigram",
    "text_de", "text_fr", "text_es", "text_it", "text_pt", "text_nl",
    "text_ru", "text_sv", "text_no", "text_da", "text_fi", "text_ja",
    "text_ar",
    "text_ro", "text_hu", "text_tr", "text_cz", "text_el", "text_bg",
    "text_hi", "text_fa", "text_id", "text_lv",
    "text_ca", "text_gl", "text_eu", "text_hy", "text_sk", "text_he",
    "text_vi", "text_th",
    "text_ws", "text_path",
)

# Snowball chains (reference: one SnowballPorterFilter chain per language,
# schema.xml:466-887 — de/fr/es/it/pt/nl/ru/sv/no/da/fi here; the chain is
# StandardTokenizer-ish Unicode word split + lowercase + stemmer, with
# French adding the ElisionFilter)
_LANG_STEMMERS = {
    "text_de": german_stem,
    "text_fr": french_stem,
    "text_es": spanish_stem,
    "text_it": italian_stem,
    "text_pt": portuguese_stem,
    "text_nl": dutch_stem,
    "text_ru": russian_stem,
    "text_sv": swedish_stem,
    "text_no": norwegian_stem,
    "text_da": danish_stem,
    "text_fi": finnish_stem,
    "text_ar": arabic_stem,  # Lucene ArabicNormalization+Larkey light, not Snowball
    "text_ro": romanian_stem,  # Snowball Romanian (verb step approximated)
    # light chains (stemmers_light.py; same documented-analog precedent as
    # text_ar — the reference declares the corresponding Lucene filters,
    # schema.xml text_hu/tr/cz/el/bg/hi/fa/id/lv)
    "text_hu": hungarian_stem,
    "text_tr": turkish_stem,
    "text_cz": czech_stem,
    "text_el": greek_stem,
    "text_bg": bulgarian_stem,
    "text_hi": hindi_stem,
    "text_fa": persian_normalize,  # normalization-only chain (no fa stemmer)
    "text_id": indonesian_stem,
    "text_lv": latvian_stem,
    "text_ca": catalan_stem,   # elision pre-filter + light analog
    "text_gl": galician_stem,
    "text_eu": basque_stem,
    "text_hy": armenian_stem,
    "text_sk": slovak_stem,
    "text_he": hebrew_normalize,  # final-form fold + article strip only
    "text_vi": vietnamese_norm,   # isolating language: no affix stripping
}

# per-language analyzer routing (the reference declares one analyzed field
# per target language, schema.xml:927-960: Chinese/Korean use
# width-normalized bigrams, schema.xml:501-510; Japanese routes to the
# dictionary-light text_ja chain, schema.xml:725-768; English text uses the
# stemming chain; the European languages their Snowball chains; code-ish
# content the WordDelimiter chain)
LANG_PROFILES: dict[str, str] = {
    "chs": "cjk_bigram", "cht": "cjk_bigram",
    "kor": "cjk_bigram", "zh": "cjk_bigram",
    "ko": "cjk_bigram",
    "jpn": "text_ja", "ja": "text_ja",
    "eng": "text_en", "enu": "text_en", "en": "text_en",
    "deu": "text_de", "ger": "text_de", "de": "text_de",
    "fra": "text_fr", "fre": "text_fr", "fr": "text_fr",
    "spa": "text_es", "esp": "text_es", "es": "text_es",
    "ita": "text_it", "it": "text_it",
    "por": "text_pt", "ptb": "text_pt", "pt": "text_pt",
    "nld": "text_nl", "dut": "text_nl", "nl": "text_nl",
    "rus": "text_ru", "ru": "text_ru",
    "swe": "text_sv", "sv": "text_sv",
    "nor": "text_no", "nob": "text_no", "nno": "text_no", "no": "text_no",
    "dan": "text_da", "da": "text_da",
    "fin": "text_fi", "fi": "text_fi",
    "ara": "text_ar", "arb": "text_ar", "ar": "text_ar",
    "ron": "text_ro", "rum": "text_ro", "ro": "text_ro",
    "hun": "text_hu", "hu": "text_hu",
    "tur": "text_tr", "tr": "text_tr",
    "ces": "text_cz", "cze": "text_cz", "cs": "text_cz", "csy": "text_cz",
    "ell": "text_el", "gre": "text_el", "el": "text_el",
    "bul": "text_bg", "bg": "text_bg",
    "hin": "text_hi", "hi": "text_hi",
    "fas": "text_fa", "per": "text_fa", "fa": "text_fa",
    "ind": "text_id", "id": "text_id",
    "lav": "text_lv", "lv": "text_lv",
    "cat": "text_ca", "ca": "text_ca",
    "glg": "text_gl", "gl": "text_gl",
    "eus": "text_eu", "baq": "text_eu", "eu": "text_eu",
    "hye": "text_hy", "arm": "text_hy", "hy": "text_hy",
    "slk": "text_sk", "slo": "text_sk", "sk": "text_sk", "sky": "text_sk",
    "heb": "text_he", "he": "text_he",
    "vie": "text_vi", "vi": "text_vi",
    "tha": "text_th", "th": "text_th",
}


def profile_for_lang(lang: str, default: str = "code") -> str:
    return LANG_PROFILES.get(lang, default)


@dataclass
class TokenizedBatch:
    """Flat token stream for a batch of documents."""

    terms: np.ndarray      # object array of str, one per emitted token
    positions: np.ndarray  # int32 position of each token within its doc
    doc_idx: np.ndarray    # int32 row index (within batch) of each token
    doc_len: np.ndarray    # int32 per input row: # of non-overlapping tokens
    n_docs: int = 0

    def per_doc_terms(self) -> list[list[str]]:
        """Tokens grouped by doc, ordered by (position, term) — test helper."""
        out: list[list[str]] = [[] for _ in range(self.n_docs)]
        order = np.lexsort((self.terms.astype("U"), self.positions, self.doc_idx))
        for i in order:
            out[self.doc_idx[i]].append(str(self.terms[i]))
        return out


_BOUNDARY_PATTERNS = (
    (r"([a-z])([A-Z])", r"\1 \2"),
    (r"([A-Z]+)([A-Z][a-z])", r"\1 \2"),
    (r"([A-Za-z])([0-9])", r"\1 \2"),
    (r"([0-9])([A-Za-z])", r"\1 \2"),
    (r"[^A-Za-z0-9]+", " "),
)


def _as_array(texts) -> pa.Array:
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not isinstance(texts, pa.Array):
        texts = pa.array(list(texts), type=pa.string())
    return texts


def char_filter(texts: pa.Array) -> pa.Array:
    """HTML tag strip + `&amp;`->`&` + accelerator `&x` -> `x` (reference char
    filters, schema.xml:275-276; unescape analog parseJSON.pl:308-312).

    Fast path: rows without '<' or '&' (the overwhelming majority in real
    corpora) skip all three full-string regex passes — one cheap match pass
    instead of three rewrite passes over every byte."""
    needs = pc.fill_null(pc.match_substring_regex(texts, "[<&]"), True)
    n_needs = pc.sum(pc.cast(needs, pa.int8())).as_py() or 0
    if n_needs == 0:
        return texts
    if n_needs < len(texts):
        idx = np.flatnonzero(needs.to_numpy(zero_copy_only=False))
        sub = texts.take(pa.array(idx))
        sub = pc.replace_substring_regex(sub, pattern=r"<[^>]*>", replacement=" ")
        sub = pc.replace_substring_regex(sub, pattern=r"&amp;", replacement="&")
        sub = pc.replace_substring_regex(sub, pattern=r"&([^&\s])", replacement=r"\1")
        out = texts.to_numpy(zero_copy_only=False).copy()
        out[idx] = sub.to_numpy(zero_copy_only=False)
        return pa.array(out, pa.string())
    out = pc.replace_substring_regex(texts, pattern=r"<[^>]*>", replacement=" ")
    out = pc.replace_substring_regex(out, pattern=r"&amp;", replacement="&")
    out = pc.replace_substring_regex(out, pattern=r"&([^&\s])", replacement=r"\1")
    return out


def _offsets_of(list_arr) -> np.ndarray:
    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    return np.asarray(list_arr.offsets)


def _empty(n_docs: int) -> TokenizedBatch:
    return TokenizedBatch(
        terms=np.empty(0, dtype=object),
        positions=np.empty(0, dtype=np.int32),
        doc_idx=np.empty(0, dtype=np.int32),
        doc_len=np.zeros(n_docs, dtype=np.int32),
        n_docs=n_docs,
    )


def _expand(u_off, u_cnt, ids):
    """Gather indices: for occurrence list `ids` into per-unique slices
    [u_off[u], u_off[u]+u_cnt[u]) -> (flat source indices, occ index per out)."""
    counts = u_cnt[ids]
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    occ_of_out = np.repeat(np.arange(ids.size, dtype=np.int64), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    within = np.arange(total, dtype=np.int64) - starts[occ_of_out]
    src = u_off[ids][occ_of_out] + within
    return src, occ_of_out


def tokenize_batch(
    texts,
    profile: str = "code",
    with_overlaps: bool = True,
    protected: frozenset[str] = frozenset(),
) -> TokenizedBatch:
    """Tokenize a batch of strings. ``with_overlaps=False`` gives the
    query-time chain (no catenated tokens)."""
    arr = _as_array(texts)
    n_docs = len(arr)
    if profile == "simple":
        return _tokenize_simple(arr, n_docs)
    if profile == "text_ws":
        return _tokenize_ws(arr, n_docs)
    if profile == "text_path":
        return _tokenize_path(arr, n_docs)
    if profile == "cjk_bigram":
        return _tokenize_cjk(arr, n_docs)
    if profile == "text_th":
        return _tokenize_cjk(arr, n_docs, token_re=_TH_TOKEN_RE)
    if profile == "text_ja":
        return _tokenize_ja(arr, n_docs)
    if profile in _LANG_STEMMERS:
        return _tokenize_stemmed_lang(arr, n_docs, profile, protected)
    if profile not in PROFILES:
        raise ValueError(f"unknown profile {profile!r}")

    filtered = char_filter(arr)
    # NOTE: pyarrow 16.1's utf8_split_whitespace can leak trailing whitespace
    # into the final token of an array under specific buffer layouts (observed
    # on dictionary-encoded batches); trimming first sidesteps the bug.
    ws = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(filtered))
    if isinstance(ws, pa.ChunkedArray):
        ws = ws.combine_chunks()
    tok_flat = ws.values
    # drop empty whitespace tokens (split artifacts on leading/trailing space)
    nonempty = pc.greater(pc.utf8_length(tok_flat), 0)
    tok_offsets = _offsets_of(ws)
    toks_per_doc = np.diff(tok_offsets)
    doc_of_tok = np.repeat(np.arange(n_docs, dtype=np.int64), toks_per_doc)
    ne = nonempty.to_numpy(zero_copy_only=False).astype(bool)
    tok_flat = tok_flat.filter(nonempty)
    doc_of_tok = doc_of_tok[ne]
    n_tok = len(tok_flat)
    if n_tok == 0:
        return _empty(n_docs)

    # --- dictionary-encode: run the WordDelimiter chain on unique tokens only
    dict_arr = pc.dictionary_encode(tok_flat)
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    uniq = dict_arr.dictionary          # unique ws tokens
    ids = np.asarray(dict_arr.indices, dtype=np.int64)

    marked = uniq
    for pat, repl in _BOUNDARY_PATTERNS:
        marked = pc.replace_substring_regex(marked, pattern=pat, replacement=repl)
    marked = pc.utf8_trim_whitespace(pc.utf8_lower(marked))  # see NOTE above
    parts = pc.utf8_split_whitespace(marked)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    p_nonempty = pc.greater(pc.utf8_length(parts.values), 0)
    pne = p_nonempty.to_numpy(zero_copy_only=False).astype(bool)
    u_parts_all = parts.values.to_numpy(zero_copy_only=False)
    p_off_raw = _offsets_of(parts)
    n_uniq = len(uniq)
    u_of_rawpart = np.repeat(np.arange(n_uniq, dtype=np.int64), np.diff(p_off_raw))
    u_parts_flat = u_parts_all[pne]
    u_of_part = u_of_rawpart[pne]
    u_nparts = np.bincount(u_of_part, minlength=n_uniq)
    u_off = np.concatenate(([0], np.cumsum(u_nparts)[:-1]))

    if profile == "text_en" and u_parts_flat.size:
        pu, pinv = np.unique(u_parts_flat.astype("U"), return_inverse=True)
        stemmed = np.array(
            [t if t in protected else porter_stem(str(t)) for t in pu], dtype=object
        )
        u_parts_flat = stemmed[pinv]

    # --- expand parts to occurrences
    src, occ_of_part = _expand(u_off, u_nparts, ids)
    part_terms = u_parts_flat[src]
    doc_of_part = doc_of_tok[occ_of_part]
    doc_len = np.bincount(doc_of_part, minlength=n_docs).astype(np.int32)
    doc_start = np.concatenate(([0], np.cumsum(doc_len.astype(np.int64))[:-1]))
    part_pos = (
        np.arange(part_terms.size, dtype=np.int64) - doc_start[doc_of_part]
    ).astype(np.int32)

    terms_list = [part_terms]
    pos_list = [part_pos]
    idx_list = [doc_of_part.astype(np.int32)]

    if with_overlaps and part_terms.size:
        # per-unique catenations (digit parts start 0-9; others are alpha)
        is_digit = pc.match_substring_regex(
            pa.array(u_parts_flat.astype("U")), "^[0-9]"
        ).to_numpy(zero_copy_only=False).astype(bool)
        n_alpha = np.bincount(u_of_part[~is_digit], minlength=n_uniq)
        n_num = np.bincount(u_of_part[is_digit], minlength=n_uniq)
        u_cat_a = pc.utf8_lower(
            pc.replace_substring_regex(uniq, pattern=r"[^A-Za-z]+", replacement="")
        ).to_numpy(zero_copy_only=False)
        u_cat_n = pc.replace_substring_regex(
            uniq, pattern=r"[^0-9]+", replacement=""
        ).to_numpy(zero_copy_only=False)
        if profile == "text_en":
            u_cat_a = np.array(
                [t if t in protected else porter_stem(str(t)) for t in u_cat_a],
                dtype=object,
            )
        # first-part position per occurrence
        occ_first_pos = np.zeros(ids.size, dtype=np.int32)
        has = u_nparts[ids] > 0
        # position of the first part of each occurrence: find via occ_of_part
        occ_part_start = np.concatenate(([0], np.cumsum(u_nparts[ids])[:-1]))
        occ_first_pos[has] = part_pos[occ_part_start[has]]

        for cat_vals, n_kind in ((u_cat_a, n_alpha), (u_cat_n, n_num)):
            mask = (n_kind[ids] >= 2)
            if mask.any():
                terms_list.append(cat_vals[ids[mask]])
                pos_list.append(occ_first_pos[mask])
                idx_list.append(doc_of_tok[mask].astype(np.int32))

    terms = np.concatenate([np.asarray(t, dtype=object) for t in terms_list])
    positions = np.concatenate(pos_list).astype(np.int32)
    doc_idx = np.concatenate(idx_list).astype(np.int32)
    return TokenizedBatch(terms, positions, doc_idx, doc_len, n_docs)


def _tokenize_simple(arr: pa.Array, n_docs: int) -> TokenizedBatch:
    lower = pc.utf8_lower(arr)
    parts = pc.split_pattern_regex(lower, pattern="[^a-z0-9]+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    nonempty = pc.greater(pc.utf8_length(parts.values), 0)
    keep = nonempty.to_numpy(zero_copy_only=False).astype(bool)
    flat = parts.values.to_numpy(zero_copy_only=False)[keep]
    offsets = _offsets_of(parts)
    per_doc = np.diff(offsets)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), per_doc)[keep]
    doc_len = np.bincount(doc_of, minlength=n_docs).astype(np.int32)
    starts = np.concatenate(([0], np.cumsum(doc_len.astype(np.int64))[:-1]))
    pos = (np.arange(flat.size, dtype=np.int64) - starts[doc_of]).astype(np.int32)
    return TokenizedBatch(
        terms=np.asarray(flat, dtype=object),
        positions=pos,
        doc_idx=doc_of.astype(np.int32),
        doc_len=doc_len,
        n_docs=n_docs,
    )


def _tokenize_ws(arr: pa.Array, n_docs: int) -> TokenizedBatch:
    """text_ws (schema.xml WhitespaceTokenizer, no filters): verbatim
    whitespace-delimited tokens — case preserved, punctuation kept."""
    parts = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(arr))
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    nonempty = pc.greater(pc.utf8_length(parts.values), 0)
    keep = nonempty.to_numpy(zero_copy_only=False).astype(bool)
    flat = parts.values.to_numpy(zero_copy_only=False)[keep]
    offsets = _offsets_of(parts)
    per_doc = np.diff(offsets)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), per_doc)[keep]
    doc_len = np.bincount(doc_of, minlength=n_docs).astype(np.int32)
    starts = np.concatenate(([0], np.cumsum(doc_len.astype(np.int64))[:-1]))
    pos = (np.arange(flat.size, dtype=np.int64) - starts[doc_of]).astype(np.int32)
    return TokenizedBatch(
        terms=np.asarray(flat, dtype=object),
        positions=pos,
        doc_idx=doc_of.astype(np.int32),
        doc_len=doc_len,
        n_docs=n_docs,
    )


def _tokenize_path(arr: pa.Array, n_docs: int) -> TokenizedBatch:
    """text_path (schema.xml PathHierarchyTokenizer): '/a/b/c' emits
    '/a', '/a/b', '/a/b/c'. All prefixes share position 0 (Lucene emits
    them with position increment 0 after the first) so doc_len counts one
    token per path — prefix fq/facet semantics, not phrase material."""
    terms: list[str] = []
    idx: list[int] = []
    doc_len = np.zeros(n_docs, dtype=np.int32)
    for d, text in enumerate(arr.to_pylist()):
        if not text:
            continue
        t = text.rstrip("/")
        segs = [s for s in t.split("/") if s]
        lead = "/" if text.startswith("/") else ""
        acc = ""
        for s in segs:
            acc = f"{acc}/{s}" if acc else f"{lead}{s}"
            terms.append(acc)
            idx.append(d)
        if segs:
            doc_len[d] = 1
    return TokenizedBatch(
        terms=np.asarray(terms, dtype=object),
        positions=np.zeros(len(terms), dtype=np.int32),
        doc_idx=np.asarray(idx, dtype=np.int32),
        doc_len=doc_len,
        n_docs=n_docs,
    )


_FR_ELISION = (
    r"\b([lmtnsjdcLMTNSJDC]|[qQ]u|[jJ]usqu|[qQ]uoiqu|[lL]orsqu|[pP]uisqu)"
    r"['’]"
)


def _stemmed_lang_parts(filtered: pa.Array, profile: str):
    """Shared split for the stemmed-language chains — ONE definition so the
    full tokenizer and doc_token_lengths can never disagree on counts.
    French adds elision; Turkish folds dotted/dotless i BEFORE the generic
    lowercase (utf8_lower maps İ->i+combining-dot, I->i). \\p{M} keeps
    combining marks inside tokens (Devanagari vowel signs / nukta, Arabic
    diacritics) — the per-language normalizers fold or drop them after the
    split."""
    if profile == "text_fr":
        # ElisionFilter analog (reference French chain): l'avion -> avion
        filtered = pc.replace_substring_regex(
            filtered, pattern=_FR_ELISION, replacement=" "
        )
    if profile == "text_ca":
        # Catalan elision (schema text_ca ElisionFilter): d'aigua -> aigua
        filtered = pc.replace_substring_regex(
            filtered, pattern=r"\b[dDlLmMnNsStT]['’]", replacement=" "
        )
    if profile == "text_tr":
        filtered = pc.replace_substring(filtered, "İ", "i")
        filtered = pc.replace_substring(filtered, "I", "ı")
    lower = pc.utf8_lower(filtered)
    parts = pc.split_pattern_regex(lower, pattern=r"[^\p{L}\p{N}\p{M}]+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    return parts


def _tokenize_stemmed_lang(
    arr: pa.Array, n_docs: int, profile: str, protected: frozenset[str]
) -> TokenizedBatch:
    """Snowball language chains (text_de / text_fr / text_es): char filters
    + (French) elision + lowercase + Unicode word split + Snowball stemmer
    over deduped tokens. Same chain at query time (no catenation step)."""
    stem = _LANG_STEMMERS[profile]
    filtered = char_filter(arr)
    parts = _stemmed_lang_parts(filtered, profile)
    nonempty = pc.greater(pc.utf8_length(parts.values), 0)
    keep = nonempty.to_numpy(zero_copy_only=False).astype(bool)
    flat = parts.values.to_numpy(zero_copy_only=False)[keep]
    offsets = _offsets_of(parts)
    per_doc = np.diff(offsets)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), per_doc)[keep]
    if flat.size:
        uniq, inv = np.unique(flat.astype("U"), return_inverse=True)
        stemmed = np.array(
            [t if t in protected else stem(str(t)) for t in uniq], dtype=object
        )
        flat = stemmed[inv]
    doc_len = np.bincount(doc_of, minlength=n_docs).astype(np.int32)
    starts = np.concatenate(([0], np.cumsum(doc_len.astype(np.int64))[:-1]))
    pos = (np.arange(flat.size, dtype=np.int64) - starts[doc_of]).astype(np.int32)
    return TokenizedBatch(
        terms=np.asarray(flat, dtype=object),
        positions=pos,
        doc_idx=doc_of.astype(np.int32),
        doc_len=doc_len,
        n_docs=n_docs,
    )


import re as _re
import unicodedata as _ud

_CJK_RANGES = "㐀-䶿一-鿿぀-ヿ가-힯"
_CJK_TOKEN_RE = _re.compile(f"([A-Za-z0-9]+)|([{_CJK_RANGES}]+)")
# text_th: the reference uses dictionary word-break (ThaiWordFilter); with no
# Thai dictionary in this environment, unsegmented Thai runs emit overlapping
# bigrams — the same recall-preserving fallback the reference itself applies
# to zh/ko (CJKBigram, schema.xml:501-510). Documented deviation.
_TH_TOKEN_RE = _re.compile("([A-Za-z0-9]+)|([฀-๎]+)")


def _tokenize_cjk(arr: pa.Array, n_docs: int, token_re=None) -> TokenizedBatch:
    """CJK analyzer: NFKC width fold (CJKWidthFilter analog) + lowercase +
    StandardTokenizer-ish runs, with CJK runs emitted as overlapping bigrams
    (CJKBigramFilter semantics, reference schema.xml:501-510; single-char
    runs stay unigrams). Per-doc Python loop — the multilingual parity path,
    not the bulk code path; the reference query set for it is short UI
    strings."""
    terms: list[str] = []
    pos: list[int] = []
    idx: list[int] = []
    doc_len = np.zeros(n_docs, dtype=np.int32)
    for d, text in enumerate(arr.to_pylist()):
        if not text:
            continue
        folded = _ud.normalize("NFKC", text).lower()
        p = 0
        for m in (token_re or _CJK_TOKEN_RE).finditer(folded):
            alnum, cjk = m.group(1), m.group(2)
            if alnum:
                terms.append(alnum)
                pos.append(p)
                idx.append(d)
                p += 1
            else:
                if len(cjk) == 1:
                    terms.append(cjk)
                    pos.append(p)
                    idx.append(d)
                    p += 1
                else:
                    for i in range(len(cjk) - 1):
                        terms.append(cjk[i : i + 2])
                        pos.append(p)
                        idx.append(d)
                        p += 1
        doc_len[d] = p
    return TokenizedBatch(
        terms=np.asarray(terms, dtype=object),
        positions=np.asarray(pos, dtype=np.int32),
        doc_idx=np.asarray(idx, dtype=np.int32),
        doc_len=doc_len,
        n_docs=n_docs,
    )


# ---------------------------------------------------------------------------
# Japanese (reference chain: JapaneseTokenizer + POS/stopword filters,
# schema.xml:725-768). Kuromoji's lattice segmentation needs the IPADIC
# dictionary, which is not shippable here; this is the documented
# dictionary-LIGHT approximation: character-class runs (Kuromoji's
# unknown-word heuristic), a built-in function-word lexicon applied
# longest-match over hiragana runs (the JapanesePartOfSpeechStopFilter /
# stopwords_ja analog: particles and auxiliaries drop but still advance the
# position, Lucene StopFilter posInc semantics), katakana/latin runs kept
# whole, and kanji runs split by a common single-kanji suffix list
# (…都/県/市/駅/語/人: 東京都 -> 東京 + 都) with an overlapping-bigram
# fallback for longer runs (the reference's own CJKBigram recall discipline,
# schema.xml:501-510).
# ---------------------------------------------------------------------------

# function words dropped by the chain (public Lucene stopwords_ja.txt /
# POS-stop semantics: particles, copulas, auxiliaries, light verbs)
_JA_DROP = (
    "これら", "それら", "あれら", "という", "ていた", "ている", "でした",
    "ました", "られる", "など", "から", "まで", "より", "です", "ます",
    "した", "して", "する", "いる", "ある", "ない", "こと", "これ",
    "それ", "あれ", "この", "その", "あの", "れる", "たち", "の", "は",
    "が", "を", "に", "で", "と", "も", "へ", "や", "か", "ね", "よ",
    "な", "だ", "た", "て", "し", "れ", "さ", "い",
)
# content-ish hiragana words kept whole when matched (bounded sample of the
# closed high-frequency class; unmatched spans stay whole anyway)
_JA_KEEP = (
    "ください", "わたし", "あなた", "ひと", "とき", "ところ", "もの",
    "よう",
)
_JA_LEX = sorted(
    [(w, False) for w in _JA_DROP] + [(w, True) for w in _JA_KEEP],
    key=lambda x: len(x[0]),
    reverse=True,
)
# single-kanji suffixes that close a compound (public Japanese morphology:
# administrative/locative/agentive suffixes)
_JA_KANJI_SUFFIX = set("都道府県市区町村駅語人的者化学省庁屋家业業社")

_JA_RUN_RE = _re.compile(
    "([a-z0-9]+)"          # latin/digit (post NFKC fold + lowercase)
    "|([㐀-䶿一-鿿々]+)"     # kanji (+ iteration mark)
    "|([぀-ゟ]+)"           # hiragana
    "|([゠-ヿー]+)"          # katakana (+ prolonged sound mark)
)


def _ja_split_hiragana(run: str):
    """Greedy longest-match over the function-word lexicon; yields
    (token, keep) pairs — unmatched spans come out whole with keep=True."""
    out = []
    buf = []
    i = 0
    while i < len(run):
        hit = None
        for w, keep in _JA_LEX:
            if run.startswith(w, i):
                hit = (w, keep)
                break
        if hit is None:
            buf.append(run[i])
            i += 1
            continue
        if buf:
            out.append(("".join(buf), True))
            buf = []
        out.append(hit)
        i += len(hit[0])
    if buf:
        out.append(("".join(buf), True))
    return out


def _ja_split_kanji(run: str):
    """Kanji-run segmentation without a lattice dictionary: short runs stay
    whole (most Japanese nouns are 1-2 kanji); a 3-kanji run ending in a
    closing suffix splits as stem + suffix; anything longer falls back to
    overlapping bigrams (recall-preserving)."""
    n = len(run)
    if n <= 2:
        return [run]
    if n == 3 and run[2] in _JA_KANJI_SUFFIX:
        return [run[:2], run[2]]
    return [run[i : i + 2] for i in range(n - 1)]


def _tokenize_ja(arr: pa.Array, n_docs: int) -> TokenizedBatch:
    terms: list[str] = []
    pos: list[int] = []
    idx: list[int] = []
    doc_len = np.zeros(n_docs, dtype=np.int32)
    for d, text in enumerate(arr.to_pylist()):
        if not text:
            continue
        folded = _ud.normalize("NFKC", text).lower()
        p = 0
        emitted = 0
        for m in _JA_RUN_RE.finditer(folded):
            latin, kanji, hira, kata = m.groups()
            if latin or kata:
                terms.append(latin or kata)
                pos.append(p)
                idx.append(d)
                p += 1
                emitted += 1
            elif kanji:
                for t in _ja_split_kanji(kanji):
                    terms.append(t)
                    pos.append(p)
                    idx.append(d)
                    p += 1
                    emitted += 1
            else:
                for t, keep in _ja_split_hiragana(hira):
                    if keep:
                        terms.append(t)
                        pos.append(p)
                        idx.append(d)
                        emitted += 1
                    p += 1  # dropped function words still advance position
        # norm length counts tokens that reach the index (Lucene
        # FieldInvertState semantics: stopped tokens advance positions but
        # not the field length)
        doc_len[d] = emitted
    return TokenizedBatch(
        terms=np.asarray(terms, dtype=object),
        positions=np.asarray(pos, dtype=np.int32),
        doc_idx=np.asarray(idx, dtype=np.int32),
        doc_len=doc_len,
        n_docs=n_docs,
    )


def tokenize_by_lang(
    texts,
    langs,
    default_profile: str = "code",
    with_overlaps: bool = True,
) -> TokenizedBatch:
    """Per-language analyzer routing over a mixed-language batch (reference:
    one analyzed field per language with its own chain). Splits the batch by
    profile, tokenizes each slice with its chain, and merges back to
    original row numbering."""
    arr = _as_array(texts)
    lang_list = (
        langs.to_pylist() if isinstance(langs, (pa.Array, pa.ChunkedArray)) else list(langs)
    )
    n_docs = len(arr)
    profs = np.asarray([profile_for_lang(l, default_profile) for l in lang_list])
    terms_l, pos_l, idx_l = [], [], []
    doc_len = np.zeros(n_docs, dtype=np.int32)
    for prof in np.unique(profs):
        rows = np.flatnonzero(profs == prof)
        sub = arr.take(pa.array(rows))
        tb = tokenize_batch(sub, profile=str(prof), with_overlaps=with_overlaps)
        terms_l.append(tb.terms)
        pos_l.append(tb.positions)
        idx_l.append(rows[tb.doc_idx].astype(np.int32))
        doc_len[rows] = tb.doc_len
    return TokenizedBatch(
        terms=np.concatenate(terms_l) if terms_l else np.empty(0, object),
        positions=np.concatenate(pos_l).astype(np.int32) if pos_l else np.empty(0, np.int32),
        doc_idx=np.concatenate(idx_l).astype(np.int32) if idx_l else np.empty(0, np.int32),
        doc_len=doc_len,
        n_docs=n_docs,
    )


@dataclass
class EncodedBatch:
    """Token stream as integer codes into a per-batch vocabulary — the
    zero-object-array form for the indexing hot path (materializing 10^7+
    per-occurrence Python strings per batch is pure DRAM traffic; postings
    aggregation only ever needs codes + the small unique vocabulary)."""

    codes: np.ndarray      # int64 vocabulary code per emitted token
    vocab: np.ndarray      # object array of unique term strings
    positions: np.ndarray  # int32 position within doc
    doc_idx: np.ndarray    # int32 row index within batch
    doc_len: np.ndarray    # int32 per row
    n_docs: int = 0


def tokenize_batch_encoded(
    texts,
    profile: str = "code",
    protected: frozenset[str] = frozenset(),
) -> EncodedBatch:
    """tokenize_batch with integer-coded output. Fast path for the
    code/text_en chains (codes flow straight from the unique-token pipeline,
    no per-occurrence string arrays); other profiles fall back to encoding
    tokenize_batch's output."""
    arr = _as_array(texts)
    n_docs = len(arr)
    if profile not in ("code", "text_en"):
        tb = tokenize_batch(arr, profile=profile, protected=protected)
        if tb.terms.size == 0:
            return EncodedBatch(
                np.empty(0, np.int64), np.empty(0, object), tb.positions,
                tb.doc_idx, tb.doc_len, n_docs,
            )
        vocab_u, codes = np.unique(tb.terms.astype("U"), return_inverse=True)
        return EncodedBatch(
            codes.astype(np.int64), vocab_u.astype(object), tb.positions,
            tb.doc_idx, tb.doc_len, n_docs,
        )

    filtered = char_filter(arr)
    ws = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(filtered))
    if isinstance(ws, pa.ChunkedArray):
        ws = ws.combine_chunks()
    tok_flat = ws.values
    nonempty = pc.greater(pc.utf8_length(tok_flat), 0)
    tok_offsets = _offsets_of(ws)
    toks_per_doc = np.diff(tok_offsets)
    doc_of_tok = np.repeat(np.arange(n_docs, dtype=np.int64), toks_per_doc)
    ne = nonempty.to_numpy(zero_copy_only=False).astype(bool)
    tok_flat = tok_flat.filter(nonempty)
    doc_of_tok = doc_of_tok[ne]
    if len(tok_flat) == 0:
        e = _empty(n_docs)
        return EncodedBatch(
            np.empty(0, np.int64), np.empty(0, object), e.positions,
            e.doc_idx, e.doc_len, n_docs,
        )
    dict_arr = pc.dictionary_encode(tok_flat)
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    uniq = dict_arr.dictionary
    ids = np.asarray(dict_arr.indices, dtype=np.int64)

    marked = uniq
    for pat, repl in _BOUNDARY_PATTERNS:
        marked = pc.replace_substring_regex(marked, pattern=pat, replacement=repl)
    marked = pc.utf8_trim_whitespace(pc.utf8_lower(marked))
    parts = pc.utf8_split_whitespace(marked)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    p_nonempty = pc.greater(pc.utf8_length(parts.values), 0)
    pne = p_nonempty.to_numpy(zero_copy_only=False).astype(bool)
    u_parts_all = parts.values.to_numpy(zero_copy_only=False)
    p_off_raw = _offsets_of(parts)
    n_uniq = len(uniq)
    u_of_rawpart = np.repeat(np.arange(n_uniq, dtype=np.int64), np.diff(p_off_raw))
    u_parts_flat = u_parts_all[pne]
    u_of_part = u_of_rawpart[pne]
    u_nparts = np.bincount(u_of_part, minlength=n_uniq)
    u_off = np.concatenate(([0], np.cumsum(u_nparts)[:-1]))

    if profile == "text_en" and u_parts_flat.size:
        pu, pinv = np.unique(u_parts_flat.astype("U"), return_inverse=True)
        stemmed = np.array(
            [t if t in protected else porter_stem(str(t)) for t in pu], dtype=object
        )
        u_parts_flat = stemmed[pinv]

    # unique-level catenations (overlap tokens)
    is_digit = pc.match_substring_regex(
        pa.array(u_parts_flat.astype("U")), "^[0-9]"
    ).to_numpy(zero_copy_only=False).astype(bool) if u_parts_flat.size else (
        np.empty(0, bool)
    )
    n_alpha = np.bincount(u_of_part[~is_digit], minlength=n_uniq)
    n_num = np.bincount(u_of_part[is_digit], minlength=n_uniq)
    u_cat_a = pc.utf8_lower(
        pc.replace_substring_regex(uniq, pattern=r"[^A-Za-z]+", replacement="")
    ).to_numpy(zero_copy_only=False)
    u_cat_n = pc.replace_substring_regex(
        uniq, pattern=r"[^0-9]+", replacement=""
    ).to_numpy(zero_copy_only=False)
    if profile == "text_en":
        u_cat_a = np.array(
            [t if t in protected else porter_stem(str(t)) for t in u_cat_a],
            dtype=object,
        )

    # one vocabulary over parts + catenations (all unique-level, small)
    all_strs = np.concatenate(
        (u_parts_flat.astype("U"), u_cat_a.astype("U"), u_cat_n.astype("U"))
    )
    vocab, all_codes = np.unique(all_strs, return_inverse=True)
    part_code_of_upart = all_codes[: u_parts_flat.size]
    cat_a_code = all_codes[u_parts_flat.size : u_parts_flat.size + len(uniq)]
    cat_n_code = all_codes[u_parts_flat.size + len(uniq) :]

    # expand parts to occurrences — integer gathers only
    src, occ_of_part = _expand(u_off, u_nparts, ids)
    part_codes = part_code_of_upart[src]
    doc_of_part = doc_of_tok[occ_of_part]
    doc_len = np.bincount(doc_of_part, minlength=n_docs).astype(np.int32)
    doc_start = np.concatenate(([0], np.cumsum(doc_len.astype(np.int64))[:-1]))
    part_pos = (
        np.arange(part_codes.size, dtype=np.int64) - doc_start[doc_of_part]
    ).astype(np.int32)

    codes_list = [part_codes]
    pos_list = [part_pos]
    idx_list = [doc_of_part.astype(np.int32)]
    if part_codes.size:
        occ_first_pos = np.zeros(ids.size, dtype=np.int32)
        has = u_nparts[ids] > 0
        occ_part_start = np.concatenate(([0], np.cumsum(u_nparts[ids])[:-1]))
        occ_first_pos[has] = part_pos[occ_part_start[has]]
        for cat_codes, n_kind in ((cat_a_code, n_alpha), (cat_n_code, n_num)):
            mask = n_kind[ids] >= 2
            if mask.any():
                codes_list.append(cat_codes[ids[mask]])
                pos_list.append(occ_first_pos[mask])
                idx_list.append(doc_of_tok[mask].astype(np.int32))
    return EncodedBatch(
        codes=np.concatenate(codes_list).astype(np.int64),
        vocab=vocab.astype(object),
        positions=np.concatenate(pos_list).astype(np.int32),
        doc_idx=np.concatenate(idx_list).astype(np.int32),
        doc_len=doc_len,
        n_docs=n_docs,
    )


def doc_token_lengths(texts, profile: str = "code") -> np.ndarray:
    """Per-doc token counts (the doc_len / norm input) WITHOUT materializing
    per-occurrence term arrays — stage 1 of the build needs only lengths, and
    skipping the object-array expansion roughly halves its string traffic.
    Matches tokenize_batch(...).doc_len exactly (tested)."""
    arr = _as_array(texts)
    n_docs = len(arr)
    if profile in ("cjk_bigram", "text_ja", "text_th", "text_ws", "text_path"):
        # position gaps (ja stop-POS drops) / same-position prefixes (path)
        # make max(pos)+1 wrong; take the chain's own emitted-token counts
        return tokenize_batch(arr, profile=profile).doc_len
    if profile == "simple" or profile in _LANG_STEMMERS:
        if profile in _LANG_STEMMERS:
            parts = _stemmed_lang_parts(char_filter(arr), profile)
        else:
            parts = pc.split_pattern_regex(
                pc.utf8_lower(arr), pattern="[^a-z0-9]+"
            )
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        keep = pc.greater(pc.utf8_length(parts.values), 0).to_numpy(
            zero_copy_only=False
        ).astype(bool)
        per_doc = np.diff(_offsets_of(parts))
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), per_doc)[keep]
        return np.bincount(doc_of, minlength=n_docs).astype(np.int32)
    # code / text_en: unique-token part counts (stemming doesn't change them)
    filtered = char_filter(arr)
    ws = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(filtered))
    if isinstance(ws, pa.ChunkedArray):
        ws = ws.combine_chunks()
    tok_flat = ws.values
    nonempty = pc.greater(pc.utf8_length(tok_flat), 0)
    toks_per_doc = np.diff(_offsets_of(ws))
    doc_of_tok = np.repeat(np.arange(n_docs, dtype=np.int64), toks_per_doc)
    ne = nonempty.to_numpy(zero_copy_only=False).astype(bool)
    tok_flat = tok_flat.filter(nonempty)
    doc_of_tok = doc_of_tok[ne]
    if len(tok_flat) == 0:
        return np.zeros(n_docs, dtype=np.int32)
    dict_arr = pc.dictionary_encode(tok_flat)
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    uniq = dict_arr.dictionary
    ids = np.asarray(dict_arr.indices, dtype=np.int64)
    marked = uniq
    for pat, repl in _BOUNDARY_PATTERNS:
        marked = pc.replace_substring_regex(marked, pattern=pat, replacement=repl)
    marked = pc.utf8_trim_whitespace(marked)
    parts = pc.utf8_split_whitespace(marked)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    pne = pc.greater(pc.utf8_length(parts.values), 0).to_numpy(
        zero_copy_only=False
    ).astype(bool)
    u_of_rawpart = np.repeat(
        np.arange(len(uniq), dtype=np.int64), np.diff(_offsets_of(parts))
    )
    u_nparts = np.bincount(u_of_rawpart[pne], minlength=len(uniq))
    return np.bincount(
        doc_of_tok, weights=u_nparts[ids], minlength=n_docs
    ).astype(np.int32)


def doc_token_lengths_by_lang(texts, langs, default_profile: str = "code") -> np.ndarray:
    """Per-language-routed doc_token_lengths (auto profile)."""
    arr = _as_array(texts)
    lang_list = (
        langs.to_pylist()
        if isinstance(langs, (pa.Array, pa.ChunkedArray))
        else list(langs)
    )
    n_docs = len(arr)
    profs = np.asarray([profile_for_lang(l, default_profile) for l in lang_list])
    doc_len = np.zeros(n_docs, dtype=np.int32)
    for prof in np.unique(profs):
        rows = np.flatnonzero(profs == prof)
        doc_len[rows] = doc_token_lengths(arr.take(pa.array(rows)), str(prof))
    return doc_len


def tokenize_query(
    text: str, profile: str = "code", protected: frozenset[str] = frozenset()
) -> list[str]:
    """Query-time analysis: same chain without overlapping (catenated) tokens."""
    tb = tokenize_batch([text], profile=profile, with_overlaps=False, protected=protected)
    order = np.argsort(tb.positions, kind="stable")
    return [str(t) for t in tb.terms[order]]
