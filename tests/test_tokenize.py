"""Golden token-list tests for the analyzer chains (SURVEY.md §1.4, §2.3 A1)."""

import numpy as np

from nexlt_ray.porter import porter_stem
from nexlt_ray.tokenize import char_filter, tokenize_batch, tokenize_query


def toks(text, profile="code", with_overlaps=True):
    tb = tokenize_batch([text], profile=profile, with_overlaps=with_overlaps)
    order = np.lexsort((tb.terms.astype("U"), tb.positions))
    return [str(t) for t in tb.terms[order]]


def test_word_delimiter_case_change():
    # splitOnCaseChange + catenateWords (reference schema.xml:290)
    assert toks("getFooBar") == ["get", "getfoobar", "foo", "bar"]
    assert toks("WiFi") == ["wi", "wifi", "fi"]


def test_acronym_run():
    # UPPER run followed by Upper+lower: HTTP | Server
    assert toks("HTTPServer") == ["http", "httpserver", "server"]


def test_letter_digit_boundary_and_catenate_numbers():
    assert toks("HTTPServer2") == ["http", "httpserver", "server", "2"]
    # sorted by (position, term): parts 2,4,g,hz at 0..3; cats 24, ghz at pos 0
    assert toks("2.4GHz") == ["2", "24", "ghz", "4", "g", "hz"]


def test_punctuation_split():
    assert toks("token_stream") == ["token", "tokenstream", "stream"]
    assert toks("foo.bar(baz)") == ["foo", "foobarbaz", "bar", "baz"]


def test_html_strip_and_accelerator():
    # char filters: HTMLStrip + PatternReplace &(.) (schema.xml:275-276)
    assert toks("<b>bold</b>") == ["bold"]
    assert toks("&File") == ["file"]
    assert toks("&amp;x") == ["x"]  # &amp; -> & then &x -> x


def test_doc_len_discounts_overlaps():
    tb = tokenize_batch(["WiFi foo"], profile="code")
    # parts: wi, fi, foo (3) — catenated wifi is an overlap
    assert tb.doc_len.tolist() == [3]
    assert tb.terms.size == 4


def test_positions():
    tb = tokenize_batch(["getFoo bar"], profile="code")
    got = {str(t): int(p) for t, p in zip(tb.terms, tb.positions)}
    assert got == {"get": 0, "foo": 1, "getfoo": 0, "bar": 2}


def test_query_chain_no_overlaps():
    assert tokenize_query("WiFi-2.4GHz") == ["wi", "fi", "2", "4", "g", "hz"]
    assert tokenize_query('index query') == ["index", "query"]


def test_simple_profile_sql_parity():
    # exactly string_split_regex(lower(t), '[^a-z0-9]+') minus empties
    assert toks("Foo--bar Baz9 the", profile="simple") == ["foo", "bar", "baz9", "the"]
    assert toks("&amp;x", profile="simple") == ["amp", "x"]
    assert toks("", profile="simple") == []


def test_text_en_stems():
    assert toks("Generalizations were HAPPENING", profile="text_en") == [
        "gener", "were", "happen",
    ]


def test_empty_and_whitespace_docs():
    tb = tokenize_batch(["", "   ", "a"], profile="code")
    assert tb.doc_len.tolist() == [0, 0, 1]


def test_porter_known_vectors():
    # full-pipeline outputs of the published algorithm
    vecs = {
        "caresses": "caress", "ponies": "poni", "caress": "caress", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster", "motoring": "motor",
        "hopping": "hop", "falling": "fall", "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "operator": "oper", "electrical": "electr", "hopefulness": "hope",
        "generalizations": "gener", "replacement": "replac", "dependent": "depend",
        "adoption": "adopt", "communism": "commun", "effective": "effect",
    }
    got = {w: porter_stem(w) for w in vecs}
    assert got == vecs


def test_char_filter_batch():
    import pyarrow as pa

    out = char_filter(pa.array(["<i>x</i> &amp;y", "a & b"])).to_pylist()
    assert out == [" x  y", "a & b"]


def test_doc_token_lengths_matches_tokenize_batch():
    """The count-only stage-1 path must agree with the full tokenizer's
    doc_len on every profile (it feeds the norm byte, which scoring uses)."""
    from nexlt_ray.tokenize import (
        doc_token_lengths,
        doc_token_lengths_by_lang,
        tokenize_batch,
        tokenize_by_lang,
    )

    texts = [
        "getFooBar baz-Quux 123abc",
        "",
        "  <b>html&amp;stuff</b> l'avion ",
        "Die Bücher und Übersetzungen",
        "plain words here the import",
        "WiFi2 Wi-Fi 99 bottles",
    ]
    for profile in ("code", "text_en", "simple", "text_de", "text_fr",
                    "text_es", "cjk_bigram"):
        got = doc_token_lengths(texts, profile)
        exp = tokenize_batch(texts, profile=profile).doc_len
        assert got.tolist() == exp.tolist(), profile
    langs = ["python", "jpn", "eng", "deu", "fra", "spa"]
    got = doc_token_lengths_by_lang(texts, langs)
    exp = tokenize_by_lang(texts, langs).doc_len
    assert got.tolist() == exp.tolist()


def test_tokenize_batch_encoded_equivalence():
    """Integer-coded tokenize must decode to exactly tokenize_batch's
    stream (same tokens, positions, doc assignment) on every profile."""
    from nexlt_ray.tokenize import tokenize_batch, tokenize_batch_encoded

    texts = [
        "getFooBar baz-Quux 123abc Wi-Fi",
        "",
        "<b>html&amp;x</b> The import of the THE",
        "def searchEngine2(): return query_index",
    ]
    for profile in ("code", "text_en", "simple"):
        tb = tokenize_batch(texts, profile=profile)
        eb = tokenize_batch_encoded(texts, profile=profile)
        assert eb.doc_len.tolist() == tb.doc_len.tolist(), profile
        got = sorted(zip(eb.doc_idx.tolist(), eb.positions.tolist(),
                         [str(eb.vocab[c]) for c in eb.codes]))
        exp = sorted(zip(tb.doc_idx.tolist(), tb.positions.tolist(),
                         [str(t) for t in tb.terms]))
        assert got == exp, profile
    # protected words respected
    tb = tokenize_batch(["motoring vehicles"], profile="text_en",
                        protected=frozenset({"motoring"}))
    eb = tokenize_batch_encoded(["motoring vehicles"], profile="text_en",
                                protected=frozenset({"motoring"}))
    assert sorted(str(eb.vocab[c]) for c in eb.codes) == sorted(
        str(t) for t in tb.terms
    )
