"""Per-language analyzer routing end-to-end (reference: one analyzer chain
per language field, schema.xml:466-887; CJK bigrams schema.xml:501-510)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from nexlt_ray.tokenize import tokenize_batch, tokenize_by_lang, tokenize_query


def toks(text, profile):
    tb = tokenize_batch([text], profile=profile)
    order = np.lexsort((tb.terms.astype("U"), tb.positions))
    return [str(t) for t in tb.terms[order]]


def test_cjk_bigrams():
    assert toks("東京都", "cjk_bigram") == ["東京", "京都"]
    assert toks("日本 ABC 東", "cjk_bigram") == ["日本", "abc", "東"]
    # width folding: fullwidth ASCII folds to halfwidth (NFKC)
    assert toks("ＡＢＣ", "cjk_bigram") == ["abc"]
    assert toks("", "cjk_bigram") == []


def test_cjk_positions_phraselike():
    tb = tokenize_batch(["東京都 パリ"], profile="cjk_bigram")
    got = {str(t): int(p) for t, p in zip(tb.terms, tb.positions)}
    assert got == {"東京": 0, "京都": 1, "パリ": 2}
    assert tb.doc_len.tolist() == [3]


def test_tokenize_by_lang_routing():
    texts = ["getFooBar", "東京都", "Generalizations", "東京都"]
    langs = ["python", "jpn", "eng", "zh"]
    tb = tokenize_by_lang(texts, langs)
    per = tb.per_doc_terms()
    assert per[0] == ["get", "getfoobar", "foo", "bar"]  # code chain
    assert per[1] == ["東京", "都"]    # ja chain: suffix-split compound
    assert per[2] == ["gener"]        # text_en chain
    assert per[3] == ["東京", "京都"]  # zh keeps the CJK bigram chain


def test_auto_profile_build_and_query(ray_session, tmp_path):
    """Mixed-language corpus -> auto-profile index -> per-language queries
    rank-identical to the oracle."""
    import hashlib

    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.oracle import OracleIndex
    from nexlt_ray.query import IndexReader

    rows = []
    for i in range(120):
        if i % 3 == 0:
            rows.append(("jpn", f"東京都 の 検索 エンジン {i % 7} テスト"))
        elif i % 3 == 1:
            rows.append(("eng", f"searching engines generally tested {i % 5} times"))
        else:
            rows.append(("python", f"def searchEngine{i % 4}(): return query_index"))
    t = pa.table(
        {
            "repo": pa.array([f"org{i%3}/r" for i in range(120)]),
            "path": pa.array([f"f{i}.txt" for i in range(120)]),
            "commit": pa.array(["c" * 40] * 120),
            "lang": pa.array([l for l, _ in rows]),
            "content": pa.array([c for _, c in rows]),
        }
    )
    src = str(tmp_path / "ml.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "idx_ml")
    m = build_index(src, idx, BuildConfig(profile="auto", num_doc_buckets=4,
                                          num_term_buckets=2))
    r = IndexReader(idx)
    meta = pq.read_table(f"{idx}/docstore")
    did = (
        np.asarray(m["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    o = OracleIndex(
        list(zip(did.tolist(), meta["content"].to_pylist())),
        profile="auto",
        langs=meta["lang"].to_pylist(),
    )
    cases = [("東京", "jpn"), ('"東京 検索"'.replace(" ", ""), "jpn"),
             ("searching", "eng"), ("generally tested", "eng"),
             ("searchEngine2", "python"), ("query_index", "python")]
    for q, lang in cases:
        got = r.search(q, k=10, lang=lang)
        exp = [(d, float(np.float32(s))) for d, s in o.search(q, k=10, lang=lang)]
        assert got == exp, (q, lang)
    # cross-analyzer reality check: the jpn text matched via bigrams
    assert r.match_count("東京", lang="jpn") == 7  # 7 distinct contents after dedup


def test_snowball_stemmer_units():
    """Hand-checked Snowball outputs (public algorithm, snowballstem.org):
    conflation classes the reference's per-language chains rely on."""
    from nexlt_ray.snowball import french_stem, german_stem, spanish_stem

    # German: plural/derivation conflation + umlaut/ß folding
    assert german_stem("bücher") == german_stem("buch") == "buch"
    assert german_stem("aufgaben") == german_stem("aufgabe") == "aufgab"
    assert german_stem("übersetzungen") == german_stem("übersetzung")
    assert german_stem("straße") == "strass"
    assert german_stem("dankbarkeit") == "dankbar"
    # French: derivation conflation + elision handled in the chain
    assert french_stem("continuation") == french_stem("continuer") == "continu"
    assert french_stem("majestueux") == french_stem("majestueuse")
    assert french_stem("nationale") == french_stem("national")
    # Spanish: verb forms + derivational suffixes
    assert spanish_stem("cantando") == spanish_stem("cantar") == "cant"
    assert spanish_stem("comiendo") == spanish_stem("comer") == "com"
    assert spanish_stem("rápidamente") == "rapid"
    assert spanish_stem("traducción") == spanish_stem("traducciones")


def test_lang_chain_tokenization():
    # Unicode-aware split keeps accented words whole; French elision strips
    # the article; each chain stems with its language's Snowball
    assert toks("Die Bücher und Aufgaben", "text_de") == sorted(
        ["die", "buch", "und", "aufgab"], key=str
    ) or toks("Die Bücher und Aufgaben", "text_de") == ["die", "buch", "und", "aufgab"]
    tb = tokenize_batch(["l'avion d'essai"], profile="text_fr")
    assert "avion" in {str(t) for t in tb.terms}
    assert "l" not in {str(t) for t in tb.terms}
    q = tokenize_query("Bücher", profile="text_de")
    assert q == ["buch"]


def test_snowball_profiles_rank_identity(ray_session, tmp_path):
    """German/French/Spanish Snowball chains end-to-end: auto-profile build
    routes deu/fra/spa, and WAND == oracle per language."""
    import pyarrow.parquet as pq_

    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.oracle import OracleIndex
    from nexlt_ray.query import IndexReader

    rows = []
    for i in range(90):
        if i % 3 == 0:
            rows.append(("deu", f"die übersetzung der bücher {i % 5} aufgaben"))
        elif i % 3 == 1:
            rows.append(("fra", f"la continuation des traductions {i % 4} nationales"))
        else:
            rows.append(("spa", f"la traducción de los documentos {i % 6} generosidad"))
    t = pa.table(
        {
            "repo": pa.array([f"org{i%2}/r" for i in range(90)]),
            "path": pa.array([f"f{i}.txt" for i in range(90)]),
            "commit": pa.array(["c" * 40] * 90),
            "lang": pa.array([l for l, _ in rows]),
            "content": pa.array([c for _, c in rows]),
        }
    )
    src = str(tmp_path / "sn.parquet")
    pq_.write_table(t, src)
    idx = str(tmp_path / "idx_sn")
    m = build_index(src, idx, BuildConfig(profile="auto", num_doc_buckets=4,
                                          num_term_buckets=2))
    r = IndexReader(idx)
    meta = pq_.read_table(f"{idx}/docstore")
    did = (
        np.asarray(m["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    o = OracleIndex(
        list(zip(did.tolist(), meta["content"].to_pylist())),
        profile="auto",
        langs=meta["lang"].to_pylist(),
    )
    cases = [("Bücher", "deu"), ("übersetzungen", "deu"),
             ("continuer", "fra"), ("traduction nationale", "fra"),
             ("traducciones", "spa"), ("generoso documento", "spa")]
    for q, lang in cases:
        got = r.search(q, k=10, lang=lang)
        exp = [(d, float(np.float32(s))) for d, s in o.search(q, k=10, lang=lang)]
        assert got == exp, (q, lang)
        assert got, (q, lang)  # stemming actually conflates -> non-empty


def test_snowball_extended_languages():
    """Italian/Portuguese/Dutch/Russian Snowball chains: conflation classes
    + fuzz-no-crash + chain tokenization (Cyrillic word split)."""
    from nexlt_ray.snowball import (
        dutch_stem, italian_stem, portuguese_stem, russian_stem,
    )

    assert italian_stem("abbandonata") == italian_stem("abbandonare") == "abbandon"
    assert italian_stem("nazionale") == italian_stem("nazionali")
    assert portuguese_stem("cantava") == portuguese_stem("cantar") == "cant"
    assert portuguese_stem("trabalhando") == portuguese_stem("trabalhar")
    assert dutch_stem("boeken") == dutch_stem("boek") == "boek"
    assert dutch_stem("lichamelijk") == dutch_stem("lichamelijke")
    assert russian_stem("книгами") == russian_stem("книга") == "книг"
    assert russian_stem("переводов") == russian_stem("перевод")
    import random
    rng = random.Random(1)
    pool = "abcdefghijàèìòùãõçáéíóúäëïöüабвгдежзиклмнопрстуфхцчшщыьэюя"
    for f in (italian_stem, portuguese_stem, dutch_stem, russian_stem):
        for _ in range(3000):
            w = "".join(rng.choice(pool) for _ in range(rng.randint(0, 10)))
            assert isinstance(f(w), str)
    # chain: Cyrillic tokenization + stemming through the profile
    assert toks("Перевод книгами", "text_ru") == ["перевод", "книг"]
    assert toks("le traduzioni nazionali", "text_it") == ["le", "traduzion", "nazional"]


def test_snowball_scandinavian_finnish_units():
    """Swedish/Norwegian/Danish/Finnish chains (schema.xml:466-887):
    hand-traced conflation classes of the published algorithms."""
    from nexlt_ray.snowball import (
        danish_stem, finnish_stem, norwegian_stem, swedish_stem,
    )

    assert swedish_stem("flickorna") == swedish_stem("flickor") == \
        swedish_stem("flicka") == "flick"
    assert swedish_stem("bilarna") == swedish_stem("bilar") == \
        swedish_stem("bil") == "bil"
    assert swedish_stem("möjligheterna") == swedish_stem("möjlighet")
    assert swedish_stem("vänligt") == swedish_stem("vänlig")
    assert swedish_stem("husens") == swedish_stem("hus") == "hus"

    assert norwegian_stem("bøkene") == norwegian_stem("bøker") == "bøk"
    assert norwegian_stem("huset") == norwegian_stem("husene") == \
        norwegian_stem("hus") == "hus"
    assert norwegian_stem("kastede") == norwegian_stem("kastet") == \
        norwegian_stem("kaste") == "kast"

    assert danish_stem("bøgerne") == danish_stem("bøger") == "bøg"
    assert danish_stem("huset") == danish_stem("husene") == \
        danish_stem("hus") == "hus"
    assert danish_stem("venligst") == danish_stem("venlig") == "ven"
    assert danish_stem("løsningerne") == danish_stem("løsninger") == \
        danish_stem("løsning") == "løsning"

    assert finnish_stem("talossa") == finnish_stem("talot") == \
        finnish_stem("taloissa") == finnish_stem("talo") == "talo"
    assert finnish_stem("kirjat") == finnish_stem("kirja") == \
        finnish_stem("kirjassa") == "kirj"
    assert finnish_stem("järjestelmä") == finnish_stem("järjestelmän")
    assert finnish_stem("tyttö") == finnish_stem("tytöt") == "tytö"

    import random
    rng = random.Random(7)
    pool = "abcdefghijklmnopqrstuvwxyzäåöæøéü"
    from nexlt_ray.snowball import (
        danish_stem as d, finnish_stem as f, norwegian_stem as n,
        swedish_stem as s,
    )
    for fn in (s, n, d, f):
        for _ in range(3000):
            w = "".join(rng.choice(pool) for _ in range(rng.randint(0, 12)))
            assert isinstance(fn(w), str)


def test_scandinavian_finnish_rank_identity(ray_session, tmp_path):
    """sv/no/da/fi chains end-to-end: auto-profile routing + WAND == oracle
    (the same per-language discipline as the seven previously shipped)."""
    import pyarrow.parquet as pq_

    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.oracle import OracleIndex
    from nexlt_ray.query import IndexReader

    rows = []
    for i in range(120):
        m = i % 4
        if m == 0:
            rows.append(("swe", f"flickorna läser böckerna {i % 5} gånger"))
        elif m == 1:
            rows.append(("nor", f"bøkene ble kastet {i % 4} ganger"))
        elif m == 2:
            rows.append(("dan", f"løsningerne er venlige {i % 6} gange"))
        else:
            rows.append(("fin", f"kirjat ovat talossa {i % 3} kertaa"))
    t = pa.table(
        {
            "repo": pa.array([f"org{i%2}/r" for i in range(120)]),
            "path": pa.array([f"f{i}.txt" for i in range(120)]),
            "commit": pa.array(["c" * 40] * 120),
            "lang": pa.array([l for l, _ in rows]),
            "content": pa.array([c for _, c in rows]),
        }
    )
    src = str(tmp_path / "scfi.parquet")
    pq_.write_table(t, src)
    idx = str(tmp_path / "idx_scfi")
    m = build_index(src, idx, BuildConfig(profile="auto", num_doc_buckets=4,
                                          num_term_buckets=2))
    r = IndexReader(idx)
    meta = pq_.read_table(f"{idx}/docstore")
    did = (
        np.asarray(m["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    o = OracleIndex(
        list(zip(did.tolist(), meta["content"].to_pylist())),
        profile="auto",
        langs=meta["lang"].to_pylist(),
    )
    cases = [("flickan", "swe"), ("bok läsning"[:3], "swe"),
             ("boken", "nor"), ("kastede", "nor"),
             ("venlig løsning", "dan"),
             ("kirja", "fin"), ("taloissa", "fin")]
    for q, lang in cases:
        got = r.search(q, k=10, lang=lang)
        exp = [(d_, float(np.float32(s_))) for d_, s_ in o.search(q, k=10, lang=lang)]
        assert got == exp, (q, lang)
    # stemming actually conflates: query inflection != corpus inflection
    assert r.search("kirja", k=10, lang="fin")      # corpus has "kirjat"
    assert r.search("venlig", k=10, lang="dan")     # corpus has "venlige"
    assert r.search("kastede", k=10, lang="nor")    # corpus has "kastet"


def test_japanese_chain_units():
    """text_ja (schema.xml:725-768 JapaneseTokenizer + POS-stop analog):
    char-class runs, particle drop with position gaps, katakana whole,
    kanji suffix split, bigram fallback for long kanji runs."""
    tb = tokenize_batch(["東京都の検索エンジンはテストです"], profile="text_ja")
    got = {str(t): int(p) for t, p in zip(tb.terms, tb.positions)}
    # particles の/は and copula です drop but leave position gaps
    assert got == {"東京": 0, "都": 1, "検索": 3, "エンジン": 4, "テスト": 6}
    # norm length counts only emitted tokens (Lucene FieldInvertState)
    assert tb.doc_len.tolist() == [5]
    # katakana words stay whole (vs cjk_bigram's パリ -> パリ unigram ok,
    # コンピュータ -> 5 bigrams)
    assert toks("コンピュータ", "text_ja") == ["コンピュータ"]
    # 2-kanji nouns stay whole; 4+ kanji fall back to bigrams
    assert toks("日本", "text_ja") == ["日本"]
    assert toks("国際関係", "text_ja") == ["国際", "際関", "関係"]
    # fullwidth folds (NFKC), latin lowercases
    assert toks("ＡＢＣ テスト", "text_ja") == ["abc", "テスト"]


def test_japanese_rank_identity(ray_session, tmp_path):
    """ja fixtures end-to-end: auto-profile build routes jpn -> text_ja and
    WAND == exhaustive == oracle, including a Japanese phrase query."""
    import pyarrow.parquet as pq_

    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.oracle import OracleIndex
    from nexlt_ray.query import IndexReader

    rows = []
    for i in range(80):
        if i % 2 == 0:
            rows.append(("jpn", f"東京都の検索エンジンは {i % 5} 件のテストです"))
        else:
            rows.append(("jpn", f"大阪の翻訳システムが {i % 3} 回動作します"))
    t = pa.table(
        {
            "repo": pa.array([f"org{i%2}/r" for i in range(80)]),
            "path": pa.array([f"f{i}.txt" for i in range(80)]),
            "commit": pa.array(["c" * 40] * 80),
            "lang": pa.array([l for l, _ in rows]),
            "content": pa.array([c for _, c in rows]),
        }
    )
    src = str(tmp_path / "ja.parquet")
    pq_.write_table(t, src)
    idx = str(tmp_path / "idx_ja")
    m = build_index(src, idx, BuildConfig(profile="auto", num_doc_buckets=4,
                                          num_term_buckets=2))
    r = IndexReader(idx)
    meta = pq_.read_table(f"{idx}/docstore")
    did = (
        np.asarray(m["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    o = OracleIndex(
        list(zip(did.tolist(), meta["content"].to_pylist())),
        profile="auto",
        langs=meta["lang"].to_pylist(),
    )
    for q in ("東京", "検索", "翻訳", "テスト", "大阪 翻訳", '"東京都"'):
        got = r.search(q, k=10, lang="jpn")
        exp = [(d, float(np.float32(s))) for d, s in o.search(q, k=10, lang="jpn")]
        assert got == exp, q
        assert got, q
    # the compound query 東京 matches docs containing 東京都 (suffix split) —
    # the recall case plain whole-run tokenization would lose. 40 rows
    # dedup to 5 distinct contents ({i % 5}).
    assert r.match_count("東京", lang="jpn") == 5


def test_arabic_chain(ray_session, tmp_path):
    """text_ar: Lucene ArabicNormalizationFilter + Larkey light-10 stemmer
    semantics (public Lucene source): diacritic/tatweel removal, alef/yeh/
    teh-marbuta normalization, definite-article prefix strip, plural/
    feminine suffix strips — plus end-to-end rank identity."""
    from nexlt_ray.snowball import arabic_stem

    assert arabic_stem("الكتاب") == arabic_stem("كتاب")
    assert arabic_stem("المكتبات") == arabic_stem("مكتبه")
    assert arabic_stem("والمستخدمون") == arabic_stem("مستخدم")
    assert arabic_stem("كِتَاب") == arabic_stem("كتاب")  # diacritics
    assert toks("المستخدمون في المكتبات", "text_ar") == [
        "مستخدم", "في", "مكتب"
    ]

    import pyarrow.parquet as pq_

    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.oracle import OracleIndex
    from nexlt_ray.query import IndexReader

    rows = [("ara", f"المستخدمون في المكتبات {i % 4} كتاب") for i in range(40)]
    t = pa.table(
        {
            "repo": pa.array([f"org{i%2}/r" for i in range(40)]),
            "path": pa.array([f"f{i}.txt" for i in range(40)]),
            "commit": pa.array(["c" * 40] * 40),
            "lang": pa.array([l for l, _ in rows]),
            "content": pa.array([c for _, c in rows]),
        }
    )
    src = str(tmp_path / "ar.parquet")
    pq_.write_table(t, src)
    idx = str(tmp_path / "idx_ar")
    m = build_index(src, idx, BuildConfig(profile="auto", num_doc_buckets=4,
                                          num_term_buckets=2))
    r = IndexReader(idx)
    meta = pq_.read_table(f"{idx}/docstore")
    did = (
        np.asarray(m["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    o = OracleIndex(
        list(zip(did.tolist(), meta["content"].to_pylist())),
        profile="auto",
        langs=meta["lang"].to_pylist(),
    )
    for q in ("مكتبه", "الكتاب", "مستخدم"):
        got = r.search(q, k=10, lang="ara")
        exp = [(d, float(np.float32(s))) for d, s in o.search(q, k=10, lang="ara")]
        assert got == exp, q
        assert got, q  # normalization conflates query form with corpus form


def test_light_chain_units():
    """Round-3 tranche (schema.xml text_ro/hu/tr/cz/el/bg/hi/fa/id/lv):
    each chain conflates inflected forms to one stem."""
    from nexlt_ray.snowball import romanian_stem
    from nexlt_ray.stemmers_light import (
        bulgarian_stem, czech_stem, greek_stem, hindi_stem, hungarian_stem,
        indonesian_stem, latvian_stem, persian_normalize, turkish_stem,
    )

    # Romanian (Snowball): noun + article forms conflate
    assert romanian_stem("românul") == romanian_stem("românii") == \
        romanian_stem("români") == "român"
    assert romanian_stem("lucrez") == romanian_stem("lucrează") == \
        romanian_stem("lucrare") == "lucr"
    assert romanian_stem("abilităţi") == romanian_stem("abilitate") == "abil"
    # Hungarian: case / plural / possessive strip
    assert hungarian_stem("házakban") == hungarian_stem("házak") == \
        hungarian_stem("ház") == "ház"
    assert hungarian_stem("könyveket") == hungarian_stem("könyvek") == "könyv"
    # Turkish: lowercase folding + plural/possessive/case
    assert turkish_stem("İstanbul") == "istanbul"
    assert turkish_stem("evlerimizden") == turkish_stem("evler") == \
        turkish_stem("ev") == "ev"
    assert turkish_stem("kitaplar") == turkish_stem("kitap") == "kitap"
    # Czech: case endings + palatalization unwind
    assert czech_stem("ženami") == czech_stem("ženy") == czech_stem("žena")
    assert czech_stem("městech") == czech_stem("město")
    # Greek: accent fold, final sigma, ending strip
    assert greek_stem("Ελληνικός") == greek_stem("ελληνικη") == "ελληνικ"
    assert greek_stem("γλώσσας") == greek_stem("γλωσσα")
    # Bulgarian: definite article + plural
    assert bulgarian_stem("градовете") == bulgarian_stem("град") == "град"
    assert bulgarian_stem("книгата") == bulgarian_stem("книга")
    # Hindi: nukta fold + suffix strip
    assert hindi_stem("लड़कियाँ") == hindi_stem("लड़की")
    assert hindi_stem("किताबों") == hindi_stem("किताब")
    # Persian: Arabic-script normalization (ي->ی, ك->ک)
    assert persian_normalize("كتاب") == "کتاب"
    assert persian_normalize("فارسي") == "فارسی"
    # Indonesian: prefix + suffix + enclitic
    assert indonesian_stem("membacakan") == indonesian_stem("membaca") == \
        indonesian_stem("baca") == "baca"
    assert indonesian_stem("bukunya") == indonesian_stem("buku") == "buku"
    # Latvian: declension endings
    assert latvian_stem("grāmatas") == latvian_stem("grāmata") == "grāmat"
    assert latvian_stem("latviešiem") == latvian_stem("latvieši")


def test_light_chain_rank_identity(ray_session, tmp_path):
    """Round-3 language tranche end-to-end: auto-profile routing + WAND ==
    oracle (same discipline as the earlier shipped chains)."""
    import pyarrow.parquet as pq_

    from nexlt_ray.build import BuildConfig, build_index
    from nexlt_ray.oracle import OracleIndex
    from nexlt_ray.query import IndexReader

    fixtures = [
        ("ron", "românii lucrează împreună {} ore"),
        ("hun", "a házakban könyveket olvasnak {} órán"),
        ("tur", "evlerimizden kitaplar aldık {} kere"),
        ("ces", "ženami ve městech pracují {} hodin"),
        ("ell", "η γλώσσας των ανθρώπων {} ώρες"),
        ("bul", "градовете и книгата растат {} часа"),
        ("hin", "लड़कियाँ किताबों पढ़ती हैं {}"),
        ("fas", "كتاب فارسي خواندن {}"),
        ("ind", "membacakan bukunya bersama {} jam"),
        ("lav", "grāmatas latviešiem valodā {} stundas"),
    ]
    rows = [
        (lang, tpl.format(i % 4))
        for i in range(200)
        for lang, tpl in [fixtures[i % len(fixtures)]]
    ]
    t = pa.table(
        {
            "repo": pa.array([f"org{i%2}/r" for i in range(len(rows))]),
            "path": pa.array([f"f{i}.txt" for i in range(len(rows))]),
            "commit": pa.array(["c" * 40] * len(rows)),
            "lang": pa.array([l for l, _ in rows]),
            "content": pa.array([c for _, c in rows]),
        }
    )
    src = str(tmp_path / "light.parquet")
    pq_.write_table(t, src)
    idx = str(tmp_path / "idx_light")
    m = build_index(src, idx, BuildConfig(profile="auto", num_doc_buckets=4,
                                          num_term_buckets=2))
    r = IndexReader(idx)
    meta = pq_.read_table(f"{idx}/docstore")
    did = (
        np.asarray(m["doc_offsets"])[np.asarray(meta["doc_bucket"])]
        + np.asarray(meta["local_rank"])
    )
    o = OracleIndex(
        list(zip(did.tolist(), meta["content"].to_pylist())),
        profile="auto",
        langs=meta["lang"].to_pylist(),
    )
    cases = [
        ("românul lucrare", "ron"), ("ház könyv", "hun"),
        ("ev kitap", "tur"), ("žena město", "ces"),
        ("γλώσσα άνθρωπος", "ell"), ("град книга", "bul"),
        ("लड़की किताब", "hin"), ("کتاب فارسی", "fas"),
        ("baca buku", "ind"), ("grāmata latvieši", "lav"),
    ]
    for q, lang in cases:
        got = r.search(q, k=10, lang=lang)
        exp = [(d_, float(np.float32(s_))) for d_, s_ in o.search(q, k=10, lang=lang)]
        assert got == exp, (q, lang)
        assert got, (q, lang)  # stemming conflates: inflection-mismatched hits


def test_ws_and_path_chains():
    """text_ws (whitespace verbatim) and text_path (hierarchy prefixes,
    schema.xml PathHierarchyTokenizer) chains."""
    from nexlt_ray.tokenize import doc_token_lengths

    tb = tokenize_batch(["Foo BAR  baz,qux "], profile="text_ws")
    assert [str(t) for t in tb.terms] == ["Foo", "BAR", "baz,qux"]
    assert tb.doc_len.tolist() == [3]

    tb = tokenize_batch(["/usr/share/doc", "rel/a.txt", ""], profile="text_path")
    per = [[] for _ in range(3)]
    for t, d in zip(tb.terms, tb.doc_idx):
        per[d].append(str(t))
    assert per[0] == ["/usr", "/usr/share", "/usr/share/doc"]
    assert per[1] == ["rel", "rel/a.txt"]
    assert per[2] == []
    # all prefixes share position 0; doc_len counts one per path
    assert set(tb.positions.tolist()) <= {0}
    assert tb.doc_len.tolist() == [1, 1, 0]
    assert doc_token_lengths(["/usr/share/doc", ""], profile="text_path").tolist() == [1, 0]


def test_final_tranche_chains():
    """ca/gl/eu/hy/sk/he/vi/th chains (schema.xml final tranche)."""
    from nexlt_ray.stemmers_light import (
        armenian_stem, basque_stem, catalan_stem, galician_stem,
        hebrew_normalize, slovak_stem, vietnamese_norm,
    )

    assert catalan_stem("catalanes") == catalan_stem("catalana") == "catalan"
    assert galician_stem("galegas") == galician_stem("galega") == "galeg"
    assert galician_stem("camións") == galician_stem("camión")
    assert basque_stem("etxeetan") == basque_stem("etxea") == \
        basque_stem("etxe") == "etxe"
    assert armenian_stem("գրքերը") == armenian_stem("գրքերի")
    assert slovak_stem("ženami") == slovak_stem("ženy") == "žen"
    assert hebrew_normalize("הספרים") == "ספרימ"  # article strip + final fold
    assert vietnamese_norm("Tiếng") == "tiếng"
    # Catalan elision is a chain-level pre-filter
    tb = tokenize_batch(["l'aigua d'institucions"], profile="text_ca")
    assert "l" not in {str(t) for t in tb.terms}
    # Thai: bigram fallback over unsegmented runs (documented deviation)
    tb = tokenize_batch(["ภาษาไทย"], profile="text_th")
    assert all(len(str(t)) == 2 for t in tb.terms) and len(tb.terms) >= 5
