"""Light stemmers and normalizers for the remaining reference analyzer
chains (schema.xml:466-887). Each implements the published algorithm the
reference's Lucene filter is based on, or a documented light analog where
the Lucene filter is dictionary/statistical (same precedent as text_ar,
which ships Larkey's light-10 instead of a vocalized Arabic stemmer):

  * Hungarian  — light analog of Savoy's Hungarian light stemmer (the
    schema runs SnowballPorter(Hungarian) + HungarianLightStem; we ship
    the light layer: case endings with undoubling, possessives, plural).
  * Czech      — Lucene CzechStemmer semantics (Dolamic & Savoy light):
    case endings, possessives, final-cluster palatalization unwind.
  * Bulgarian  — Lucene BulgarianStemmer semantics (Savoy light): definite
    article, plural markers, final-vowel cleanup.
  * Greek      — GreekLowerCase (accent fold + final sigma) + a light
    analog of the GreekStemFilter: common inflectional endings with
    min-stem guards.
  * Turkish    — Turkish-aware lowercase (dotted/dotless i) + a light
    analog of Snowball Turkish: ordered nominal suffix classes (plural,
    case, possessive, copula) with a minimum-stem guard.
  * Hindi      — IndicNormalization/HindiNormalization analog (nukta and
    anusvara folding) + Lucene HindiStemmer's suffix-strip shape
    (Ramanathan & Rao's lightweight stemmer).
  * Persian    — PersianNormalization only (the reference chain has no
    Persian stemmer): Arabic yeh/kaf/heh-hamza folding + diacritic and
    tatweel removal.
  * Indonesian — Tala's Indonesian stemmer shape: particles, possessive
    enclitics, derivational prefixes/suffixes with a syllable-count guard.
  * Latvian    — Lucene LatvianStemmer semantics (light): longest
    declension ending with a two-syllable minimum stem.

One word in, one stem out; tokenize.py dedupes tokens per batch so each
unique token is stemmed once.
"""

from __future__ import annotations

import unicodedata as _ud

# ---------------------------------------------------------------------------
# Hungarian (light)
# ---------------------------------------------------------------------------

_HU_VOWELS = "aáeéiíoóöőuúüű"

# case endings, longest-first; stripped once
_HU_CASE = (
    "képpen", "onként", "enként", "anként", "szerre",
    "képp", "ként", "stul", "stül", "szor", "szer", "ször",
    "ban", "ben", "nak", "nek", "val", "vel", "tól", "től",
    "ról", "ről", "ból", "ből", "hoz", "hez", "höz", "nál", "nél",
    "ba", "be", "ra", "re", "ig", "at", "et", "ot", "öt", "ért",
    "ul", "ül", "vá", "vé", "on", "en", "ön", "án", "én", "kor",
    "n", "t",
)

# possessive endings, longest-first
_HU_POSS = (
    "aitok", "eitek", "jaitok", "jeitek", "aink", "eink", "jaink", "jeink",
    "aik", "eik", "jaik", "jeik", "juk", "jük", "unk", "ünk",
    "aim", "eim", "aid", "eid", "jai", "jei", "ai", "ei",
    "ja", "je", "uk", "ük", "am", "em", "om", "öm", "ad", "ed", "od", "öd",
    "im", "id", "a", "e", "o", "ja", "je", "i",
)

_HU_DOUBLES = (
    "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
    "pp", "rr", "ss", "tt", "vv", "zz",
)


def _hu_fix_final(w: str) -> str:
    if w.endswith("á"):
        return w[:-1] + "a"
    if w.endswith("é"):
        return w[:-1] + "e"
    return w


def _hu_undouble(w: str) -> str:
    for d in _HU_DOUBLES:
        if w.endswith(d):
            if len(d) == 3:  # digraph doubled: ssz -> sz
                return w[:-3] + d[1:]
            return w[:-1]
    return w


def hungarian_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 3:
        return w
    # instrumental -val/-vel assimilation: <double consonant>+al/el
    if w.endswith(("al", "el")) and len(w) >= 5:
        base = w[:-2]
        for d in _HU_DOUBLES:
            if base.endswith(d):
                w = _hu_undouble(base)
                break
    # case ending (once, longest)
    for suf in _HU_CASE:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = _hu_fix_final(w[: -len(suf)])
            break
    # plural or possessive-plural k: ák/ék/ok/ek/ök/ak/k
    for suf in ("ák", "ék", "ok", "ek", "ök", "ak", "k"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = _hu_fix_final(w[: -len(suf)] + ("a" if suf == "ák" else "e" if suf == "ék" else ""))
            break
    # possessive
    for suf in _HU_POSS:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = _hu_fix_final(w[: -len(suf)])
            break
    return w


# ---------------------------------------------------------------------------
# Czech (Lucene CzechStemmer / Dolamic-Savoy light)
# ---------------------------------------------------------------------------

def _cz_palatalize(w: str) -> str:
    if w.endswith(("ci", "ce", "či", "če")):
        return w[:-2] + "k"
    if w.endswith(("zi", "ze", "ži", "že")):
        return w[:-2] + "h"
    if w.endswith(("čtě", "čti", "čtí")):
        return w[:-3] + "ck"
    if w.endswith(("ště", "šti", "ští")):
        return w[:-3] + "sk"
    return w[:-1]


def czech_stem(word: str) -> str:
    w = word.lower()
    # remove case endings
    n = len(w)
    if n > 7 and w.endswith("atech"):
        w = w[:-5]
    elif n > 6 and w.endswith(("ětem", "etem", "atům")):
        w = _cz_palatalize(w[:-3]) if w.endswith(("ětem", "etem")) else w[:-4]
    elif n > 5 and w.endswith((
        "ech", "ich", "ích", "ého", "ěmi", "emi", "ému",
        "ěte", "ete", "ěti", "eti", "ího", "iho", "ími", "ímu", "imu",
        "ách", "ata", "aty", "ých", "ama", "ami", "ové", "ovi", "ými",
    )):
        if w.endswith(("ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
                       "ěti", "eti", "ího", "iho", "ími", "ímu", "imu")):
            w = _cz_palatalize(w[:-2])
        else:
            w = w[:-3]
    elif n > 4 and w.endswith((
        "em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
        "mi", "ou",
    )):
        if w.endswith(("em", "es", "ém", "ím")):
            w = _cz_palatalize(w[:-1])
        else:
            w = w[:-2]
    elif n > 3 and w[-1] in "aeiíěouůyýáé":
        if w[-1] in "eiíě":
            w = _cz_palatalize(w)
        else:
            w = w[:-1]
    # remove possessives
    if len(w) > 5 and w.endswith(("ov", "ův")):
        w = w[:-2]
    elif len(w) > 5 and w.endswith("in"):
        w = _cz_palatalize(w[:-1])
    return w


# ---------------------------------------------------------------------------
# Bulgarian (Lucene BulgarianStemmer / Savoy light)
# ---------------------------------------------------------------------------

def bulgarian_stem(word: str) -> str:
    w = word.lower()
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]
    # definite article
    if len(w) > 6 and w.endswith("ият"):
        w = w[:-3]
    elif len(w) > 5 and w.endswith(("ът", "то", "те", "та", "ия", "ят")):
        w = w[:-2]
    # plural
    if len(w) > 6 and w.endswith("овци"):
        w = w[:-3]  # -> ов
    elif len(w) > 5 and w.endswith("ове"):
        w = w[:-3]
    elif len(w) > 5 and w.endswith("еве"):
        w = w[:-3] + "й"
    elif len(w) > 4 and w.endswith("и") and not w.endswith("еи"):
        w = w[:-1]
    elif len(w) > 4 and w.endswith(("е", "а", "о", "я", "ь")):
        w = w[:-1]
    # е/н syncope: "ен" inserted before final consonant cluster
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]
    return w


# ---------------------------------------------------------------------------
# Greek (GreekLowerCase + light ending removal)
# ---------------------------------------------------------------------------

_EL_ACCENT = str.maketrans("άέήίόύώϊϋΐΰ", "αεηιουωιυιυ")

_EL_ENDINGS = (
    "ιουσ", "ιεισ", "ουσα", "ουμε", "ετε", "εται", "ονται", "ομαι",
    "ιων", "εων", "ουν", "ουσ", "εισ", "ειτε",
    "ματα", "ματοσ", "ματων",
    "οσ", "ον", "ου", "ων", "ησ", "εσ", "ασ", "αι", "οι",
    "α", "η", "ο", "ε", "ι",
)


def greek_lower(word: str) -> str:
    """GreekLowerCaseFilter analog: lowercase, fold accents/diaeresis,
    final sigma to sigma."""
    return word.lower().translate(_EL_ACCENT).replace("ς", "σ")


def greek_stem(word: str) -> str:
    w = greek_lower(word)
    if len(w) < 4:
        return w
    for suf in _EL_ENDINGS:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    return w


# ---------------------------------------------------------------------------
# Turkish (Turkish lowercase + light nominal suffix strip)
# ---------------------------------------------------------------------------

_TR_PLURAL = ("lar", "ler")
_TR_CASE = (
    "ndan", "nden", "ntan", "nten", "dan", "den", "tan", "ten",
    "nın", "nin", "nun", "nün", "ın", "in", "un", "ün",
    "na", "ne", "da", "de", "ta", "te", "ya", "ye",
)
_TR_POSS = ("ımız", "imiz", "umuz", "ümüz", "ınız", "iniz", "unuz", "ünüz",
            "sı", "si", "su", "sü", "ım", "im", "um", "üm", "ı", "i", "u", "ü")
_TR_COPULA = ("dır", "dir", "dur", "dür", "tır", "tir", "tur", "tür")


def turkish_lower(word: str) -> str:
    """TurkishLowerCaseFilter analog: İ -> i, I -> ı, then lowercase."""
    return word.replace("İ", "i").replace("I", "ı").lower()


def turkish_stem(word: str) -> str:
    w = turkish_lower(word)

    def strip(sufs: tuple) -> None:
        nonlocal w
        for suf in sufs:
            if w.endswith(suf) and len(w) - len(suf) >= 2:  # ev, su are stems
                w = w[: -len(suf)]
                return

    strip(_TR_COPULA)
    strip(_TR_PLURAL)
    strip(_TR_CASE)
    strip(_TR_POSS)
    strip(_TR_PLURAL)  # possessive exposes an inner plural: evlerimiz -> evler
    return w


# ---------------------------------------------------------------------------
# Hindi (normalizer + Ramanathan-Rao light suffix strip)
# ---------------------------------------------------------------------------

# NFC leaves Devanagari nukta letters decomposed (they are composition
# exclusions), so normalization = drop the combining nukta (U+093C) and fold
# chandrabindu to anusvara, candra-e and avagraha away — the HindiNormalizer
# shape.
_HI_NORM = str.maketrans({"़": "", "ँ": "ं", "ॅ": "", "ऽ": ""})

_HI_SUFFIXES = (
    "ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयां", "ाइयों", "ाइयाँ",
    "एंगी", "एंगे", "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं",
    "ताएं", "ियाँ", "ियों", "ियां",
    "ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
    "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं", "ुआं",
    "कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती",
    "ता", "ाँ", "ां", "ों", "ें",
    "ो", "े", "ू", "ु", "ी", "ि", "ा",
)


def hindi_normalize(word: str) -> str:
    return _ud.normalize("NFC", word).translate(_HI_NORM)


def hindi_stem(word: str) -> str:
    w = hindi_normalize(word.lower())
    for suf in _HI_SUFFIXES:
        if w.endswith(suf) and len(w) - len(suf) >= 2:
            return w[: -len(suf)]
    return w


# ---------------------------------------------------------------------------
# Persian (normalization only — the reference chain has no stemmer)
# ---------------------------------------------------------------------------

_FA_DIACRITICS = dict.fromkeys(map(ord, "ًٌٍَُِّْـ"))
_FA_NORM = str.maketrans({"ي": "ی", "ى": "ی", "ك": "ک", "ۀ": "ه", "ة": "ه"})


def persian_normalize(word: str) -> str:
    return word.translate(_FA_DIACRITICS).translate(_FA_NORM)


# ---------------------------------------------------------------------------
# Indonesian (Tala's stemmer shape)
# ---------------------------------------------------------------------------

def _id_syllables(w: str) -> int:
    return sum(1 for c in w if c in "aeiou")


def indonesian_stem(word: str) -> str:
    w = word.lower()
    # inflectional particles
    for suf in ("kah", "lah", "pun", "tah"):
        if w.endswith(suf) and _id_syllables(w[: -len(suf)]) >= 2:
            w = w[: -len(suf)]
            break
    # possessive enclitics
    for suf in ("nya", "ku", "mu"):
        if w.endswith(suf) and _id_syllables(w[: -len(suf)]) >= 2:
            w = w[: -len(suf)]
            break
    # derivational prefixes (first order, then second order)
    removed_first = False
    for pre in ("meng", "meny", "men", "mem", "me",
                "peng", "peny", "pen", "pem", "di", "ter", "ke"):
        if w.startswith(pre) and _id_syllables(w[len(pre):]) >= 2:
            w = w[len(pre):]
            removed_first = True
            break
    if not removed_first:
        for pre in ("ber", "be", "per", "pe"):
            if w.startswith(pre) and _id_syllables(w[len(pre):]) >= 2:
                w = w[len(pre):]
                break
    # derivational suffixes
    for suf in ("kan", "an", "i"):
        if w.endswith(suf) and _id_syllables(w[: -len(suf)]) >= 2:
            w = w[: -len(suf)]
            break
    return w


# ---------------------------------------------------------------------------
# Latvian (Lucene LatvianStemmer semantics: longest declension ending,
# two-syllable minimum stem)
# ---------------------------------------------------------------------------

_LV_ENDINGS = (
    "ajiem", "ajām",
    "ajai", "ajos", "ajās", "iem", "ajā", "ais", "iet",
    "ām", "am", "ēm", "īm", "im", "um", "us", "as", "es", "os", "ij",
    "īs", "ēs", "ās", "is",
    "a", "e", "i", "u", "s", "š", "ā", "ē", "ī", "ū", "o",
)


def latvian_stem(word: str) -> str:
    w = word.lower()
    vowels = "aāeēiīouū"
    for suf in _LV_ENDINGS:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if sum(1 for c in stem if c in vowels) >= 1 and len(stem) >= 3:
                return stem
    return w


# ---------------------------------------------------------------------------
# Final tranche — light analogs for the remaining schema chains
# (schema.xml text_ca/gl/eu/hy/sk/he/vi): same documented-analog precedent.
# ---------------------------------------------------------------------------

_CA_ENDINGS = (
    "aments", "ament", "acions", "ació", "adors", "adora", "ador",
    "ances", "ança", "ismes", "isme", "istes", "ista", "itats", "itat",
    "eries", "eria", "ables", "able", "ibles", "ible",
    "osos", "oses", "osa", "ós",
    "es", "os", "is", "s", "a", "e", "í", "ó",
)


def catalan_stem(word: str) -> str:
    """Light analog of Snowball Catalan: longest derivational/plural ending
    with a 3-char minimum stem (elision is handled as a chain pre-filter,
    like French)."""
    w = word.lower()
    for suf in _CA_ENDINGS:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    return w


_GL_ENDINGS = (
    "aciones", "acións", "ación", "amentos", "amento", "adoiras", "adoira",
    "adores", "adora", "ador", "ables", "able", "ismos", "ismo",
    "istas", "ista", "ezas", "eza", "osas", "osa", "osos", "oso",
    "eiras", "eira", "eiros", "eiro",
    "ns", "es", "as", "os", "s", "a", "e", "o",
)


def galician_stem(word: str) -> str:
    """Light analog of the Lucene Galician (RSLP-derived) stemmer: plural
    -ns/-s fold and longest derivational ending, 3-char minimum stem."""
    w = word.lower()
    if w.endswith("ns") and len(w) > 4:  # camións -> camión
        w = w[:-2] + "n"
    for suf in _GL_ENDINGS:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    return w


_EU_ENDINGS = (
    "etakoak", "etako", "etara", "arekin", "entzat", "engatik", "arentzat",
    "etatik", "etan", "aren", "ekin", "ari", "ak", "ek", "en", "ei",
    "tik", "ra", "an", "a", "ko", "k",
)


def basque_stem(word: str) -> str:
    """Light analog of Snowball Basque: longest agglutinated case/article
    ending, 3-char minimum stem."""
    w = word.lower()
    for suf in _EU_ENDINGS:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    return w


_HY_ENDINGS = (
    "ներում", "ները", "ների", "ներով", "ներ", "երում", "երը", "երի",
    "երով", "եր", "ում", "ով", "ից", "ին", "ի", "ը", "ն",
)


def armenian_stem(word: str) -> str:
    """Light analog of Snowball Armenian: plural (ներ/եր) and case endings,
    3-char minimum stem."""
    w = word.lower()
    for suf in _HY_ENDINGS:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    return w


_SK_ENDINGS = (
    "iami", "ami", "ách", "och", "ích", "ého", "ému", "ími", "ovi", "ové",
    "ých", "om", "ov", "mi", "ou", "ám", "ím", "ym", "ým",
    "a", "e", "i", "o", "u", "y", "á", "é", "í", "ó", "ú", "ý", "ie",
)


def slovak_stem(word: str) -> str:
    """Light analog for the schema's Slovak chain (no official Snowball
    Slovak exists; Czech-like case-ending removal without palatalization)."""
    w = word.lower()
    for suf in sorted(_SK_ENDINGS, key=len, reverse=True):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    return w


_HE_FINALS = str.maketrans("ךםןףץ", "כמנפצ")


def hebrew_normalize(word: str) -> str:
    """Minimal Hebrew chain (the schema's 'Hebrew Snowball' has no public
    algorithm): fold final-letter forms and strip the definite article /
    single-letter conjunction prefixes when a 3+ char stem remains."""
    w = word.translate(_HE_FINALS)
    for pre in ("וה", "ה", "ו", "ב", "ל", "מ", "ש", "כ"):
        if w.startswith(pre) and len(w) - len(pre) >= 3:
            return w[len(pre):]
    return w


def vietnamese_norm(word: str) -> str:
    """Vietnamese chain: standard tokenization + lowercase only (the
    schema's 'Vietnamese Snowball' has no public algorithm; Vietnamese is
    isolating — no affix stripping)."""
    return word.lower()
