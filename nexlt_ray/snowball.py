"""Snowball stemmers — pure-Python implementations of the published Snowball
algorithms (public descriptions at snowballstem.org; the reference's
per-language analyzer chains declare the corresponding Lucene
SnowballPorterFilter / language stemmers, schema.xml:466-887): German,
French, Spanish, Italian, Portuguese, Dutch, Russian, Swedish, Norwegian,
Danish and Finnish.

One word in, one stem out; callers (tokenize.py) dedupe tokens first so each
unique token is stemmed once per batch. All follow the same skeleton: mark
regions R1/R2 (RV for Romance/Russian; the min-3 adjustment for the
Scandinavian trio), strip suffix classes longest-match-first, then clean up
markers/accents.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# shared region helpers
# ---------------------------------------------------------------------------


def _r1_r2(word: str, vowels: str) -> tuple[int, int]:
    """Standard Snowball R1/R2: R1 starts after the first non-vowel that
    follows a vowel; R2 is R1-of-R1."""

    def after_vc(start: int) -> int:
        n = len(word)
        i = start
        while i < n and word[i] not in vowels:
            i += 1
        while i < n and word[i] in vowels:
            i += 1
        # i now at first non-vowel after a vowel (or end)
        return min(i + 1, n) if i < n else n

    r1 = after_vc(0)
    r2 = after_vc(r1)
    return r1, r2


def _ends(word: str, suffix: str) -> bool:
    return word.endswith(suffix)


# ---------------------------------------------------------------------------
# German  (reference chain: schema.xml German SnowballPorterFilter)
# ---------------------------------------------------------------------------

_DE_VOWELS = "aeiouyäöü"
_DE_S_ENDING = "bdfghklmnrt"
_DE_ST_ENDING = "bdfghklmnt"


def german_stem(word: str) -> str:
    w = word.lower().replace("ß", "ss")
    # mark u/y between vowels as consonants (upper-case marker)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_VOWELS and chars[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)

    r1, r2 = _r1_r2(w.lower(), _DE_VOWELS)
    # Snowball German: R1 start is adjusted to >= 3
    r1 = max(r1, min(3, len(w)))

    def in_r1(i: int) -> bool:
        return i >= r1

    def in_r2(i: int) -> bool:
        return i >= r2

    lw = w.lower()

    # step 1
    done = False
    for suf in ("ern", "em", "er"):
        if lw.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
            lw = w.lower()
            done = True
            break
    if not done:
        for suf in ("en", "es", "e"):
            if lw.endswith(suf) and in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
                lw = w.lower()
                if lw.endswith("niss"):
                    w = w[:-1]
                    lw = w.lower()
                done = True
                break
    if not done:
        if (
            lw.endswith("s")
            and in_r1(len(w) - 1)
            and len(w) >= 2
            and lw[-2] in _DE_S_ENDING
        ):
            w = w[:-1]
            lw = w.lower()

    # step 2
    done = False
    for suf in ("est", "en", "er"):
        if lw.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
            lw = w.lower()
            done = True
            break
    if not done:
        if (
            lw.endswith("st")
            and in_r1(len(w) - 2)
            and len(w) >= 6
            and lw[-3] in _DE_ST_ENDING
        ):
            w = w[:-2]
            lw = w.lower()

    # step 3 (d-suffixes)
    if lw.endswith(("end", "ung")):
        if in_r2(len(w) - 3):
            w = w[:-3]
            lw = w.lower()
            if lw.endswith("ig") and in_r2(len(w) - 2) and not lw.endswith("eig"):
                w = w[:-2]
                lw = w.lower()
    elif lw.endswith(("isch",)):
        if in_r2(len(w) - 4) and not lw.endswith("eisch"):
            w = w[:-4]
            lw = w.lower()
    elif lw.endswith(("ig", "ik")):
        if in_r2(len(w) - 2) and not lw.endswith(("eig", "eik")):
            w = w[:-2]
            lw = w.lower()
    elif lw.endswith(("lich", "heit")):
        if in_r2(len(w) - 4):
            w = w[:-4]
            lw = w.lower()
            for pre in ("er", "en"):
                if lw.endswith(pre) and in_r1(len(w) - 2):
                    w = w[:-2]
                    lw = w.lower()
                    break
    elif lw.endswith("keit"):
        if in_r2(len(w) - 4):
            w = w[:-4]
            lw = w.lower()
            if lw.endswith("lich") and in_r2(len(w) - 4):
                w = w[:-4]
            elif lw.endswith("ig") and in_r2(len(w) - 2):
                w = w[:-2]

    # finalize: unmark + unumlaut
    out = []
    for c in w:
        if c in "UY":
            c = c.lower()
        out.append({"ä": "a", "ö": "o", "ü": "u"}.get(c, c))
    return "".join(out)


# ---------------------------------------------------------------------------
# French  (reference chain: schema.xml French stemmer + elision filter)
# ---------------------------------------------------------------------------

_FR_VOWELS = "aeiouyâàëéêèïîôûù"


def _fr_mark(word: str) -> str:
    chars = list(word)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        prev_v = i > 0 and chars[i - 1].lower() in _FR_VOWELS
        next_v = i + 1 < n and chars[i + 1].lower() in _FR_VOWELS
        if c in "ui" and prev_v and next_v:
            chars[i] = c.upper()
        elif c == "y" and (prev_v or next_v):
            chars[i] = "Y"
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    return "".join(chars)


def _fr_rv(lw: str) -> int:
    n = len(lw)
    if n >= 3 and lw[0] in _FR_VOWELS and lw[1] in _FR_VOWELS:
        return 3
    if lw[:3] in ("par", "col", "tap"):
        return 3
    # region after the first vowel not at the beginning
    for i in range(1, n):
        if lw[i] in _FR_VOWELS:
            return i + 1
    return n


def french_stem(word: str) -> str:  # noqa: C901 (faithful to the spec's shape)
    w = _fr_mark(word.lower())
    lw = w.lower()
    r1, r2 = _r1_r2(lw, _FR_VOWELS)
    rv = _fr_rv(lw)

    def in_r1(i):
        return i >= r1

    def in_r2(i):
        return i >= r2

    def in_rv(i):
        return i >= rv

    changed = False
    step1_done = False

    def try_step1(w: str) -> tuple[str, bool, bool]:
        """Returns (word, changed, found_mn) where found_mn marks the
        amment/emment/ment(s) family (step 2a still allowed after those)."""
        lw = w.lower()
        suffixes = sorted(
            [
                "ance", "iqUe", "isme", "able", "iste", "eux", "ances",
                "iqUes", "ismes", "ables", "istes", "atrice", "ateur",
                "ation", "atrices", "ateurs", "ations", "logie", "logies",
                "usion", "ution", "usions", "utions", "ence", "ences",
                "ement", "ements", "ité", "ités", "if", "ive", "ifs",
                "ives", "eaux", "aux", "euse", "euses", "issement",
                "issements", "amment", "emment", "ment", "ments",
            ],
            key=len,
            reverse=True,
        )
        for suf in suffixes:
            if not w.endswith(suf):
                continue
            i = len(w) - len(suf)
            base = w[:i]
            lbase = base.lower()
            if suf in ("ance", "iqUe", "isme", "able", "iste", "eux",
                       "ances", "iqUes", "ismes", "ables", "istes"):
                if in_r2(i):
                    return base, True, False
            elif suf in ("atrice", "ateur", "ation", "atrices", "ateurs",
                         "ations"):
                if in_r2(i):
                    w2 = base
                    if w2.lower().endswith("ic"):
                        if in_r2(len(w2) - 2):
                            w2 = w2[:-2]
                        else:
                            w2 = w2[:-2] + "iqU"
                    return w2, True, False
            elif suf in ("logie", "logies"):
                if in_r2(i):
                    return base + "log", True, False
            elif suf in ("usion", "ution", "usions", "utions"):
                if in_r2(i):
                    return base + "u", True, False
            elif suf in ("ence", "ences"):
                if in_r2(i):
                    return base + "ent", True, False
            elif suf in ("ement", "ements"):
                if in_rv(i):
                    w2 = base
                    lb = w2.lower()
                    if lb.endswith("iv") and in_r2(len(w2) - 2):
                        w2 = w2[:-2]
                        if w2.lower().endswith("at") and in_r2(len(w2) - 2):
                            w2 = w2[:-2]
                    elif lb.endswith("eus"):
                        if in_r2(len(w2) - 3):
                            w2 = w2[:-3]
                        elif in_r1(len(w2) - 3):
                            w2 = w2[:-3] + "eux"
                    elif lb.endswith("abl") and in_r2(len(w2) - 3):
                        w2 = w2[:-3]
                    elif w2.endswith("iqU") and in_r2(len(w2) - 3):
                        w2 = w2[:-3]
                    elif lb.endswith("ièr") or w2.endswith("Ièr"):
                        if in_rv(len(w2) - 3):
                            w2 = w2[:-3] + "i"
                    return w2, True, False
            elif suf in ("ité", "ités"):
                if in_r2(i):
                    w2 = base
                    lb = w2.lower()
                    if lb.endswith("abil"):
                        if in_r2(len(w2) - 4):
                            w2 = w2[:-4]
                        else:
                            w2 = w2[:-4] + "abl"
                    elif lb.endswith("ic"):
                        if in_r2(len(w2) - 2):
                            w2 = w2[:-2]
                        else:
                            w2 = w2[:-2] + "iqU"
                    elif lb.endswith("iv") and in_r2(len(w2) - 2):
                        w2 = w2[:-2]
                    return w2, True, False
            elif suf in ("if", "ive", "ifs", "ives"):
                if in_r2(i):
                    w2 = base
                    if w2.lower().endswith("at") and in_r2(len(w2) - 2):
                        w2 = w2[:-2]
                        if w2.lower().endswith("ic"):
                            if in_r2(len(w2) - 2):
                                w2 = w2[:-2]
                            else:
                                w2 = w2[:-2] + "iqU"
                    return w2, True, False
            elif suf == "eaux":
                return base + "eau", True, False
            elif suf == "aux":
                if in_r1(i):
                    return base + "al", True, False
            elif suf in ("euse", "euses"):
                if in_r2(i):
                    return base, True, False
                if in_r1(i):
                    return base + "eux", True, False
            elif suf in ("issement", "issements"):
                if in_r1(i) and i > 0 and lbase[-1] not in _FR_VOWELS:
                    return base, True, False
            elif suf == "amment":
                if in_rv(i):
                    return base + "ant", True, True
            elif suf == "emment":
                if in_rv(i):
                    return base + "ent", True, True
            elif suf in ("ment", "ments"):
                if i > 0 and lbase[-1] in _FR_VOWELS and in_rv(i - 1):
                    return base, True, True
        return w, False, False

    w1, ch1, allow2a = try_step1(w)
    step2_applied = False
    if not ch1 or allow2a:
        # step 2a: verb suffixes beginning i
        lw1 = w1.lower()
        sufs_2a = sorted(
            [
                "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
                "iraIent", "irais", "irait", "iras", "irent", "irez",
                "iriez", "irions", "irons", "iront", "is", "issaIent",
                "issais", "issait", "issant", "issante", "issantes",
                "issants", "isse", "issent", "isses", "issez", "issiez",
                "issions", "issons", "it",
            ],
            key=len,
            reverse=True,
        )
        done2a = False
        for suf in sufs_2a:
            if w1.endswith(suf):
                i = len(w1) - len(suf)
                if in_rv(i) and i > 0 and lw1[i - 1] not in _FR_VOWELS and in_rv(i - 1):
                    w1 = w1[:i]
                    done2a = True
                    step2_applied = True
                    break
        if not done2a:
            # step 2b
            lw1 = w1.lower()
            sufs_2b = sorted(
                [
                    "ions", "é", "ée", "ées", "és", "èrent", "er", "era",
                    "erai", "eraIent", "erais", "erait", "eras", "erez",
                    "eriez", "erions", "erons", "eront", "ez", "iez",
                    "âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait",
                    "ant", "ante", "antes", "ants", "as", "asse", "assent",
                    "asses", "assiez", "assions",
                ],
                key=len,
                reverse=True,
            )
            for suf in sufs_2b:
                if not w1.endswith(suf):
                    continue
                i = len(w1) - len(suf)
                if not in_rv(i):
                    continue
                if suf == "ions":
                    if in_r2(i):
                        w1 = w1[:i]
                        step2_applied = True
                    else:
                        continue
                elif suf in ("é", "ée", "ées", "és", "èrent", "er", "era",
                             "erai", "eraIent", "erais", "erait", "eras",
                             "erez", "eriez", "erions", "erons", "eront",
                             "ez", "iez"):
                    w1 = w1[:i]
                    step2_applied = True
                else:
                    w1 = w1[:i]
                    if w1.lower().endswith("e") and in_rv(len(w1) - 1):
                        w1 = w1[:-1]
                    step2_applied = True
                break

    changed = ch1 or step2_applied
    w = w1
    lw = w.lower()

    if changed:
        # step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4 (residual)
        lw = w.lower()
        if lw.endswith("s") and len(w) >= 2 and lw[-2] not in "aiouès":
            w = w[:-1]
            lw = w.lower()
        if lw.endswith("ion") and in_r2(len(w) - 3) and len(w) >= 4 and lw[-4] in "st" and in_rv(len(w) - 4):
            w = w[:-3]
        else:
            for suf, rep in (("ière", "i"), ("Ière", "i"), ("ier", "i"),
                             ("Ier", "i")):
                if w.endswith(suf) and in_rv(len(w) - len(suf)):
                    w = w[: -len(suf)] + rep
                    break
            else:
                if lw.endswith("e") and in_rv(len(w) - 1):
                    w = w[:-1]
                elif lw.endswith("ë") and in_rv(len(w) - 1) and w[-3:-1].lower() == "gu":
                    w = w[:-1]

    # step 5: undouble
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if w.lower().endswith(end):
            w = w[:-1]
            break

    # step 6: un-accent é/è followed only by non-vowels
    chars = list(w)
    i = len(chars) - 1
    seen_nonvowel = False
    while i >= 0:
        c = chars[i].lower()
        if c in _FR_VOWELS:
            if c in "éè" and seen_nonvowel:
                chars[i] = "e"
            break
        seen_nonvowel = True
        i -= 1
    w = "".join(chars)
    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


# ---------------------------------------------------------------------------
# Spanish  (reference chain: schema.xml Spanish SnowballPorterFilter)
# ---------------------------------------------------------------------------

_ES_VOWELS = "aeiouáéíóúü"


def _es_rv(lw: str) -> int:
    n = len(lw)
    if n < 3:
        return n
    if lw[1] not in _ES_VOWELS:
        # consonant in 2nd position: RV after the next vowel
        for i in range(2, n):
            if lw[i] in _ES_VOWELS:
                return i + 1
        return n
    if lw[0] in _ES_VOWELS and lw[1] in _ES_VOWELS:
        # two vowels at start: RV after the next consonant
        for i in range(2, n):
            if lw[i] not in _ES_VOWELS:
                return i + 1
        return n
    return 3


_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")


def spanish_stem(word: str) -> str:  # noqa: C901 (faithful to the spec's shape)
    w = word.lower()
    r1, r2 = _r1_r2(w, _ES_VOWELS)
    rv = _es_rv(w)

    def in_r1(i):
        return i >= r1

    def in_r2(i):
        return i >= r2

    def in_rv(i):
        return i >= rv

    # step 0: attached pronouns
    pronouns = ("selas", "selos", "sela", "selo", "las", "les", "los", "nos",
                "me", "se", "la", "le", "lo")
    for p in pronouns:
        if not w.endswith(p):
            continue
        base = w[: -len(p)]
        matched = False
        for pre, rep in (("iéndo", "iendo"), ("ándo", "ando"), ("ár", "ar"),
                         ("ér", "er"), ("ír", "ir")):
            if base.endswith(pre) and in_rv(len(base) - len(pre)):
                w = base[: -len(pre)] + rep
                matched = True
                break
        if not matched:
            for pre in ("iendo", "ando", "ar", "er", "ir"):
                if base.endswith(pre) and in_rv(len(base) - len(pre)):
                    w = base
                    matched = True
                    break
        if not matched and base.endswith("yendo") and base[: -5].endswith("u"):
            w = base
            matched = True
        if matched:
            break

    # step 1: standard suffixes (longest match)
    step1 = False
    sufs = sorted(
        [
            "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
            "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
            "osos", "osas", "amiento", "amientos", "imiento", "imientos",
            "adora", "ador", "ación", "adoras", "adores", "aciones",
            "ante", "antes", "ancia", "ancias", "logía", "logías",
            "ución", "uciones", "encia", "encias", "amente", "mente",
            "idad", "idades", "iva", "ivo", "ivas", "ivos",
        ],
        key=len,
        reverse=True,
    )
    for suf in sufs:
        if not w.endswith(suf):
            continue
        i = len(w) - len(suf)
        base = w[:i]
        if suf in ("anza", "anzas", "ico", "ica", "icos", "icas", "ismo",
                   "ismos", "able", "ables", "ible", "ibles", "ista",
                   "istas", "oso", "osa", "osos", "osas", "amiento",
                   "amientos", "imiento", "imientos"):
            if in_r2(i):
                w = base
                step1 = True
        elif suf in ("adora", "ador", "ación", "adoras", "adores",
                     "aciones", "ante", "antes", "ancia", "ancias"):
            if in_r2(i):
                w = base
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
                step1 = True
        elif suf in ("logía", "logías"):
            if in_r2(i):
                w = base + "log"
                step1 = True
        elif suf in ("ución", "uciones"):
            if in_r2(i):
                w = base + "u"
                step1 = True
        elif suf in ("encia", "encias"):
            if in_r2(i):
                w = base + "ente"
                step1 = True
        elif suf == "amente":
            if in_r1(i):
                w = base
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and in_r2(len(w) - 2):
                            w = w[:-2]
                            break
                step1 = True
        elif suf == "mente":
            if in_r2(i):
                w = base
                for pre in ("ante", "able", "ible"):
                    if w.endswith(pre) and in_r2(len(w) - 4):
                        w = w[:-4]
                        break
                step1 = True
        elif suf in ("idad", "idades"):
            if in_r2(i):
                w = base
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break
                step1 = True
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(i):
                w = base
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                step1 = True
        if step1:
            break

    # step 2a: verb suffixes beginning y (only if step 1 did nothing)
    step2a = False
    if not step1:
        for suf in sorted(("ya", "ye", "yan", "yen", "yeron", "yendo", "yo",
                           "yó", "yas", "yes", "yais", "yamos"),
                          key=len, reverse=True):
            if w.endswith(suf):
                i = len(w) - len(suf)
                if in_rv(i) and i > 0 and w[i - 1] == "u":
                    w = w[:i]
                    step2a = True
                break

    # step 2b (only if neither step 1 nor 2a changed the word)
    if not step1 and not step2a:
        gu_sufs = ("en", "es", "éis", "emos")
        sufs2 = sorted(
            [
                "arían", "arías", "arán", "arás", "aríais", "aría",
                "aréis", "aríamos", "aremos", "ará", "aré", "erían",
                "erías", "erán", "erás", "eríais", "ería", "eréis",
                "eríamos", "eremos", "erá", "eré", "irían", "irías",
                "irán", "irás", "iríais", "iría", "iréis", "iríamos",
                "iremos", "irá", "iré", "aba", "ada", "ida", "ía", "ara",
                "iera", "ad", "ed", "id", "ase", "iese", "aste", "iste",
                "an", "aban", "ían", "aran", "ieran", "asen", "iesen",
                "aron", "ieron", "ado", "ido", "ando", "iendo", "ió",
                "ar", "er", "ir", "as", "abas", "adas", "idas", "ías",
                "aras", "ieras", "ases", "ieses", "ís", "áis", "abais",
                "íais", "arais", "ierais", "aseis", "ieseis", "asteis",
                "isteis", "ados", "idos", "amos", "ábamos", "íamos",
                "imos", "áramos", "iéramos", "iésemos", "ásemos",
                "en", "es", "éis", "emos",
            ],
            key=len,
            reverse=True,
        )
        for suf in sufs2:
            if w.endswith(suf):
                i = len(w) - len(suf)
                if in_rv(i):
                    w = w[:i]
                    if suf in gu_sufs and w.endswith("gu"):
                        w = w[:-1]
                break

    # step 3: residual suffix
    for suf in ("os", "a", "o", "á", "í", "ó"):
        if w.endswith(suf):
            i = len(w) - len(suf)
            if in_rv(i):
                w = w[:i]
            break
    else:
        for suf in ("e", "é"):
            if w.endswith(suf):
                i = len(w) - 1
                if in_rv(i):
                    w = w[:i]
                    if w.endswith("gu") and in_rv(len(w) - 1):
                        w = w[:-1]
                break

    return w.translate(_ES_UNACCENT)


# ---------------------------------------------------------------------------
# Italian  (reference chain: schema.xml Italian SnowballPorterFilter)
# ---------------------------------------------------------------------------

_IT_VOWELS = "aeiouàèìòù"


def _it_rv_r1_r2(w: str) -> tuple[int, int, int]:
    rv = _es_like_rv(w, _IT_VOWELS)
    r1, r2 = _r1_r2(w, _IT_VOWELS)
    return rv, r1, r2


def _es_like_rv(lw: str, vowels: str) -> int:
    n = len(lw)
    if n < 3:
        return n
    if lw[1] not in vowels:
        for i in range(2, n):
            if lw[i] in vowels:
                return i + 1
        return n
    if lw[0] in vowels and lw[1] in vowels:
        for i in range(2, n):
            if lw[i] not in vowels:
                return i + 1
        return n
    return 3


_IT_ACUTE = str.maketrans("áéíóúÁÉÍÓÚ", "àèìòùàèìòù")

_IT_PRONOUNS = (
    "gliela", "gliele", "glieli", "glielo", "gliene", "sene",
    "mela", "mele", "meli", "melo", "mene", "tela", "tele", "teli",
    "telo", "tene", "cela", "cele", "celi", "celo", "cene", "vela",
    "vele", "veli", "velo", "vene",
    "gli", "ci", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
)


def italian_stem(word: str) -> str:  # noqa: C901 (faithful to the spec's shape)
    w = word.lower().translate(_IT_ACUTE)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "ui" and chars[i - 1] in _IT_VOWELS and chars[i + 1] in _IT_VOWELS:
            chars[i] = chars[i].upper()
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
    w = "".join(chars)
    lw = w.lower()
    rv, r1, r2 = _it_rv_r1_r2(lw)

    def in_rv(i):
        return i >= rv

    def in_r1(i):
        return i >= r1

    def in_r2(i):
        return i >= r2

    # step 0: attached pronouns after ando/endo (delete) or ar/er/ir (-> e)
    for p in sorted(_IT_PRONOUNS, key=len, reverse=True):
        if not lw.endswith(p):
            continue
        base = w[: -len(p)]
        lb = base.lower()
        if (lb.endswith("ando") or lb.endswith("endo")) and in_rv(len(base) - 4):
            w = base
        elif (
            lb.endswith(("ar", "er", "ir")) and in_rv(len(base) - 2)
        ):
            w = base + "e"
        break
    lw = w.lower()

    # step 1: standard suffixes
    step1 = False
    sufs = sorted(
        [
            "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
            "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
            "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
            "ose", "mente", "atrice", "atrici", "ante", "anti",
            "azione", "azioni", "atore", "atori", "logia", "logie",
            "uzione", "uzioni", "usione", "usioni", "enza", "enze",
            "amento", "amenti", "imento", "imenti", "amente", "ità",
            "ivo", "ivi", "iva", "ive",
        ],
        key=len,
        reverse=True,
    )
    for suf in sufs:
        if not lw.endswith(suf):
            continue
        i = len(w) - len(suf)
        base = w[:i]
        lb = base.lower()
        if suf in ("anza", "anze", "ico", "ici", "ica", "ice", "iche",
                   "ichi", "ismo", "ismi", "abile", "abili", "ibile",
                   "ibili", "ista", "iste", "isti", "istà", "istè", "istì",
                   "oso", "osi", "osa", "ose", "mente", "atrice", "atrici",
                   "ante", "anti"):
            if in_r2(i):
                w = base
                step1 = True
        elif suf in ("azione", "azioni", "atore", "atori"):
            if in_r2(i):
                w = base
                if w.lower().endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
                step1 = True
        elif suf in ("logia", "logie"):
            if in_r2(i):
                w = base + "log"
                step1 = True
        elif suf in ("uzione", "uzioni", "usione", "usioni"):
            if in_r2(i):
                w = base + "u"
                step1 = True
        elif suf in ("enza", "enze"):
            if in_r2(i):
                w = base + "ente"
                step1 = True
        elif suf in ("amento", "amenti", "imento", "imenti"):
            if in_rv(i):
                w = base
                step1 = True
        elif suf == "amente":
            if in_r1(i):
                w = base
                lb = w.lower()
                if lb.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.lower().endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic"):
                        if lb.endswith(pre) and in_r2(len(w) - 2):
                            w = w[:-2]
                            break
                    else:
                        if lb.endswith("abil") and in_r2(len(w) - 4):
                            w = w[:-4]
                step1 = True
        elif suf == "ità":
            if in_r2(i):
                w = base
                lb = w.lower()
                if lb.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
                elif lb.endswith(("ic", "iv")) and in_r2(len(w) - 2):
                    w = w[:-2]
                step1 = True
        elif suf in ("ivo", "ivi", "iva", "ive"):
            if in_r2(i):
                w = base
                if w.lower().endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.lower().endswith("ic") and in_r2(len(w) - 2):
                        w = w[:-2]
                step1 = True
        if step1:
            break
    lw = w.lower()

    # step 2: verb suffixes (only if step 1 removed nothing)
    if not step1:
        verb_sufs = sorted(
            [
                "ammo", "ando", "ano", "are", "arono", "asse", "assero",
                "assi", "assimo", "ata", "ate", "ati", "ato", "ava",
                "avamo", "avano", "avate", "avi", "avo", "emmo", "enda",
                "ende", "endi", "endo", "erà", "erai", "eranno", "ere",
                "erebbe", "erebbero", "erei", "eremmo", "eremo", "ereste",
                "eresti", "erete", "erò", "erono", "essero", "ete", "eva",
                "evamo", "evano", "evate", "evi", "evo", "iamo", "immo",
                "irà", "irai", "iranno", "ire", "irebbe", "irebbero",
                "irei", "iremmo", "iremo", "ireste", "iresti", "irete",
                "irò", "irono", "isca", "iscano", "isce", "isci", "isco",
                "iscono", "issero", "ita", "ite", "iti", "ito", "iva",
                "ivamo", "ivano", "ivate", "ivi", "ivo", "ono", "uta",
                "ute", "uti", "uto", "ar", "ir",
            ],
            key=len,
            reverse=True,
        )
        for suf in verb_sufs:
            if lw.endswith(suf) and in_rv(len(w) - len(suf)):
                w = w[: -len(suf)]
                break
        lw = w.lower()

    # step 3a: final vowel
    for suf in ("a", "e", "i", "o", "à", "è", "ì", "ò"):
        if lw.endswith(suf) and in_rv(len(w) - 1):
            w = w[:-1]
            lw = w.lower()
            if lw.endswith("i") and in_rv(len(w) - 1):
                w = w[:-1]
                lw = w.lower()
            break
    # step 3b
    if lw.endswith(("ch",)) and in_rv(len(w) - 2):
        w = w[:-1]
    elif lw.endswith(("gh",)) and in_rv(len(w) - 2):
        w = w[:-1]
    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Portuguese  (reference chain: schema.xml Portuguese stemmer)
# ---------------------------------------------------------------------------

_PT_VOWELS = "aeiouáéíóúâêô"


def portuguese_stem(word: str) -> str:  # noqa: C901 (faithful to the spec's shape)
    w = word.lower().replace("ã", "a~").replace("õ", "o~")
    rv = _es_like_rv(w, _PT_VOWELS)
    r1, r2 = _r1_r2(w, _PT_VOWELS)

    def in_rv(i):
        return i >= rv

    def in_r1(i):
        return i >= r1

    def in_r2(i):
        return i >= r2

    step1 = False
    sufs = sorted(
        [
            "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
            "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
            "amento", "amentos", "imento", "imentos",
            "adora", "ador", "aça~o", "adoras", "adores", "aço~es",
            "ante", "antes", "ância",
            "logia", "logias", "uça~o", "uço~es", "ência", "ências",
            "amente", "mente", "idade", "idades",
            "iva", "ivo", "ivas", "ivos", "eira", "eiras",
        ],
        key=len,
        reverse=True,
    )
    for suf in sufs:
        if not w.endswith(suf):
            continue
        i = len(w) - len(suf)
        base = w[:i]
        if suf in ("eza", "ezas", "ico", "ica", "icos", "icas", "ismo",
                   "ismos", "ável", "ível", "ista", "istas", "oso", "osa",
                   "osos", "osas", "amento", "amentos", "imento",
                   "imentos"):
            if in_r2(i):
                w = base
                step1 = True
        elif suf in ("adora", "ador", "aça~o", "adoras", "adores",
                     "aço~es", "ante", "antes", "ância"):
            if in_r2(i):
                w = base
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
                step1 = True
        elif suf in ("logia", "logias"):
            if in_r2(i):
                w = base + "log"
                step1 = True
        elif suf in ("uça~o", "uço~es"):
            if in_r2(i):
                w = base + "u"
                step1 = True
        elif suf in ("ência", "ências"):
            if in_r2(i):
                w = base + "ente"
                step1 = True
        elif suf == "amente":
            if in_r1(i):
                w = base
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and in_r2(len(w) - 2):
                            w = w[:-2]
                            break
                step1 = True
        elif suf == "mente":
            if in_r2(i):
                w = base
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break
                step1 = True
        elif suf in ("idade", "idades"):
            if in_r2(i):
                w = base
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break
                step1 = True
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(i):
                w = base
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                step1 = True
        elif suf in ("eira", "eiras"):
            if in_rv(i):
                w = base + "eir"
                step1 = True
        if step1:
            break

    # step 2: verb suffixes (only if step 1 removed nothing)
    step2 = False
    if not step1:
        verb_sufs = sorted(
            [
                "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara",
                "erá", "era", "irá", "ava", "asse", "esse", "isse",
                "aste", "este", "iste", "ei", "arei", "erei", "irei",
                "am", "iam", "ariam", "eriam", "iriam", "aram", "eram",
                "iram", "avam", "em", "arem", "erem", "irem", "assem",
                "essem", "issem", "ado", "ido", "ando", "endo", "indo",
                "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as",
                "adas", "idas", "ias", "arias", "erias", "irias", "arás",
                "aras", "erás", "eras", "irás", "avas", "es", "ardes",
                "erdes", "irdes", "ares", "eres", "ires", "asses",
                "esses", "isses", "astes", "estes", "istes", "is",
                "ais", "eis", "íeis", "aríeis", "eríeis", "iríeis",
                "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
                "ásseis", "ésseis", "ísseis", "áveis", "aveis", "ados",
                "idos", "ámos", "amos", "íamos", "aríamos", "eríamos",
                "iríamos", "áramos", "éramos", "íramos", "ávamos",
                "emos", "aremos", "eremos", "iremos", "ássemos",
                "êssemos", "íssemos", "imos", "armos", "ermos", "irmos",
                "eu", "iu", "ou", "ira", "iras",
            ],
            key=len,
            reverse=True,
        )
        for suf in verb_sufs:
            if w.endswith(suf) and in_rv(len(w) - len(suf)):
                w = w[: -len(suf)]
                step2 = True
                break

    # step 3: i preceded by c
    if (step1 or step2) and w.endswith("i") and in_rv(len(w) - 1) and w[-2:-1] == "c":
        w = w[:-1]
    if not step1 and not step2:
        # step 4: residual suffix
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if w.endswith(suf) and in_rv(len(w) - len(suf)):
                w = w[: -len(suf)]
                break
    # step 5
    for suf in ("e", "é", "ê"):
        if w.endswith(suf) and in_rv(len(w) - 1):
            w = w[:-1]
            if w.endswith(("gu", "ci")) and in_rv(len(w) - 1):
                w = w[:-1]
            break
    else:
        if w.endswith("ç"):
            w = w[:-1] + "c"
    return w.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------------------
# Dutch  (reference chain: schema.xml Dutch SnowballPorterFilter)
# ---------------------------------------------------------------------------

_NL_VOWELS = "aeiouyè"
_NL_UNACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _nl_undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def dutch_stem(word: str) -> str:  # noqa: C901 (faithful to the spec's shape)
    w = word.lower().translate(_NL_UNACCENT)
    chars = list(w)
    for i, c in enumerate(chars):
        prev_v = i > 0 and chars[i - 1].lower() in _NL_VOWELS
        next_v = i + 1 < len(chars) and chars[i + 1].lower() in _NL_VOWELS
        if c == "y" and (i == 0 or prev_v):
            chars[i] = "Y"
        elif c == "i" and prev_v and next_v:
            chars[i] = "I"
        elif c == "u" and prev_v and next_v:
            chars[i] = "U"
    w = "".join(chars)
    lw = w.lower()
    r1, r2 = _r1_r2(lw, _NL_VOWELS)
    r1 = max(r1, min(3, len(w)))

    def in_r1(i):
        return i >= r1

    def in_r2(i):
        return i >= r2

    e_removed = False
    # step 1
    if lw.endswith("heden") and in_r1(len(w) - 5):
        w = w[:-5] + "heid"
    elif lw.endswith(("ene", "en")):
        k = 3 if lw.endswith("ene") else 2
        i = len(w) - k
        if in_r1(i) and i > 0 and lw[i - 1] not in _NL_VOWELS and lw[i - 3:i] != "gem":
            w = _nl_undouble(w[:i])
    elif lw.endswith(("se", "s")):
        k = 2 if lw.endswith("se") else 1
        i = len(w) - k
        if in_r1(i) and i > 0 and lw[i - 1] not in _NL_VOWELS and lw[i - 1] != "j":
            w = w[:i]
    lw = w.lower()

    # step 2: final e
    if lw.endswith("e") and in_r1(len(w) - 1) and len(w) >= 2 and lw[-2] not in _NL_VOWELS:
        w = _nl_undouble(w[:-1])
        e_removed = True
        lw = w.lower()

    # step 3a: heid
    if lw.endswith("heid") and in_r2(len(w) - 4) and (len(w) < 5 or lw[-5] != "c"):
        w = w[:-4]
        lw = w.lower()
        if lw.endswith("en"):
            i = len(w) - 2
            if in_r1(i) and i > 0 and lw[i - 1] not in _NL_VOWELS and lw[i - 3:i] != "gem":
                w = _nl_undouble(w[:i])
                lw = w.lower()

    # step 3b: d-suffixes
    if lw.endswith("ing") or lw.endswith("end"):
        i = len(w) - 3
        if in_r2(i):
            w = w[:i]
            lw = w.lower()
            if lw.endswith("ig") and in_r2(len(w) - 2) and (len(w) < 3 or lw[-3] != "e"):
                w = w[:-2]
            else:
                w = _nl_undouble(w)
            lw = w.lower()
    elif lw.endswith("ig"):
        i = len(w) - 2
        if in_r2(i) and (i == 0 or lw[i - 1] != "e"):
            w = w[:i]
            lw = w.lower()
    elif lw.endswith("lijk"):
        i = len(w) - 4
        if in_r2(i):
            w = w[:i]
            lw = w.lower()
            if lw.endswith("e") and in_r1(len(w) - 1) and len(w) >= 2 and lw[-2] not in _NL_VOWELS:
                w = _nl_undouble(w[:-1])
                lw = w.lower()
    elif lw.endswith("baar"):
        i = len(w) - 4
        if in_r2(i):
            w = w[:i]
            lw = w.lower()
    elif lw.endswith("bar"):
        i = len(w) - 3
        if in_r2(i) and e_removed:
            w = w[:i]
            lw = w.lower()

    # step 4: undouble vowel (CVD pattern: ...C vv D with D a non-vowel, not I)
    if len(w) >= 4:
        c, v1, v2, d = w[-4], w[-3], w[-2], w[-1]
        if (
            v1 == v2
            and v1.lower() in "aeou"
            and c.lower() not in _NL_VOWELS
            and d.lower() not in _NL_VOWELS
            and d != "I"
        ):
            w = w[:-2] + w[-1]
    return w.replace("Y", "y").replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Russian  (reference chain: schema.xml Russian SnowballPorterFilter)
# ---------------------------------------------------------------------------

_RU_VOWELS = "аеиоуыэюя"

_RU_PERFECTIVE_1 = ("вшись", "вши", "в")                 # after а/я
_RU_PERFECTIVE_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую",
    "юю", "ая", "яя", "ою", "ею",
)
_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")         # after а/я
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = (                                            # after а/я
    "ете", "йте", "ешь", "нно", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н",
)
_RU_VERB_2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ишь",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую",
    "ю",
)
_RU_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев", "ов", "ие",
    "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам", "ом", "ах",
    "ях", "ию", "ью", "ия", "ья", "а", "е", "и", "й", "о", "у", "ы",
    "ь", "ю", "я",
)


def russian_stem(word: str) -> str:  # noqa: C901 (faithful to the spec's shape)
    w = word.lower().replace("ё", "е")
    n = len(w)
    rv = n
    for i, c in enumerate(w):
        if c in _RU_VOWELS:
            rv = i + 1
            break
    r1, r2 = _r1_r2(w, _RU_VOWELS)

    def in_rv(i):
        return i >= rv

    def in_r2(i):
        return i >= r2

    def try_strip(sufs, require_ajar=False):
        nonlocal w
        for suf in sorted(sufs, key=len, reverse=True):
            if not w.endswith(suf):
                continue
            i = len(w) - len(suf)
            if not in_rv(i):
                continue
            if require_ajar:
                if i > 0 and w[i - 1] in "ая" and in_rv(i - 1):
                    w = w[:i]
                    return True
                continue
            w = w[:i]
            return True
        return False

    # step 1: perfective gerund, else adjective/participle/reflexive/verb/noun
    if not (try_strip(_RU_PERFECTIVE_2) or try_strip(_RU_PERFECTIVE_1, True)):
        try_strip(("ся", "сь"))  # reflexive
        if try_strip(_RU_ADJECTIVE):
            try_strip(_RU_PARTICIPLE_2) or try_strip(_RU_PARTICIPLE_1, True)
        elif not (try_strip(_RU_VERB_2) or try_strip(_RU_VERB_1, True)):
            try_strip(_RU_NOUN)

    # step 2: final и
    if w.endswith("и") and in_rv(len(w) - 1):
        w = w[:-1]
    # step 3: derivational
    for suf in ("ость", "ост"):
        if w.endswith(suf) and in_r2(len(w) - len(suf)):
            w = w[: -len(suf)]
            break
    # step 4: tidy
    if w.endswith("нн") and in_rv(len(w) - 1):
        w = w[:-1]
    elif w.endswith(("ейше", "ейш")):
        k = 4 if w.endswith("ейше") else 3
        if in_rv(len(w) - k):
            w = w[:-k]
            if w.endswith("нн") and in_rv(len(w) - 1):
                w = w[:-1]
    if w.endswith("ь") and in_rv(len(w) - 1):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Scandinavian trio: Swedish / Norwegian / Danish (reference: per-language
# SnowballPorterFilter chains, schema.xml:466-887). All three share the
# Scandinavian R1 adjustment: the region before R1 must hold at least 3
# letters (published algorithms, snowballstem.org).
# ---------------------------------------------------------------------------


def _scand_r1(w: str, vowels: str) -> int:
    return max(_r1_r2(w, vowels)[0], 3)


_SV_VOWELS = "aeiouyäåö"
_SV_S_ENDING = "bcdfghjklmnoprtvy"
_SV_STEP1 = sorted(
    (
        "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
        "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
        "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
        "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
        "ast",
    ),
    key=len,
    reverse=True,
)


def swedish_stem(word: str) -> str:
    w = word.lower()
    r1 = _scand_r1(w, _SV_VOWELS)
    # step 1 (one among: longest suffix lying in R1 wins; a matched 's'
    # deletes only after a valid s-ending — no shorter fallback either way)
    matched = False
    for suf in _SV_STEP1:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            matched = True
            break
    if not matched and w.endswith("s") and len(w) - 1 >= r1:
        if len(w) >= 2 and w[-2] in _SV_S_ENDING:
            w = w[:-1]
    # step 2: undouble one of a closed consonant-pair list in R1
    if len(w) >= 2 and w[-2:] in ("dd", "gd", "nn", "dt", "gt", "kt", "tt"):
        if len(w) - 1 >= r1:
            w = w[:-1]
    # step 3
    for suf in ("lig", "els", "ig"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            break
    else:
        if w.endswith("löst") and len(w) - 4 >= r1:
            w = w[:-1]  # löst -> lös
        elif w.endswith("fullt") and len(w) - 5 >= r1:
            w = w[:-1]  # fullt -> full
    return w


_NO_VOWELS = "aeiouyæåø"
_NO_S_ENDING = "bcdfghjlmnoprtvyz"
_NO_STEP1 = sorted(
    (
        "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
        "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
        "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast",
    ),
    key=len,
    reverse=True,
)


def norwegian_stem(word: str) -> str:
    w = word.lower()
    r1 = _scand_r1(w, _NO_VOWELS)
    # step 1: delete list ∪ {erte/ert -> er} ∪ s-with-ending — one among
    applied = False
    for suf in ("erte", "ert"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)] + "er"
            applied = True
            break
    if not applied:
        for suf in _NO_STEP1:
            if w.endswith(suf) and len(w) - len(suf) >= r1:
                w = w[: -len(suf)]
                applied = True
                break
    if not applied and w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2:
        prev = w[-2]
        ok = prev in _NO_S_ENDING or (
            prev == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS)
        )
        if ok:
            w = w[:-1]
    # step 2
    if w[-2:] in ("dt", "vt") and len(w) - 1 >= r1:
        w = w[:-1]
    # step 3
    for suf in sorted(
        ("leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
         "slov", "hetslov"),
        key=len,
        reverse=True,
    ):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            break
    return w


_DA_VOWELS = "aeiouyæåø"
_DA_S_ENDING = "abcdfghjklmnoprtvyzå"
_DA_STEP1 = sorted(
    (
        "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
        "erne", "ere", "en", "heden", "eren", "er", "heder", "erer", "heds",
        "es", "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens",
        "erens", "ers", "ets", "erets", "et", "eret",
    ),
    key=len,
    reverse=True,
)


def danish_stem(word: str) -> str:
    w = word.lower()
    r1 = _scand_r1(w, _DA_VOWELS)

    def step2(w: str) -> str:
        if w[-2:] in ("gd", "dt", "gt", "kt") and len(w) - 1 >= r1:
            return w[:-1]
        return w

    matched = False
    for suf in _DA_STEP1:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            matched = True
            break
    if not matched and w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2:
        if w[-2] in _DA_S_ENDING:
            w = w[:-1]
    w = step2(w)
    # step 3: igst -> remove st; then ig/lig/elig/els delete (re-run step 2);
    # løst -> løs
    if w.endswith("igst"):
        w = w[:-2]
    done3 = False
    for suf in ("elig", "lig", "els", "ig"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            w = step2(w)
            done3 = True
            break
    if not done3 and w.endswith("løst") and len(w) - 4 >= r1:
        w = w[:-1]
    # step 4 (undouble): final double consonant in R1 loses one letter
    if (
        len(w) >= 2
        and w[-1] == w[-2]
        and w[-1] not in _DA_VOWELS
        and len(w) - 1 >= r1
    ):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Finnish (reference chain: schema.xml Finnish SnowballPorterFilter).
# Implementation of the published Snowball Finnish algorithm
# (snowballstem.org) from its public description: particles -> possessives
# -> case endings -> comparative/other endings -> plurals -> tidy. Written
# from the algorithm text without the official vocabulary fixtures (not
# available in this environment), so edge-case fidelity is best-effort;
# the conflation classes the tests pin (talo/talot/talossa, kirja/kirjat,
# järjestelmä family) are hand-traced.
# ---------------------------------------------------------------------------

_FI_VOWELS = "aeiouyäö"
_FI_V2 = "aeiouäö"  # restricted vowel set (no y) for the VI condition
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_CASES = (
    "lle", "ine", "ksi", "ssa", "ssä", "sta", "stä", "lla", "llä", "lta",
    "ltä", "na", "nä", "ta", "tä",
)


def finnish_stem(word: str) -> str:  # noqa: C901 (faithful to the spec's shape)
    w = word.lower()
    if len(w) < 2:
        return w
    r1, r2 = _r1_r2(w, _FI_VOWELS)

    def in_r1(i: int) -> bool:
        return i >= r1

    # step 1: particles (kin/kaan/... after n, t or a vowel; sti in R2)
    for suf in ("kaan", "kään", "kin", "han", "hän", "sti", "ko", "kö",
                "pa", "pä"):
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            i = len(w) - len(suf)
            if suf == "sti":
                if i >= r2:
                    w = w[:i]
            elif i > 0 and (w[i - 1] in "nt" or w[i - 1] in _FI_VOWELS):
                w = w[:i]
            break
    # step 2: possessives
    for suf in ("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en"):
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            i = len(w) - len(suf)
            if suf == "si":
                if not (i > 0 and w[i - 1] == "k"):
                    w = w[:i]
            elif suf == "ni":
                w = w[:i]
                if w.endswith("kse"):
                    w = w[:-1] + "i"
            elif suf == "an":
                if w[:i].endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
                    w = w[:i]
            elif suf == "än":
                if w[:i].endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
                    w = w[:i]
            elif suf == "en":
                if w[:i].endswith(("lle", "ine")):
                    w = w[:i]
            else:
                w = w[:i]
            break
    # step 3: case endings
    ended = False
    hxn = {"han": "a", "hen": "e", "hin": "i", "hon": "o", "hän": "ä",
           "hön": "ö"}
    for suf in ("siin", "seen", "tten", "han", "hen", "hin", "hon", "hän",
                "hön", "den", "tta", "ttä", *sorted(_FI_CASES, key=len,
                                                    reverse=True), "a", "ä",
                "n"):
        if not (w.endswith(suf) and in_r1(len(w) - len(suf))):
            continue
        i = len(w) - len(suf)
        if suf in hxn:
            if i > 0 and w[i - 1] == hxn[suf]:
                w, ended = w[:i], True
        elif suf in ("siin", "den", "tten"):
            # VI: preceded by i preceded by a restricted vowel
            if i >= 2 and w[i - 1] == "i" and w[i - 2] in _FI_V2:
                w, ended = w[:i], True
        elif suf == "seen":
            if w[:i].endswith(_FI_LONG):
                w, ended = w[:i], True
        elif suf in ("a", "ä"):
            # preceded by consonant + vowel (…CVa)
            if (
                i >= 2
                and w[i - 1] in _FI_VOWELS
                and w[i - 2] not in _FI_VOWELS
            ):
                w, ended = w[:i], True
        elif suf in ("tta", "ttä"):
            if i > 0 and w[i - 1] == "e":
                w, ended = w[:i], True
        elif suf == "n":
            w, ended = w[:i], True
            if w.endswith(_FI_LONG) or w.endswith("ie"):
                w = w[:-1]
        else:
            w, ended = w[:i], True
        break
    # step 4: other endings (comparatives), in R2
    for suf in ("impi", "impa", "impä", "immi", "imma", "immä", "eja",
                "ejä", "mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            i = len(w) - len(suf)
            if suf in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
                if not w[:i].endswith("po"):
                    w = w[:i]
            else:
                w = w[:i]
            break
    # step 5: plurals
    if ended:
        if w.endswith(("i", "j")) and in_r1(len(w) - 1):
            w = w[:-1]
    else:
        if (
            w.endswith("t")
            and in_r1(len(w) - 1)
            and len(w) >= 2
            and w[-2] in _FI_VOWELS
        ):
            w = w[:-1]
            for suf in ("imma", "mma"):
                if w.endswith(suf) and len(w) - len(suf) >= r2:
                    i = len(w) - len(suf)
                    if suf == "mma" and w[:i].endswith("po"):
                        break
                    w = w[:i]
                    break
    # step 6: tidy
    if w.endswith(_FI_LONG) and in_r1(len(w) - 1):
        w = w[:-1]
    if (
        len(w) >= 2
        and w[-1] in "aäei"
        and w[-2] not in _FI_VOWELS
        and in_r1(len(w) - 1)
    ):
        w = w[:-1]
    if w.endswith(("oj", "uj")) and in_r1(len(w) - 1):
        w = w[:-1]
    if w.endswith("jo") and in_r1(len(w) - 1):
        w = w[:-1]
    # undouble: last consonant pair followed only by vowels loses one
    i = len(w) - 1
    while i >= 0 and w[i] in _FI_VOWELS:
        i -= 1
    if i >= 1 and w[i] == w[i - 1] and w[i] not in _FI_VOWELS and in_r1(i):
        w = w[:i] + w[i + 1 :]
    return w


# ---------------------------------------------------------------------------
# Arabic light stemmer (reference chain: ArabicNormalizationFilter +
# ArabicStemFilter, schema.xml Arabic field type). Public Lucene semantics
# of Larkey's light-10 stemmer: orthographic normalization, one definite-
# article/conjunction prefix strip, then iterative suffix strips.
# ---------------------------------------------------------------------------

_AR_DIACRITICS = dict.fromkeys(map(ord, "ًٌٍَُِّْـ"))
_AR_NORM = str.maketrans({"آ": "ا", "أ": "ا", "إ": "ا", "ى": "ي", "ة": "ه"})
_AR_PREFIXES = ("وال", "بال", "كال", "فال", "ال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي")


def arabic_stem(word: str) -> str:
    w = word.translate(_AR_DIACRITICS).translate(_AR_NORM)
    # one prefix strip, longest first; keep at least 2 chars ("و" needs 3+)
    for p in _AR_PREFIXES:
        if w.startswith(p):
            need = 4 if p == "و" else len(p) + 2
            if len(w) >= need:
                w = w[len(p):]
            break
    # suffixes strip iteratively in list order (Lucene stemSuffix loop)
    for s in _AR_SUFFIXES:
        if w.endswith(s) and len(w) - len(s) >= 2:
            w = w[: -len(s)]
    return w


# ---------------------------------------------------------------------------
# Romanian  (reference chain: SnowballPorterFilter language="Romanian",
# schema.xml text_ro). Implemented from the published Snowball Romanian
# description: steps 0 (plurals), 1 (combining suffixes, repeated),
# 2 (standard suffixes) and 4 (final vowel) follow the spec's suffix
# classes; step 3 (verb suffixes) covers the productive verb families
# (infinitive/gerund/ez/esc groups with the consonant-or-u guard, person/
# perfect endings unconditionally) rather than the spec's exhaustive verb
# list.
# ---------------------------------------------------------------------------

_RO_VOWELS = "aăâeiîou"


def _ro_rv(lw: str) -> int:
    return _es_like_rv(lw, _RO_VOWELS)


# step-0 plural suffixes: (suffix, replacement) longest-first
_RO_STEP0 = (
    ("iilor", "i"), ("ului", ""), ("elor", "e"), ("ilor", "i"),
    ("iile", "i"), ("aua", "a"), ("ele", "e"), ("iua", "i"),
    ("iei", "i"), ("atei", "at"), ("aţie", "aţi"), ("aţia", "aţi"),
    ("ile", "i"), ("ii", "i"), ("ul", ""), ("ea", "e"),
)

# step-1 combining suffixes: (suffix, replacement)
_RO_STEP1 = (
    ("abilitate", "abil"), ("abilitati", "abil"), ("abilităi", "abil"),
    ("abilităţi", "abil"), ("ibilitate", "ibil"),
    ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"), ("ivităţi", "iv"),
    ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"), ("icităţi", "ic"),
    ("icator", "ic"), ("icatori", "ic"),
    ("iciv", "ic"), ("iciva", "ic"), ("icive", "ic"), ("icivi", "ic"),
    ("icivă", "ic"),
    ("ical", "ic"), ("icala", "ic"), ("icale", "ic"), ("icali", "ic"),
    ("icală", "ic"),
    ("ativ", "at"), ("ativa", "at"), ("ative", "at"), ("ativi", "at"),
    ("ativă", "at"), ("aţiune", "at"),
    ("atoare", "at"), ("ator", "at"), ("atori", "at"),
    ("ătoare", "at"), ("ător", "at"), ("ători", "at"),
    ("itiv", "it"), ("itiva", "it"), ("itive", "it"), ("itivi", "it"),
    ("itivă", "it"), ("iţiune", "it"),
    ("itoare", "it"), ("itor", "it"), ("itori", "it"),
)

_RO_STEP2_DELETE = (
    "abilă", "abili", "abile", "abila", "abil",
    "ibilă", "ibili", "ibile", "ibila", "ibil",
    "atori", "ator", "itate", "itati", "ităţi", "ităi",
    "oasă", "oasa", "oase", "anta", "ante", "anti", "antă", "ant",
    "ată", "ata", "ati", "ate", "at",
    "ută", "uta", "uti", "ute", "ut",
    "ită", "ita", "iti", "ite", "it",
    "ică", "ica", "ici", "ice", "ic",
    "oşi", "osi", "os",
    "ivă", "iva", "ivi", "ive", "iv",
)

_RO_STEP2_IST = ("işti", "istă", "iste", "isti", "ista", "isme", "ism", "ist")

# step-3 verb families (approximation of the spec's verb-suffix list)
_RO_VERB_COND = (  # delete if preceded in RV by consonant or u
    "ească", "ându", "indu", "ează", "eşti", "eşte", "ăşti", "ăşte",
    "are", "ere", "ire", "âre", "ind", "ând", "eze", "ezi", "esc", "ez",
    "ască", "asc",
)
_RO_VERB_UNCOND = (  # person/tense endings: delete if in RV
    "aserăţi", "iserăţi", "âserăţi", "userăţi",
    "aserăm", "iserăm", "âserăm", "userăm",
    "aseră", "iseră", "âseră", "useră",
    "aseşi", "iseşi", "âseşi", "useşi",
    "asem", "isem", "âsem", "usem",
    "ase", "ise", "âse", "use",
    "arăţi", "irăţi", "ârăţi", "urăţi",
    "arăm", "irăm", "ârăm", "urăm",
    "ară", "iră", "âră", "ură",
    "aţi", "eţi", "iţi", "âţi", "ăm", "em", "im", "âm",
    "eau", "eai", "iau", "iai", "au", "ai",
)


def romanian_stem(word: str) -> str:
    w = word.lower()
    # cedilla/comma-below folding: the spec works on ş/ţ
    w = w.replace("ș", "ş").replace("ț", "ţ")
    # u, i between vowels are consonants (upper-case marker)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "ui" and chars[i - 1] in _RO_VOWELS and chars[i + 1] in _RO_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    lw = w.lower()
    r1, r2 = _r1_r2(lw, _RO_VOWELS)
    rv = _ro_rv(lw)

    def in_r1(i):
        return i >= r1

    def in_r2(i):
        return i >= r2

    def in_rv(i):
        return i >= rv

    # step 0: plurals (longest match, in R1)
    best = None
    for suf, rep in _RO_STEP0:
        if lw.endswith(suf) and in_r1(len(lw) - len(suf)):
            if best is None or len(suf) > len(best[0]):
                best = (suf, rep)
    if best:
        suf, rep = best
        if suf == "ile" and lw.endswith("abile"):
            pass  # "ile" not removed when preceded by "ab"
        else:
            w = w[: -len(suf)] + rep
            lw = w.lower()

    # step 1: combining suffixes, repeat until nothing applies (in R1)
    step12_removed = False
    while True:
        best = None
        for suf, rep in _RO_STEP1:
            if lw.endswith(suf) and in_r1(len(lw) - len(suf)):
                if best is None or len(suf) > len(best[0]):
                    best = (suf, rep)
        if not best:
            break
        suf, rep = best
        w = w[: -len(suf)] + rep
        lw = w.lower()
        step12_removed = True

    # step 2: standard suffixes (longest match, in R2)
    best = None
    for suf in _RO_STEP2_DELETE:
        if lw.endswith(suf) and in_r2(len(lw) - len(suf)):
            if best is None or len(suf) > len(best):
                best = suf
    for suf in _RO_STEP2_IST:
        if lw.endswith(suf) and in_r2(len(lw) - len(suf)):
            if best is None or len(suf) > len(best):
                best = suf
    if best:
        if best in _RO_STEP2_IST:
            w = w[: -len(best)] + "ist"
        else:
            w = w[: -len(best)]
        lw = w.lower()
        step12_removed = True
    elif lw.endswith(("iune", "iuni")) and in_r2(len(lw) - 4) and \
            len(lw) > 4 and lw[-5] == "ţ":
        w = w[:-5] + "t"
        lw = w.lower()
        step12_removed = True

    # step 3: verb suffixes — only when steps 1-2 removed nothing
    if not step12_removed:
        best = None
        for suf in _RO_VERB_COND:
            if lw.endswith(suf) and in_rv(len(lw) - len(suf)):
                j = len(lw) - len(suf) - 1
                if j >= rv and (lw[j] not in _RO_VOWELS or lw[j] == "u"):
                    if best is None or len(suf) > len(best):
                        best = suf
        for suf in _RO_VERB_UNCOND:
            if lw.endswith(suf) and in_rv(len(lw) - len(suf)):
                if best is None or len(suf) > len(best):
                    best = suf
        if best:
            w = w[: -len(best)]
            lw = w.lower()

    # step 4: final vowel (longest of ie/a/e/i/ă, in RV)
    for suf in ("ie", "a", "e", "i", "ă"):
        if lw.endswith(suf) and in_rv(len(lw) - len(suf)):
            w = w[: -len(suf)]
            break
    return w.lower()
