"""Pure-Python Snowball English ("Porter2") stemmer.

The reference stems every token with NLTK's ``SnowballStemmer('english')``
(``/root/reference/src/DataSetUtil.py:80-81``). NLTK is not installed here, so this
module implements the published Porter2 algorithm (M.F. Porter, snowballstem.org,
"The English (Porter2) stemming algorithm") from its public specification — steps 0
through 5, R1/R2 regions, special-word table, and post-1a exceptional forms.

Matches NLTK's documented behaviors: words of length <= 2 are returned unchanged, the
special-word table is applied before any step, and consonant ``y`` is marked ``Y``
during processing.

This is driver/executor-side plain Python invoked from inside Arrow-batched pandas
UDFs (one stemmer shared per batch), never per-row registered as a Spark UDF.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_SPECIAL_WORDS = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# invariant after step 1a
_EXCEPTIONS_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed")
)

_STEP2_SUFFIXES = (
    # (suffix, replacement, required preceding char set or None)
    ("ization", "ize", None),
    ("ational", "ate", None),
    ("fulness", "ful", None),
    ("ousness", "ous", None),
    ("iveness", "ive", None),
    ("tional", "tion", None),
    ("biliti", "ble", None),
    ("lessli", "less", None),
    ("entli", "ent", None),
    ("ation", "ate", None),
    ("alism", "al", None),
    ("aliti", "al", None),
    ("ousli", "ous", None),
    ("iviti", "ive", None),
    ("fulli", "ful", None),
    ("enci", "ence", None),
    ("anci", "ance", None),
    ("abli", "able", None),
    ("izer", "ize", None),
    ("ator", "ate", None),
    ("alli", "al", None),
    ("bli", "ble", None),
    ("ogi", "og", frozenset("l")),
    ("li", "", _LI_ENDING),
)

_STEP3_SUFFIXES = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
)

_STEP4_SUFFIXES = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
)


def _regions(word: str) -> tuple[int, int]:
    """Return (r1_start, r2_start) as indices into ``word``.

    R1 = region after the first non-vowel following a vowel; with the gener/commun/
    arsen prefix exception. R2 = same rule applied within R1.
    """
    n = len(word)
    r1 = n
    if word.startswith(("gener", "arsen")):
        r1 = 5
    elif word.startswith("commun"):
        r1 = 6
    else:
        for i in range(1, n):
            if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """True if ``word`` ends in a short syllable:
    (a) vowel + non-vowel(not w/x/Y) preceded by a non-vowel, or
    (b) whole word is vowel + non-vowel.
    """
    n = len(word)
    if n == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if n >= 3:
        return (
            word[-3] not in _VOWELS
            and word[-2] in _VOWELS
            and word[-1] not in _VOWELS
            and word[-1] not in "wxY"
        )
    return False


def _is_short(word: str) -> bool:
    r1, _ = _regions(word)
    return r1 >= len(word) and _ends_short_syllable(word)


def _contains_vowel(s: str) -> bool:
    return any(c in _VOWELS for c in s)


@lru_cache(maxsize=1 << 18)
def stem(token: str) -> str:
    """Stem one lowercase-insensitive token (Porter2)."""
    word = token.lower()
    if len(word) <= 2:
        return word
    if word in _SPECIAL_WORDS:
        return _SPECIAL_WORDS[word]

    # normalize apostrophes; strip a leading one
    word = word.replace("’", "'").replace("‘", "'").replace("‛", "'")
    if word.startswith("'"):
        word = word[1:]
    # mark consonant y as Y
    if word.startswith("y"):
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    # step 0: longest of ' , 's , 's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS_1A:
        return word

    # step 1b
    r1, r2 = _regions(word)
    if word.endswith("eedly"):
        if len(word) - 5 >= r1:
            word = word[:-3]
    elif word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _is_short(word):
                        word += "e"
                break

    # step 1c: y/Y -> i if preceded by a non-vowel that is not the first letter
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        word = word[:-1] + "i"

    # step 2 (longest matching suffix; apply only if it lies in R1)
    r1, r2 = _regions(word)
    for suf, repl, prev_chars in _STEP2_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if prev_chars is not None:
                    idx = len(word) - len(suf) - 1
                    if idx < 0 or word[idx] not in prev_chars:
                        break
                word = word[: -len(suf)] + repl
            break

    # step 3
    r1, r2 = _regions(word)
    if word.endswith("ative"):
        # 'ative' is deleted only if it lies in R2
        if len(word) - 5 >= r2:
            word = word[:-5]
        elif len(word) - 5 >= r1:
            # longest-match semantics: 'ative' matched; condition failed -> no action
            pass
    else:
        for suf, repl in _STEP3_SUFFIXES:
            if word.endswith(suf):
                if len(word) - len(suf) >= r1:
                    word = word[: -len(suf)] + repl
                break

    # step 4 (longest matching suffix; delete if in R2; 'ion' needs s/t before it)
    r1, r2 = _regions(word)
    for suf in _STEP4_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    idx = len(word) - 4
                    if idx >= 0 and word[idx] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # step 5
    r1, r2 = _regions(word)
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1]):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")
