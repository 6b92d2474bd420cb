"""review_to_wordlist golden tests (reference: src/DataSetUtil.py:48-86).

Golden expectations are hand-derived by walking the reference pipeline order:
lowercase/split -> stopword removal -> regex cleanup -> split -> Snowball stem.
"""

import pandas as pd
import pytest

from cqaduplicatefind_spark.functions.normalize import (
    normalize_udf,
    review_to_wordlist,
    with_normalized_text,
)
from cqaduplicatefind_spark.functions.snowball import stem

GOLDENS = [
    # stopwords removed before regex cleanup; stemming last
    ("The cats are running", "cat run"),
    # "don't" is a stopword as a whole word (removed before n't padding applies)
    ("I don't like this", "like"),
    # contraction padding when NOT a stopword: "dog's" -> "dog 's" -> stems
    ("the dog's bone", "dog 's bone"),
    # punctuation stripped, parens padded
    ("hello, world! (really?)", "hello world ( realli )"),
    # non-alnum to space, multi-space collapse
    ("foo_bar   baz##qux", "foo bar baz qux"),
    # numbers survive
    ("version 42 released", "version 42 releas"),
    # stemming examples
    ("nationality generalization", "nation general"),
    ("meetings agreed flies", "meet agre fli"),
    ("", ""),
]


@pytest.mark.parametrize("raw,expected", GOLDENS)
def test_goldens(raw, expected):
    assert review_to_wordlist(raw) == expected


def test_pipeline_order_stopwords_before_regex():
    # "it's" is a stopword and must vanish entirely; a non-stopword "cat's"
    # goes through 's padding instead.
    assert review_to_wordlist("it's cat's") == "cat 's"


def test_deterministic():
    # same input -> same bytes, across repeated calls (stemmer cache warm/cold)
    for raw, _ in GOLDENS:
        assert review_to_wordlist(raw) == review_to_wordlist(raw)


def test_single_spaced_output():
    out = review_to_wordlist("a  lot   of,, whitespace!! everywhere...")
    assert "  " not in out
    assert out == out.strip()


STEM_CASES = {
    # verified against the published Porter2 spec (snowballstem.org)
    "running": "run", "hopping": "hop", "hoping": "hope", "ties": "tie",
    "cries": "cri", "caresses": "caress", "ponies": "poni",
    "nationality": "nation", "generalization": "general", "flies": "fli",
    "dying": "die", "agreed": "agre", "meeting": "meet", "sings": "sing",
    "skies": "sky", "early": "earli", "news": "news", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic",
    # Porter2 (not Porter1): 'ative' needs R2, so step 4 'ive' fires instead
    "formative": "format",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt",
    # commun- prefix pins R1 after the prefix; 'ism' then fails the R2 condition
    "communism": "communism",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    "knot": "knot", "knotting": "knot", "sky": "sky", "crying": "cri",
    "string": "string", "meetings": "meet", "exceed": "exceed",
    "inning": "inning", "outing": "outing", "a": "a", "ab": "ab",
}


def test_snowball_spec_cases():
    bad = {w: (stem(w), e) for w, e in STEM_CASES.items() if stem(w) != e}
    assert not bad, bad


def test_udf_matches_plain_function(spark):
    raws = [r for r, _ in GOLDENS] + ["The Quick brown FOX jumped, over (lazy) dogs?"]
    df = spark.createDataFrame([(r,) for r in raws], "text string")
    out = {r.text: r.norm for r in df.select("text", normalize_udf("text").alias("norm")).collect()}
    for r in raws:
        assert out[r] == review_to_wordlist(r)


def test_with_normalized_text_on_fixture(spark, tiny_fixture):
    pages, _, _ = tiny_fixture
    norm = with_normalized_text(pages.limit(20))
    rows = norm.select("text", "norm_text").collect()
    for r in rows:
        assert r.norm_text == review_to_wordlist(r.text)


def test_norm_memo_bounded_by_bytes_not_entries():
    """The normalization memo must key on digests and stay within its byte budget
    even when fed many large distinct texts (multi-KB web pages previously pinned
    the raw text as dict keys — gigabytes per worker)."""
    import cqaduplicatefind_spark.functions.normalize as nz

    saved_memo, saved_bytes = dict(nz._NORM_MEMO), nz._NORM_MEMO_BYTES
    try:
        nz._NORM_MEMO.clear()
        nz._NORM_MEMO_BYTES = 0
        big = "word " * 200_000  # ~1 MB raw
        for i in range(100):
            out = nz._normalize_memo(f"doc{i} " + big)
            assert out  # normalization still works
        stored = sum(len(v) for v in nz._NORM_MEMO.values()) + sum(
            len(k) for k in nz._NORM_MEMO
        )
        assert stored <= nz._NORM_MEMO_BYTE_BUDGET
        assert all(isinstance(k, bytes) and len(k) == 16 for k in nz._NORM_MEMO)
        # memoized result identical to a fresh computation
        assert nz._normalize_memo("the quick brown fox") == nz.review_to_wordlist(
            "the quick brown fox"
        )
    finally:
        nz._NORM_MEMO.clear()
        nz._NORM_MEMO.update(saved_memo)
        nz._NORM_MEMO_BYTES = saved_bytes
