"""Exact duplicated-substring removal: hand-computed fixtures + a randomized
brute-force parity check against a pure-Python restatement of the ownership
rule (shared L-gram -> min-id owner keeps, every other doc drops covered
tokens)."""

from __future__ import annotations

import numpy as np

from cqaduplicatefind_spark.operators.span_removal import remove_duplicate_spans


def _run(spark, rows, min_span):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_duplicate_spans(
        df, min_span=min_span, id_col="doc_id", text_col="text"
    )
    return {r["doc_id"]: (r["clean_text"], r["n_removed"]) for r in out.collect()}


def test_hand_fixture(spark):
    rows = [
        (1, "a b c d e x y z"),          # owner of "a b c d e"
        (2, "p q a b c d e r s"),        # loses the shared run
        (3, "too short"),                # < min_span tokens, untouched
        (4, "a b c d e"),                # entirely covered -> empty
    ]
    got = _run(spark, rows, min_span=5)
    assert got[1] == ("a b c d e x y z", 0)      # owner byte-identical
    assert got[2] == ("p q r s", 5)
    assert got[3] == ("too short", 0)
    assert got[4] == ("", 5)
    assert len(got) == 4                          # one row per input doc


def test_overlapping_runs_union(spark):
    # owner holds "a b c d e f g"; doc 5 embeds it with flanks. Its covered
    # starts 1,2,3 overlap; the union must remove tokens 1..7 exactly once.
    rows = [
        (1, "a b c d e f g"),
        (5, "z a b c d e f g w"),
    ]
    got = _run(spark, rows, min_span=5)
    assert got[1] == ("a b c d e f g", 0)
    assert got[5] == ("z w", 7)


def test_min_id_ownership_chain(spark):
    # three copies: only the smallest id keeps the run; both others lose it,
    # independent of which pair shares what first.
    rows = [(7, "k l m n o p"), (3, "k l m n o p"), (9, "x k l m n o p y")]
    got = _run(spark, rows, min_span=6)
    assert got[3] == ("k l m n o p", 0)
    assert got[7] == ("", 6)
    assert got[9] == ("x y", 6)


def _brute_force(rows, min_span):
    grams: dict[tuple, int] = {}
    docs = {i: (t.split(" ") if t else []) for i, t in rows}
    counts: dict[tuple, set] = {}
    for i, toks in docs.items():
        for s in range(len(toks) - min_span + 1):
            g = tuple(toks[s : s + min_span])
            counts.setdefault(g, set()).add(i)
    for g, ids in counts.items():
        if len(ids) >= 2:
            grams[g] = min(ids)
    out = {}
    for i, toks in docs.items():
        cut = np.zeros(len(toks), dtype=bool)
        for s in range(len(toks) - min_span + 1):
            g = tuple(toks[s : s + min_span])
            if g in grams and grams[g] < i:
                cut[s : s + min_span] = True
        out[i] = (
            " ".join(t for t, c in zip(toks, cut) if not c),
            int(cut.sum()),
        )
    return out


def test_duplicate_id_contract_violation_degrades_not_crashes(spark):
    """The operator expects one row per id; a violation (duplicate ids with
    different-length texts fanning the start list onto a SHORTER copy) must
    ignore the out-of-range starts instead of killing the job with an
    IndexError inside the Arrow worker."""
    shared = " ".join(f"s{i}" for i in range(15))
    long_text = " ".join(f"pad{i}" for i in range(80)) + " " + shared
    docs = spark.createDataFrame(
        [
            ("a", shared),          # owner (min id)
            ("dup", long_text),     # shares the run at position 80
            ("dup", "tiny text"),   # contract violation: same id, 2 tokens
        ],
        "url string, text string",
    )
    rows = remove_duplicate_spans(docs, min_span=15).collect()
    by_text = {r.clean_text: r.n_removed for r in rows}
    assert "tiny text" in by_text and by_text["tiny text"] == 0
    assert by_text[" ".join(f"pad{i}" for i in range(80))] == 15


def test_randomized_brute_force_parity(spark):
    rng = np.random.default_rng(7)
    vocab = [f"w{k}" for k in range(12)]  # small vocab -> dense collisions
    rows = []
    for i in range(40):
        n = int(rng.integers(0, 24))
        rows.append((i, " ".join(rng.choice(vocab, size=n))))
    # plant exact copies and embeddings so long shared runs certainly exist
    rows[20] = (20, rows[4][1])
    rows[30] = (30, "w0 w1 " + rows[8][1] + " w2")
    got = _run(spark, rows, min_span=4)
    assert got == _brute_force(rows, min_span=4)
