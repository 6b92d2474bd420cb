"""Distributed BM25 vs a faithful local BM25Okapi (the reference's retriever,
rank_bm25 defaults — see tests/test_qa_end_to_end.py for the same kernel used
in the pool-recall comparison)."""

from __future__ import annotations

import math

import pytest

from cqaduplicatefind_spark.operators.bm25 import bm25_topk


def _local_bm25(corpus: dict[int, list[str]], query: list[str],
                k1=1.5, b=0.75, epsilon=0.25) -> dict[int, float]:
    n_docs = len(corpus)
    avgdl = sum(len(d) for d in corpus.values()) / n_docs
    df: dict[str, int] = {}
    for doc in corpus.values():
        for w in set(doc):
            df[w] = df.get(w, 0) + 1
    idf = {w: math.log((n_docs - n + 0.5) / (n + 0.5)) for w, n in df.items()}
    avg_idf = sum(idf.values()) / len(idf)
    # rank_bm25 floors only STRICTLY negative idfs (``if idf < 0`` in
    # BM25Okapi._calc_idf); a term with df == n_docs/2 has idf_raw == 0 and
    # keeps it — it scores 0, not epsilon * avg_idf.
    idf = {w: (v if v >= 0 else epsilon * avg_idf) for w, v in idf.items()}
    out = {}
    for did, doc in corpus.items():
        tf: dict[str, int] = {}
        for w in doc:
            tf[w] = tf.get(w, 0) + 1
        s = 0.0
        for w in query:
            if w in tf:
                s += idf[w] * tf[w] * (k1 + 1) / (
                    tf[w] + k1 * (1 - b + b * len(doc) / avgdl)
                )
        if s:
            out[did] = s
    return out


def _fixture():
    """Deterministic corpus with repeated terms, shared vocab, a ubiquitous
    term ('the', df = all docs -> negative idf -> epsilon floor), and varied
    doc lengths."""
    vocab = ["apple", "banana", "cherry", "date", "elder", "fig", "grape"]
    corpus = {}
    for i in range(12):
        toks = ["the"]
        for j, w in enumerate(vocab):
            toks += [w] * (((i * 7 + j * 3) % 4))
        toks += [f"uniq{i}"]
        corpus[i] = toks
    return corpus


def test_bm25_matches_local_okapi(spark):
    corpus = _fixture()
    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()], "doc_id long, text string"
    )
    got = {
        (r.query_id, r.candidate_id): r.bm25
        for r in bm25_topk(docs, k=100).collect()
    }
    for qid, qtoks in corpus.items():
        want = _local_bm25(corpus, qtoks)
        want.pop(qid, None)
        got_q = {c: s for (q, c), s in got.items() if q == qid}
        assert set(got_q) == set(want), f"candidate set differs for q{qid}"
        for c, s in want.items():
            assert got_q[c] == pytest.approx(round(s, 6), abs=2e-6), (qid, c)


def test_bm25_query_term_multiplicity_counts(spark):
    """rank_bm25 iterates query TOKENS, so a term repeated in the query scores
    its per-occurrence contribution each time."""
    docs = spark.createDataFrame(
        [(1, "apple pie"), (2, "banana split"), (3, "cherry cake")],
        "doc_id long, text string",
    )
    q1 = spark.createDataFrame([(10, "apple")], "doc_id long, text string")
    q2 = spark.createDataFrame([(10, "apple apple")], "doc_id long, text string")
    s1 = bm25_topk(docs, q1, k=5).collect()
    s2 = bm25_topk(docs, q2, k=5).collect()
    assert len(s1) == len(s2) == 1
    assert s2[0].bm25 == pytest.approx(2 * s1[0].bm25, abs=2e-6)


def test_bm25_df_cap_drops_hot_terms_only(spark):
    """A term in > df_cap docs leaves the join entirely; surviving terms keep
    the UNCAPPED idf statistics (capped and uncapped runs agree wherever both
    score)."""
    corpus = _fixture()
    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()], "doc_id long, text string"
    )
    q = spark.createDataFrame([(99, "the uniq3")], "doc_id long, text string")
    capped = bm25_topk(docs, q, k=100, df_cap=5).collect()
    # 'the' (df=12 > 5) is gone; only doc 3 matches 'uniq3' (df=1 <= 5)
    assert {(r.query_id, r.candidate_id) for r in capped} == {(99, 3)}
    uncapped = {r.candidate_id: r.bm25 for r in bm25_topk(docs, q, k=100).collect()}
    # uniq3's contribution is identical under the cap (idf from full stats)
    full_uniq = _local_bm25(corpus, ["uniq3"])
    assert capped[0].bm25 == pytest.approx(round(full_uniq[3], 6), abs=2e-6)
    # and uncapped scoring sees 'the' too: doc 3 scores strictly higher there
    assert uncapped[3] > capped[0].bm25


def test_bm25_whitespace_tokenization(spark):
    """Tabs/newlines are token boundaries (str.split() semantics): a doc
    written with mixed whitespace scores identically to its single-spaced
    twin, and 'end.\\nStart' never fuses into one term."""
    single = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta beta")], "doc_id long, text string"
    )
    mixed = spark.createDataFrame(
        [(1, "alpha\tbeta\n gamma"), (2, "delta  beta")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(9, "beta\ngamma")], "doc_id long, text string")
    want = {(r.candidate_id, r.bm25) for r in bm25_topk(single, q, k=5).collect()}
    got = {(r.candidate_id, r.bm25) for r in bm25_topk(mixed, q, k=5).collect()}
    assert got == want and len(got) == 2


def test_bm25_external_query_id_collision_not_excluded(spark):
    """With an INDEPENDENT query table, an id-colliding corpus doc is a
    legitimate candidate: query 2 must still retrieve corpus doc 2 (the
    self-exclusion default applies only to self-retrieval, where same id
    means same document)."""
    docs = spark.createDataFrame(
        [(1, "apple pie"), (2, "banana split"), (3, "cherry cake")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(2, "banana")], "doc_id long, text string")
    out = bm25_topk(docs, q, k=5).collect()
    assert [(r.query_id, r.candidate_id) for r in out] == [(2, 2)]
    # explicit opt-in restores the corpus-subset semantics
    assert bm25_topk(docs, q, k=5, exclude_self=True).count() == 0
    # and self-retrieval still excludes the trivial hit by default
    self_out = bm25_topk(docs, k=5).collect()
    assert all(r.query_id != r.candidate_id for r in self_out)


def test_bm25_topk_rank_and_tiebreak(spark):
    """Identical docs tie exactly; rank breaks by candidate id ascending and
    k truncates."""
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "x y"), (4, "z z")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(9, "x y")], "doc_id long, text string")
    out = bm25_topk(docs, q, k=2).orderBy("rank").collect()
    assert [(r.candidate_id, r.rank) for r in out] == [(1, 1), (2, 2)]


def test_bm25_zero_idf_term_scores_zero_not_epsilon(spark):
    """A term in EXACTLY half the corpus has idf_raw == ln(1) == 0.
    rank_bm25's BM25Okapi floors only idf < 0 (``if idf < 0`` in
    ``_calc_idf``), so that term contributes 0 — not epsilon * avg_idf.
    Pin it directly: querying "half uniq3" must score doc 3 identically to
    querying "uniq3" alone."""
    corpus = _fixture()  # 12 docs
    for i in range(6):
        corpus[i] = corpus[i] + ["half"]  # df('half') == 6 == n_docs/2
    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()], "doc_id long, text string"
    )
    q_both = spark.createDataFrame([(99, "half uniq3")], "doc_id long, text string")
    q_uniq = spark.createDataFrame([(99, "uniq3")], "doc_id long, text string")
    both = {r.candidate_id: r.bm25 for r in bm25_topk(docs, q_both, k=100).collect()}
    uniq = {r.candidate_id: r.bm25 for r in bm25_topk(docs, q_uniq, k=100).collect()}
    # doc 3 matched via uniq3; 'half' adds exactly nothing to its score
    assert both[3] == pytest.approx(uniq[3], abs=2e-6)
    # docs matched ONLY via 'half' (doc 3 also holds uniq3) carry a 0.0 score
    # (candidate via the join, zero contribution), mirroring rank_bm25's zero
    # entries in get_scores
    for i in [0, 1, 2, 4, 5]:
        assert both[i] == pytest.approx(0.0, abs=2e-6)
    # and the local oracle (with the corrected >= floor) agrees on doc 3
    want = _local_bm25(corpus, ["half", "uniq3"])
    assert both[3] == pytest.approx(round(want[3], 6), abs=2e-6)
