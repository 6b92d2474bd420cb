"""Reference-shaped end-to-end run: synthetic CQADupStack-style question dumps
(orient='index' JSON with gold ``dups`` lists, HTML bodies) through
read_question_dumps -> strip_tags -> normalize -> grouped dedup pipeline ->
ranked retrieval -> P@10/MAP — the reference's actual evaluation loop
(``/root/reference/src/BM25DuplicateRetriever.py:85-103``) — with a brute-force
BM25Okapi pool comparison (the reference's candidate generator, ``:46-63``)."""

from __future__ import annotations

import json
import math

import pytest
from pyspark.sql import functions as F

from cqaduplicatefind_spark.config import DedupConfig
from cqaduplicatefind_spark.functions.html_strip import strip_tags
from cqaduplicatefind_spark.functions.normalize import review_to_wordlist
from cqaduplicatefind_spark.operators.metrics import ranked_retrieval_metrics
from cqaduplicatefind_spark.operators.pairs import gold_edges_from_dups
from cqaduplicatefind_spark.operators.topk import symmetrize_scored, topk_per_query
from cqaduplicatefind_spark.plans.pipeline import retrieval_scored_pairs, run_pipeline
from cqaduplicatefind_spark.sources.qa_dumps import read_question_dumps


def _bm25_okapi_top10(corpus: list[list[str]], query: list[str],
                      k1: float = 1.5, b: float = 0.75, epsilon: float = 0.25):
    """Faithful BM25Okapi (rank_bm25 defaults, the reference's retriever at
    BM25DuplicateRetriever.py:46): idf = ln((N-n+0.5)/(n+0.5)), negative idfs
    floored at epsilon * average_idf. Returns indices of the top-10 docs."""
    n_docs = len(corpus)
    avgdl = sum(len(d) for d in corpus) / n_docs
    df: dict[str, int] = {}
    for doc in corpus:
        for w in set(doc):
            df[w] = df.get(w, 0) + 1
    idf = {w: math.log((n_docs - n + 0.5) / (n + 0.5)) for w, n in df.items()}
    avg_idf = sum(idf.values()) / len(idf)
    idf = {w: (v if v > 0 else epsilon * avg_idf) for w, v in idf.items()}
    scores = []
    for doc in corpus:
        tf: dict[str, int] = {}
        for w in doc:
            tf[w] = tf.get(w, 0) + 1
        s = 0.0
        for w in query:
            if w in tf:
                s += idf[w] * tf[w] * (k1 + 1) / (
                    tf[w] + k1 * (1 - b + b * len(doc) / avgdl)
                )
        scores.append(s)
    return sorted(range(n_docs), key=lambda i: -scores[i])[:10]


def _dump_fixture(tmp_path):
    """Two per-forum dumps. Every dup pair shares its title/body (small HTML
    variations); distractors are lexically distinct. Hand-computable outcome:
    each of the 10 dup-carrying questions has exactly 1 gold dup that the
    engine ranks first -> P@10 = 0.1, MAP = 1.0, found@10 = 10."""
    def q(title, body, dups):
        return {"title": title, "body": body, "dups": dups}

    forums = {
        "android": {
            "a1": q("battery drains overnight quickly",
                    "<p>My phone <b>battery</b> drains overnight, losing forty percent</p>", ["a2"]),
            "a2": q("battery drains overnight quickly",
                    "<p>My phone battery drains overnight, losing forty percent</p>", ["a1"]),
            "a3": q("camera application crashes on startup",
                    "<div>The camera app crashes immediately when opening it</div>", ["a4"]),
            "a4": q("camera application crashes on startup",
                    "<div>The camera app crashes immediately when opening it today</div>", ["a3"]),
            "a5": q("wifi keeps disconnecting randomly",
                    "Wifi connection drops every few minutes on my tablet", ["a6"]),
            "a6": q("wifi keeps disconnecting randomly",
                    "Wifi connection drops every few minutes on my tablet device", ["a5"]),
            "a7": q("change default ringtone settings",
                    "How can a custom ringtone replace the default one", []),
            "a8": q("enable developer options menu",
                    "Steps required for unlocking hidden developer options", []),
        },
        "gis": {
            "g1": q("reproject shapefile coordinate system",
                    "<p>Reprojecting a shapefile between coordinate reference systems</p>", ["g2"]),
            "g2": q("reproject shapefile coordinate system",
                    "<p>Reprojecting a shapefile between coordinate reference systems fails</p>", ["g1"]),
            "g3": q("merge raster tiles seamlessly",
                    "Merging many raster tiles into one seamless mosaic", ["g4"]),
            "g4": q("merge raster tiles seamlessly",
                    "Merging many raster tiles into one seamless mosaic image", ["g3"]),
            "g5": q("buffer polygon layer distance",
                    "Creating buffers around polygon layers at fixed distance", []),
        },
    }
    for forum, questions in forums.items():
        with open(tmp_path / f"{forum}.json", "w") as f:
            json.dump(questions, f)
    return forums


@pytest.fixture(scope="module")
def qa_run(spark, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("dumps")
    forums = _dump_fixture(tmp_path)

    questions = read_question_dumps(spark, str(tmp_path / "*.json"))
    cfg = DedupConfig(shingle_k=2, jaccard_threshold=0.5,
                      shuffle_partitions=8, signature_partitions=8)
    # the reference lifecycle: html -> strip_tags -> review_to_wordlist (the
    # pipeline runs both via use_html=True), query text = title + " " + body (F5)
    pages = questions.select(
        F.col("question_id").alias("url"),
        F.concat_ws(" ", "title", "body").alias("html"),
        F.lit("").alias("text"),
        "forum",
        "dups",
    )
    result = run_pipeline(spark, pages, cfg, use_html=True, group_col="forum")
    gold = gold_edges_from_dups(questions, id_col="question_id", dups_col="dups")
    ranked = symmetrize_scored(retrieval_scored_pairs(result, cfg), "jaccard")
    return forums, questions, result, gold, ranked


def test_qa_dumps_pipeline_metrics_match_hand_computed(spark, qa_run):
    _, _, _, gold, ranked = qa_run
    m = ranked_retrieval_metrics(ranked, gold, k=10).collect()[0]
    # 10 queries carry >= 1 gold dup; each engine top-10 contains its single
    # gold partner at rank 1 -> P@10 = 1/10 per query, AP = 1.0 per query
    assert m["n_queries"] == 10
    assert m["found_at_k"] == 10
    assert abs(m["p_at_k"] - 0.1) < 1e-9
    assert abs(m["map"] - 1.0) < 1e-9


def test_qa_dumps_clusters_respect_forums_and_gold(spark, qa_run):
    forums, _, result, gold, _ = qa_run
    clusters = {r["url"]: r["cluster_id"] for r in result.clusters.collect()}
    for src, dst in ((r["src"], r["dst"]) for r in gold.collect()):
        assert clusters[src] == clusters[dst], f"gold pair ({src},{dst}) split"
    # distractors stay singletons; forums never mix
    for qid in ("a7", "a8", "g5"):
        assert clusters[qid] == qid
    a_ids = set(forums["android"])
    g_ids = set(forums["gis"])
    for qid, cid in clusters.items():
        same = a_ids if qid in a_ids else g_ids
        assert cid in same, f"cluster for {qid} crosses forums"


def test_engine_pool_recall_matches_brute_force_bm25(spark, qa_run):
    """The reference's candidate generator is per-forum BM25 top-10 over
    normalized titles with query = title + body (BM25DuplicateRetriever.py:
    46-63). The engine's top-10 pool must find every gold dup the BM25 pool
    finds on this fixture (pool recall >= BM25's)."""
    forums, questions, result, gold, ranked = qa_run

    rows = questions.collect()
    norm_title = {
        r["question_id"]: review_to_wordlist(strip_tags(r["title"])) for r in rows
    }
    norm_body = {
        r["question_id"]: review_to_wordlist(strip_tags(r["body"])) for r in rows
    }
    engine_top = {
        r["query_id"]: set()
        for r in topk_per_query(ranked, k=10).collect()
    }
    for r in topk_per_query(ranked, k=10).collect():
        engine_top[r["query_id"]].add(r["candidate_id"])

    bm25_found = engine_found = total_gold = 0
    for forum, qs in forums.items():
        ids = sorted(qs)
        corpus = [norm_title[i].split() for i in ids]
        for qid in ids:
            dups = set(qs[qid]["dups"])
            if not dups:
                continue
            query = (norm_title[qid] + " " + norm_body[qid]).split()
            pool = {ids[j] for j in _bm25_okapi_top10(corpus, query)} - {qid}
            total_gold += len(dups)
            bm25_found += len(pool & dups)
            engine_found += len(engine_top.get(qid, set()) & dups)
    assert total_gold == 10
    assert bm25_found == 10           # the fixture is lexically easy for BM25
    assert engine_found >= bm25_found  # engine pool recall >= reference's
