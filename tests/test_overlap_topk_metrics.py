"""Overlap-span pass, top-k retrieval, and P@10/MAP metric parity tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cqaduplicatefind_spark.functions.hashing import TokenHasher
from cqaduplicatefind_spark.operators.metrics import ranked_retrieval_metrics
from cqaduplicatefind_spark.operators.overlap import (
    longest_common_span,
    overlap_spans,
)
from cqaduplicatefind_spark.operators.topk import (
    canonical_per_cluster,
    retrieve_duplicates,
    topk_per_query,
)


# ---------- longest_common_span kernel ----------

def _h(tokens):
    return TokenHasher(0).hash_tokens(tokens)


def _oracle_lcs(a, b):
    """O(n*m) DP longest common substring over token lists."""
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


@pytest.mark.parametrize(
    "a,b",
    [
        ("a b c d e", "x b c d y"),
        ("a b c", "a b c"),
        ("a b c", "d e f"),
        ("a", "a"),
        ("", "a b"),
        ("a b a b a", "b a b"),
        ("q w e r t y u i", "z x e r t y c v"),
    ],
)
def test_span_kernel_vs_dp_oracle(a, b):
    ta, tb = a.split() if a else [], b.split() if b else []
    got = longest_common_span(_h(ta) if ta else np.empty(0, np.uint64),
                              _h(tb) if tb else np.empty(0, np.uint64))
    assert got == _oracle_lcs(ta, tb)


def test_span_kernel_random_vs_dp(seed=5):
    import random

    rnd = random.Random(seed)
    for _ in range(30):
        n, m = rnd.randint(0, 40), rnd.randint(0, 40)
        a = [rnd.choice("abcde") for _ in range(n)]
        b = [rnd.choice("abcde") for _ in range(m)]
        got = longest_common_span(
            _h(a) if a else np.empty(0, np.uint64),
            _h(b) if b else np.empty(0, np.uint64),
        )
        assert got == _oracle_lcs(a, b), (a, b)


def test_overlap_spans_df(spark):
    docs = spark.createDataFrame(
        [
            ("u1", "the quick brown fox jumps over the lazy dog"),
            ("u2", "xx quick brown fox jumps yy zz"),
            ("u3", "totally different words here"),
        ],
        "url string, norm_text string",
    )
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3")], "id_a string, id_b string"
    )
    got = {(r.id_a, r.id_b): r.overlap_span for r in overlap_spans(pairs, docs).collect()}
    assert got[("u1", "u2")] == 4  # "quick brown fox jumps"
    assert got[("u1", "u3")] == 0


# ---------- top-k ----------

def test_topk_per_query(spark):
    rows = [("q1", f"c{i}", float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "query_id string, candidate_id string, score double")
    got = topk_per_query(df, k=5).orderBy("rank").collect()
    assert [r.candidate_id for r in got] == ["c19", "c18", "c17", "c16", "c15"]
    assert [r.rank for r in got] == [1, 2, 3, 4, 5]


def test_topk_tie_break_deterministic(spark):
    rows = [("q1", c, 1.0) for c in ["cB", "cA", "cC"]]
    df = spark.createDataFrame(rows, "query_id string, candidate_id string, score double")
    got = topk_per_query(df, k=2).orderBy("rank").collect()
    assert [r.candidate_id for r in got] == ["cA", "cB"]


# ---------- P@k / MAP parity with the reference's accumulation loop ----------

def _reference_metrics(ranked_by_query, gold_by_query, k=10):
    """Literal transcription of src/BM25DuplicateRetriever.py:49-103 semantics."""
    queriesWithDuplicates = 0
    precisionAtSum = 0.0
    sumOfAveragePrecision = 0.0
    foundDupsAll = 0
    for q, dupids in gold_by_query.items():
        if len(dupids) == 0:
            continue
        queriesWithDuplicates += 1
        results = ranked_by_query.get(q, [])[:k]
        foundDups = 0
        apForQuery = 0.0
        for j, cand in enumerate(results):
            if cand in dupids:
                foundDups += 1
                apForQuery += foundDups / (j + 1)
        if foundDups > 0:
            sumOfAveragePrecision += apForQuery / len(dupids)
        precisionAtSum += foundDups / k
        foundDupsAll += foundDups
    return (
        queriesWithDuplicates,
        foundDupsAll,
        precisionAtSum / queriesWithDuplicates,
        sumOfAveragePrecision / queriesWithDuplicates,
    )


def test_metric_parity_with_reference_loop(spark):
    gold = {
        "q1": {"d1", "d2"},
        "q2": {"d9"},
        "q3": {"d5", "d6", "d7"},
        "q4": set(),  # no dups: excluded from denominators
    }
    ranked = {
        "q1": ["d1", "x1", "d2", "x2"],
        "q2": ["x3", "x4"],
        "q3": ["d6", "x5", "x6", "x7", "x8", "x9", "xa", "xb", "xc", "d5", "d7"],
    }
    # the engine treats gold edges symmetrically (dup relations are symmetric,
    # src/JsonToCsvConverter.py:17-22), so the oracle loop runs on the closure
    gold_sym: dict[str, set] = {}
    for q, ds in gold.items():
        gold_sym.setdefault(q, set()).update(ds)
        for d in ds:
            gold_sym.setdefault(d, set()).add(q)
    n_q, found, p_at_k, map_ = _reference_metrics(ranked, gold_sym)

    gold_edges = spark.createDataFrame(
        [(q, d) for q, ds in gold.items() for d in ds], "src string, dst string"
    )
    rows = [
        (q, c, float(len(cands) - i))
        for q, cands in ranked.items()
        for i, c in enumerate(cands)
    ]
    scored = spark.createDataFrame(rows, "query_id string, candidate_id string, score double")
    got = ranked_retrieval_metrics(scored, gold_edges, k=10).collect()[0]
    assert got.n_queries == n_q
    assert got.found_at_k == found
    assert got.p_at_k == pytest.approx(p_at_k)
    assert got.map == pytest.approx(map_)


def test_asymmetric_metrics_match_reference_on_directed_dups(spark):
    """CQADupStack dups lists are DIRECTED (the dup question lists the
    original; the original lists nothing), and the reference's loop iterates
    only docs whose OWN list is non-empty, checking ``candidate in
    query.dups`` (BM25DuplicateRetriever.py:54-56,89). ``symmetric=False``
    reproduces exactly that; the default closure would make the listed
    originals queries too (different n_queries and denominators)."""
    gold = {"q1": {"d1"}, "q2": {"d2", "d3"}}  # directed: d1..d3 list nothing
    ranked = {
        "q1": ["d1", "x1"],
        "q2": ["x2", "d2", "x3"],
        # the originals also retrieve things — the reference never scores them
        "d1": ["q1", "x4"],
        "d2": ["q2"],
    }
    n_q, found, p_at_k, map_ = _reference_metrics(ranked, gold)
    assert n_q == 2  # only q1, q2 are queries under the reference loop

    gold_edges = spark.createDataFrame(
        [(q, d) for q, ds in gold.items() for d in ds], "src string, dst string"
    )
    rows = [
        (q, c, float(len(cands) - i))
        for q, cands in ranked.items()
        for i, c in enumerate(cands)
    ]
    scored = spark.createDataFrame(
        rows, "query_id string, candidate_id string, score double"
    )
    got = ranked_retrieval_metrics(
        scored, gold_edges, k=10, symmetric=False
    ).collect()[0]
    assert got.n_queries == n_q and got.found_at_k == found
    assert got.p_at_k == pytest.approx(p_at_k)
    assert got.map == pytest.approx(map_)
    # the symmetric default counts the originals as queries as documented
    sym = ranked_retrieval_metrics(scored, gold_edges, k=10).collect()[0]
    assert sym.n_queries == 5  # q1, q2, d1, d2, d3


def test_retrieval_on_fixture_finds_gold(spark, tiny_fixture, cfg):
    from cqaduplicatefind_spark.plans.pipeline import (
        retrieval_scored_pairs,
        run_pipeline,
    )

    pages, gold_edges, _ = tiny_fixture
    result = run_pipeline(spark, pages, cfg)
    ranked = retrieve_duplicates(retrieval_scored_pairs(result, cfg), k=cfg.top_k)
    m = ranked_retrieval_metrics(
        ranked.select("query_id", "candidate_id", "score"), gold_edges, k=cfg.top_k
    ).collect()[0]
    # every gold dup should be retrieved in top-10 on the fixture (clusters < 10)
    assert m.p_at_k > 0
    assert m.map >= 0.99, m.asDict()


# ---------- pluggable per-pair scorer seam ----------

def test_extra_scorer_reranks_retrieval(spark, cfg):
    """Registering a custom scorer through score_pairs (the reference's
    'alternative classifier' capability, src/NBAndXGBCountVectorClassifier.py)
    must add a score column usable as the ranking key in retrieve_duplicates."""
    from cqaduplicatefind_spark.operators.verify import score_pairs
    from cqaduplicatefind_spark.plans.pipeline import normalize_stage, signature_stage

    pages = spark.createDataFrame(
        [
            ("q", "alpha beta gamma delta epsilon zeta eta theta"),
            # c1: high Jaccard with q (near-identical)
            ("c1", "alpha beta gamma delta epsilon zeta eta iota"),
            # c2: lower Jaccard but much closer in length to q's doubled variant
            ("c2", "alpha beta gamma delta epsilon zeta kappa lambda"),
        ],
        "url string, text string",
    )
    sigs = signature_stage(normalize_stage(pages, cfg), cfg)
    pairs = spark.createDataFrame(
        [("c1", "q"), ("c2", "q")], "id_a string, id_b string"
    )

    def length_balance(df):
        lo = F.least("n_shingles_a", "n_shingles_b").cast("double")
        hi = F.greatest("n_shingles_a", "n_shingles_b").cast("double")
        return F.when(hi > 0, lo / hi).otherwise(F.lit(0.0))

    def inverted(df):
        return 1.0 - F.col("jaccard")

    scored = score_pairs(
        pairs, sigs, cfg, prefilter_margin=1.0,
        extra_scorers={"length_balance": length_balance, "inv_score": inverted},
    )
    rows = {(r["id_a"], r["id_b"]): r.asDict() for r in scored.collect()}
    assert all("length_balance" in r and "inv_score" in r for r in rows.values())
    for r in rows.values():
        assert abs(r["inv_score"] - (1.0 - r["jaccard"])) < 1e-9

    from cqaduplicatefind_spark.operators.topk import retrieve_duplicates

    by_jaccard = retrieve_duplicates(scored, k=2, score_col="jaccard")
    by_inverted = retrieve_duplicates(scored, k=2, score_col="inv_score")
    top_j = {r["query_id"]: r["candidate_id"]
             for r in by_jaccard.where(F.col("rank") == 1).collect()}
    top_i = {r["query_id"]: r["candidate_id"]
             for r in by_inverted.where(F.col("rank") == 1).collect()}
    assert top_j["q"] == "c1"          # exact Jaccard ranks the near-identical doc first
    assert top_i["q"] == "c2"          # custom scorer inverts the ranking


# ---------- corpus-level winnowing span pass ----------

def test_winnow_guarantee_shared_run_shares_fingerprint():
    """Winnowing bound (Schleimer et al. 2003): two token streams sharing an
    exact contiguous run of >= L + w - 1 tokens share >= 1 fingerprint."""
    import random

    from cqaduplicatefind_spark.operators.overlap import winnow_kernel, winnow_params

    rnd = random.Random(11)
    for min_span in (5, 12, 20, 50):
        gram, window = winnow_params(min_span)
        assert gram + window - 1 == min_span
        for trial in range(20):
            run = [f"r{trial}t{j}" for j in range(min_span)]
            a = [f"a{j}" for j in range(rnd.randint(0, 30))] + run + [
                f"A{j}" for j in range(rnd.randint(0, 30))
            ]
            b = [f"b{j}" for j in range(rnd.randint(0, 30))] + run + [
                f"B{j}" for j in range(rnd.randint(0, 30))
            ]
            fa = set(winnow_kernel(_h(a), gram, window).tolist())
            fb = set(winnow_kernel(_h(b), gram, window).tolist())
            assert fa & fb, f"no shared fingerprint at min_span={min_span}"
            # and disjoint streams share nothing
            c = [f"c{trial}x{j}" for j in range(len(a))]
            fc = set(winnow_kernel(_h(c), gram, window).tolist())
            assert not (fa & fc)


def test_span_candidates_find_low_jaccard_containment_pair(spark, cfg):
    """A page embedded in a boilerplate shell (Jaccard far below the LSH
    collision curve, shared run >= min_overlap_span) must be discovered by the
    winnowing pass and exactly verified."""
    from cqaduplicatefind_spark.config import DedupConfig
    from cqaduplicatefind_spark.operators.overlap import exact_span_edges

    content = " ".join(f"payload{j}" for j in range(30))
    shell = " ".join(f"chrome{j}" for j in range(120))
    docs = spark.createDataFrame(
        [
            ("bare", content),
            ("wrapped", f"{shell} {content} {shell}"),
            ("other", " ".join(f"noise{j}" for j in range(150))),
        ],
        "url string, norm_text string",
    )
    c = DedupConfig(min_overlap_span=25, shuffle_partitions=8,
                    signature_partitions=8)
    edges = exact_span_edges(docs, c).collect()
    pairs = {(r["id_a"], r["id_b"]): r["overlap_span"] for r in edges}
    assert ("bare", "wrapped") in pairs
    assert pairs[("bare", "wrapped")] == 30  # the exact payload run length
    assert all("other" not in p for p in pairs)


def test_span_candidates_short_circuit_on_cluster_pure_buckets(spark, cfg):
    """With cluster assignments supplied, a corpus whose every shared
    fingerprint bucket lies inside ONE cluster (the common case once LSH has
    clustered the near-dups) must yield zero span candidates — the
    heterogeneity aggregate short-circuits discovery before the pairing kernel
    ever launches. Cross-cluster buckets must still surface their pairs."""
    from cqaduplicatefind_spark.config import DedupConfig
    from cqaduplicatefind_spark.operators.overlap import span_candidates

    run = " ".join(f"dup{j}" for j in range(40))
    docs = spark.createDataFrame(
        [("a", run), ("b", f"{run} tail"),
         ("lone", " ".join(f"x{j}" for j in range(60)))],
        "url string, norm_text string",
    )
    c = DedupConfig(min_overlap_span=20, shuffle_partitions=8,
                    signature_partitions=8)
    same_cluster = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("lone", "lone")], "id string, cluster_id string"
    )
    assert span_candidates(docs, c, assignments=same_cluster).count() == 0
    split_cluster = spark.createDataFrame(
        [("a", "a"), ("b", "b"), ("lone", "lone")], "id string, cluster_id string"
    )
    got = {tuple(sorted((r.id_a, r.id_b)))
           for r in span_candidates(docs, c, assignments=split_cluster).collect()}
    assert ("a", "b") in got


def test_pipeline_clusters_shell_embedded_page(spark):
    """End-to-end (VERDICT r1 #1 done-criterion): with span_pass on, a page and
    its boilerplate-wrapped copy land in ONE cluster even though their Jaccard
    is below threshold; with span_pass off they stay apart."""
    from cqaduplicatefind_spark.config import DedupConfig
    from cqaduplicatefind_spark.plans.pipeline import run_pipeline

    content = " ".join(f"story{j} word{j}" for j in range(25))  # 50-token run
    shell = " ".join(f"boiler{j} nav{j}" for j in range(60))    # 120-token shell
    pages = spark.createDataFrame(
        [
            ("page", content),
            ("shellpage", f"{shell} {content} {shell}"),
            ("unrelated", " ".join(f"zzz{j} yyy{j}" for j in range(85))),
        ],
        "url string, text string",
    )
    base = dict(shingle_k=3, jaccard_threshold=0.7, min_overlap_span=40,
                shuffle_partitions=8, signature_partitions=8)

    on = run_pipeline(spark, pages, DedupConfig(span_pass=True, **base))
    c_on = {r["url"]: r["cluster_id"] for r in on.clusters.collect()}
    assert c_on["page"] == c_on["shellpage"]
    assert c_on["unrelated"] != c_on["page"]
    assert on.overlap_edges is not None

    off = run_pipeline(spark, pages, DedupConfig(span_pass=False, **base))
    c_off = {r["url"]: r["cluster_id"] for r in off.clusters.collect()}
    assert c_off["page"] != c_off["shellpage"]  # LSH alone cannot see this pair


# ---------- canonical representative per cluster ----------

def test_canonical_per_cluster_picks_best_and_breaks_ties(spark):
    """Highest score wins; equal scores break toward the smallest id;
    singletons keep themselves; n_members counts every member. The operator is
    an aggregate (map-side combinable min_by), so the plan must contain a
    partial aggregation, not a single-task-per-cluster window sort."""
    clusters = spark.createDataFrame(
        [("a1", "K1"), ("a2", "K1"), ("a3", "K1"),
         ("b1", "K2"), ("b2", "K2"),
         ("solo", "solo")],
        "url string, cluster_id string",
    )
    scores = spark.createDataFrame(
        [("a1", 0.5), ("a2", 0.9), ("a3", 0.9),
         ("b1", 0.3), ("b2", 0.3),
         ("solo", 0.1)],
        "url string, quality double",
    )
    out = canonical_per_cluster(clusters, scores, "quality")
    got = {r.cluster_id: (r.url, r.quality, r.n_members) for r in out.collect()}
    assert got == {
        "K1": ("a2", 0.9, 3),     # max score, tie a2<a3
        "K2": ("b1", 0.3, 2),     # all tied -> min id
        "solo": ("solo", 0.1, 1),
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_min_by" in plan or "HashAggregate" in plan
    assert "Window" not in plan


def test_canonical_per_cluster_unscored_members_count_and_rank_last(spark):
    """A member with no score row (or a NULL score) still counts in n_members
    and ranks LAST for representative selection; a cluster whose every member
    is unscored keeps its min-id member instead of vanishing from the
    deduplicated-corpus emit."""
    clusters = spark.createDataFrame(
        [("a1", "K1"), ("a2", "K1"), ("a3", "K1"),   # a3 has no score row
         ("c1", "K3"), ("c2", "K3"),                  # K3 entirely unscored
         ("d1", "K4"), ("d2", "K4")],                 # d1 scored NULL
        "url string, cluster_id string",
    )
    scores = spark.createDataFrame(
        [("a1", 0.5), ("a2", 0.9), ("d1", None), ("d2", 0.2)],
        "url string, quality double",
    )
    out = canonical_per_cluster(clusters, scores, "quality")
    got = {r.cluster_id: (r.url, r.quality, r.n_members) for r in out.collect()}
    assert got == {
        "K1": ("a2", 0.9, 3),      # unscored a3 counted, never wins
        "K3": ("c1", None, 2),     # all unscored: min id, cluster kept
        "K4": ("d2", 0.2, 2),      # NULL score ranks below a real score
    }


def test_canonical_per_cluster_duplicate_score_rows_dont_inflate(spark):
    """A scores side with several rows per id (a per-pair or multi-metric
    frame) fans out the join, but n_members must count DISTINCT members and
    the representative is the member's best-scoring row."""
    clusters = spark.createDataFrame(
        [("a1", "K1"), ("a2", "K1")], "url string, cluster_id string"
    )
    scores = spark.createDataFrame(
        [("a1", 0.4), ("a1", 0.8), ("a1", 0.6), ("a2", 0.7)],
        "url string, quality double",
    )
    out = canonical_per_cluster(clusters, scores, "quality")
    got = {r.cluster_id: (r.url, r.quality, r.n_members) for r in out.collect()}
    assert got == {"K1": ("a1", 0.8, 2)}


# ---------- span-candidate checkpoint lifecycle ----------

def test_span_checkpoint_freed_by_release(spark):
    """The span pass localCheckpoints its candidate set; DataFrame.unpersist()
    does NOT free localCheckpoint blocks (it only uncaches cacheManager
    entries), so the pipeline must free them by RDD id through the JVM's
    getPersistentRDDs. This pins that: after release(), the checkpoint RDD ids
    are gone from the persistent-RDD map; before it, they are present."""
    from cqaduplicatefind_spark.config import DedupConfig
    from cqaduplicatefind_spark.operators.connected_components import (
        _persistent_rdd_ids,
    )
    from cqaduplicatefind_spark.operators.overlap import _CheckpointHandle
    from cqaduplicatefind_spark.plans.pipeline import run_pipeline

    content = " ".join(f"story{j} word{j}" for j in range(25))
    shell = " ".join(f"boiler{j} nav{j}" for j in range(60))
    pages = spark.createDataFrame(
        [
            ("page", content),
            ("shellpage", f"{shell} {content} {shell}"),
            ("unrelated", " ".join(f"zzz{j} yyy{j}" for j in range(85))),
        ],
        "url string, text string",
    )
    result = run_pipeline(
        spark, pages,
        DedupConfig(span_pass=True, shingle_k=3, jaccard_threshold=0.7,
                    min_overlap_span=40, shuffle_partitions=8,
                    signature_partitions=8),
    )
    result.clusters.count()
    handles = [p for p in result.persisted if isinstance(p, _CheckpointHandle)]
    assert handles, "span candidates were non-empty -> a handle must exist"
    ids = set().union(*(h._ids for h in handles))
    assert ids, "handle must carry the checkpoint RDD ids"
    assert ids & _persistent_rdd_ids(spark), "checkpoint pinned before release"
    result.release()
    assert not ids & _persistent_rdd_ids(spark), "checkpoint freed by release"
