"""The driver's correctness gate checks only the FIRST 50 queries() entries in
dict order. Pin the rotation policy (round 5, "every other round"): a row may
sit past the gate ONLY if it was driver-checked green in the most recent
official CORRECTNESS artifact — so after each round, no registry row lacks an
official green entry more than two rounds old. Also pin that every row needing
official verification THIS round (the round-4 tail, rows whose code changed
this round, and new rows) sits inside the gate, and that the contract dicts
stay aligned."""

import glob
import json
import os

import __spark_entry__ as entry_mod

GATE = 50

# rows that MUST be driver-checked this round:
MUST_GATE = [
    # the full round-4 tail (last official check r1-r3, except
    # projection_pushdown which was gate row #50 in r4)
    "projection_pushdown",
    "filter_predicate",
    "semi_join_filter",
    "anti_join_gold_check",
    "broadcast_dim_join",
    "multiway_join_agg",
    "cross_join_tiny",
    "groupby_agg_tpch_q1",
    "groupby_count_histogram",
    "distinct_union",
    "accuracy_metric",
    "window_topk_per_group",
    "global_topn",
    "time_window_agg",
    "latest_event_per_user",
    "embedding_norms",
    "token_count_stats",
    "doc_fingerprint",
    # code changed in round 5 (hashed n-gram kernel + ALL its consumers —
    # bm25_retrieval_eval{,_directed} and overlap_token_spans build their
    # candidate/gold sets from q_ngram_jaccard too)
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "retrieval_metrics_p_at_k",
    "bm25_retrieval_eval",
    "bm25_retrieval_eval_directed",
    "overlap_token_spans",
    "qa_dumps_end_to_end",
    "dedup_pipeline_candidate_pairs",
    # new round-5 rows
    "multimodal_video_dedup",
    "dedup_pipeline_full_recall",
    # flagship / north-rule core rows stay gated every round
    "minhash_md5_signatures",
    "dedup_pipeline_accepted_edges",
    "dedup_pipeline_cluster_assignments",
    "streaming_incremental_edges",
]


def _recent_artifacts(k: int = 2) -> list[dict]:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    assert paths, "no official CORRECTNESS artifact found"
    out = []
    for p in paths[-k:]:
        with open(p) as f:
            out.append(json.load(f))
    return out


def test_must_gate_rows_inside_driver_window():
    names = list(entry_mod.queries())
    gated = set(names[:GATE])
    missing = [n for n in MUST_GATE if n not in gated]
    assert not missing, f"rows outside the driver's {GATE}-row gate: {missing}"


def test_tail_rows_recently_checked():
    """Every-other-round policy: a row past the gate must have a GREEN entry in
    one of the TWO most recent official artifacts. (Not "the latest": a round-N
    tail row is deliberately outside round N's own window, so the moment
    CORRECTNESS_rN lands, the latest artifact cannot contain it — its green
    entry is in rN-1, when it was inside. If the same row stayed in the tail a
    second consecutive round, both recent artifacts would miss it and this
    test forces the rotation.)"""
    arts = _recent_artifacts(2)
    names = list(entry_mod.queries())
    for n in names[GATE:]:
        green = any(
            isinstance(v := a.get(n), dict)
            and v.get("rows_match")
            and v.get("schema_match")
            and v.get("hash_match")
            for a in arts
        )
        assert green, (
            f"tail row {n} has no green entry in the two most recent official "
            f"artifacts — rotate it inside the {GATE}-row gate this round"
        )
    # and the declared tail is what actually sits past the gate
    assert set(names[GATE:]) <= set(entry_mod._STABLE_TAIL)


def test_oracle_sql_subset_and_order():
    qs = list(entry_mod.queries())
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    # oracle_sql iterates in the same priority order as queries()
    pos = {n: i for i, n in enumerate(qs)}
    idxs = [pos[n] for n in os_]
    assert idxs == sorted(idxs)
    # the deliberate rows-only set stays at exactly two full-config pipeline rows
    rows_only = [n for n in qs if n not in os_]
    assert sorted(rows_only) == [
        "dedup_pipeline_clusters",
        "dedup_pipeline_clusters_per_source",
    ]
