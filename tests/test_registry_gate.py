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
    # code changed in round 5 (hashed n-gram kernel + its consumers)
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "retrieval_metrics_p_at_k",
    "qa_dumps_end_to_end",
    "dedup_pipeline_candidate_pairs",
    # new round-5 row
    "multimodal_video_dedup",
    # flagship / north-rule core rows stay gated every round
    "minhash_md5_signatures",
    "dedup_pipeline_accepted_edges",
    "dedup_pipeline_cluster_assignments",
    "streaming_incremental_edges",
    "delta_dedup_edges",
    "delta_dedup_survivors",
]


def _latest_artifact() -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    assert paths, "no official CORRECTNESS artifact found"
    with open(paths[-1]) as f:
        return json.load(f)


def test_must_gate_rows_inside_driver_window():
    names = list(entry_mod.queries())
    gated = set(names[:GATE])
    missing = [n for n in MUST_GATE if n not in gated]
    assert not missing, f"rows outside the driver's {GATE}-row gate: {missing}"


def test_tail_rows_checked_last_round():
    """Every-other-round policy: a row past the gate must have a GREEN entry in
    the most recent official artifact (it was inside the previous round's
    window and passed all three checks) — a tail row can therefore never go
    more than one round without official driver verification."""
    art = _latest_artifact()
    names = list(entry_mod.queries())
    for n in names[GATE:]:
        v = art.get(n)
        assert isinstance(v, dict), f"tail row {n} absent from latest artifact"
        assert (
            v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
        ), f"tail row {n} was not green in the latest artifact: {v}"
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
