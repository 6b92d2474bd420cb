"""The driver's correctness gate checks only the FIRST 50 queries() entries in
dict order. Pin that every row needing official driver verification this round
(the round-3 registry tail that the 50-row gate never reached, plus everything
new in round 4) sits inside the gate, and that the contract dicts stay aligned."""

import __spark_entry__ as entry_mod

GATE = 50

# rows that have never appeared in (or are new since) an official CORRECTNESS
# artifact — these MUST be driver-checked this round
MUST_GATE = [
    "pii_redaction",
    "line_boilerplate_stats",
    "line_dedup_docs",
    "intra_doc_line_dedup",
    "c4_clean_docs",
    "repetition_features",
    "contamination_flags",
    "fuzzy_contamination_flags",
    "top_ngrams_corpus",
    "stratified_sample_docs",
    "shard_packing",
    "cap_per_host_topk",
    "corpus_prep_end_to_end",
    "crawl_corpus_end_to_end",
    # new round-4 rows
    "bm25_retrieval_eval_directed",
    "multimodal_phash_groups",
    "multimodal_audio_dedup",
    # converted from rows-only to full oracles in round 4
    "qa_dumps_end_to_end",
    "dedup_pipeline_candidate_pairs",
]


def test_must_gate_rows_inside_driver_window():
    names = list(entry_mod.queries())
    gated = set(names[:GATE])
    missing = [n for n in MUST_GATE if n not in gated]
    assert not missing, f"rows outside the driver's {GATE}-row gate: {missing}"


def test_tail_rows_are_long_stable():
    """Only rows with a multi-round green driver history may sit past the
    gate."""
    names = list(entry_mod.queries())
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
