"""SemDeDup-style kept-set: exact path vs a brute-force oracle, RP-LSH path
recall on planted duplicates, and the IVF-representative path's
O(m)-per-cluster contract."""

from __future__ import annotations

import numpy as np
import pytest

from cqaduplicatefind_spark.operators.ann import semantic_dedup_kept


def _vec_df(spark, vecs):
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def planted(spark):
    """60 base vectors + 20 planted near-copies (tiny noise, cosine ~0.9999):
    every planted copy must be dominated by its (smaller-id) source."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(60, 16))
    copies = base[:20] + rng.normal(scale=1e-4, size=(20, 16))
    vecs = np.vstack([base, copies])
    return _vec_df(spark, vecs).cache(), vecs


def _brute_kept(vecs, threshold):
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = m @ m.T
    kept = []
    for i in range(len(vecs)):
        if not any(sims[i, j] >= threshold for j in range(i)):
            kept.append(i)
    return set(kept)


def test_exact_matches_brute_force(spark, planted):
    df, vecs = planted
    got = {
        r.vec_id
        for r in semantic_dedup_kept(df, threshold=0.95, method="exact").collect()
    }
    assert got == _brute_kept(vecs, 0.95)


def test_rp_path_drops_all_planted_copies(spark, planted):
    df, vecs = planted
    kept = {
        r.vec_id
        for r in semantic_dedup_kept(df, threshold=0.99, method="rp").collect()
    }
    # planted copies (ids 60..79) are near-identical to ids 0..19: RP buckets
    # collide at cosine ~1 with probability ~1 across 6 tables
    assert kept.isdisjoint(set(range(60, 80)))
    assert set(range(60)) <= kept  # base vectors are mutually random: all kept
    # kept-set is a subset of exact (RP can only miss pairs, never invent them)
    exact = {
        r.vec_id
        for r in semantic_dedup_kept(df, threshold=0.99, method="exact").collect()
    }
    assert exact <= kept


def test_ivf_representative_path(spark, planted):
    df, vecs = planted
    kept = {
        r.vec_id
        for r in semantic_dedup_kept(
            df, threshold=0.99, method="ivf", n_centroids=8
        ).collect()
    }
    # a planted copy lands in its source's cluster (cosine ~1 beats any other
    # centroid); it is dropped iff the source IS the representative or the
    # representative itself sits at >=0.99 — with random base vectors the
    # only >=0.99 neighbor is the source, so copies whose source is the
    # cluster min-id must be dropped, and no base vector may ever be dropped
    assert set(range(60)) <= kept
    # at least the copies of per-cluster min-id sources are gone: with 8
    # clusters over 60 random bases, some copy's source is its list's min;
    # assert the path dropped SOMETHING and never a base vector
    assert len(kept) < 80
    # representative-only comparison can MISS dominations but never invent
    # them: the IVF kept set is a superset of the exact kept set
    exact = {
        r.vec_id
        for r in semantic_dedup_kept(df, threshold=0.99, method="exact").collect()
    }
    assert exact <= kept


def test_bring_your_own_pairs_seam(spark, planted):
    df, _ = planted
    pairs = spark.createDataFrame(
        [(0, 61), (5, 62)], "id_a long, id_b long"
    )
    kept = {r.vec_id for r in semantic_dedup_kept(df, pairs=pairs).collect()}
    assert kept == set(range(80)) - {61, 62}
