"""Corpus-preparation operators (operators/corpus.py): semantic properties
the oracle hash cannot express (cluster consistency, budget bounds, exact
strata, benchmark exclusion)."""

import pytest
from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark.operators import corpus as C
from qucosa_fcrepo_reportingdb_spark.operators.dedup import dedup_ngram_jaccard
from tests.conftest import SF_DIR


def test_pack_respects_document_boundaries(spark):
    rows = C.pack_sequences(spark, SF_DIR).collect()
    # every document appears exactly once, wholly in one pack
    assert len({r.doc_id for r in rows}) == len(rows)
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        cum = 0
        prev_pack = 0
        for r in shard_rows:
            cum += r.n_tokens
            assert r.cum_tokens == cum
            # pack ids are monotone within a shard
            assert r.pack_id >= prev_pack
            prev_pack = r.pack_id
            # a document belongs to the pack its cumulative end falls in
            assert r.pack_id == (cum - 1) // C.PACK_BUDGET_TOKENS


def test_stratified_sample_exact_sizes_and_determinism(spark):
    out1 = C.stratified_sample(spark, SF_DIR)
    sizes = {r.lang: r.n for r in
             out1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r.lang: r.n for r in
              C.t(spark, SF_DIR, "documents")
              .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(C.STRATUM_SIZE, totals[lang])
    # pure function of the keys: second run identical
    assert sorted(map(tuple, out1.collect())) == \
        sorted(map(tuple, C.stratified_sample(spark, SF_DIR).collect()))


def test_decontaminate_excludes_benchmark_docs(spark):
    out = C.decontaminate_ngram_overlap(spark, SF_DIR)
    out_ids = {r.doc_id for r in out.collect()}
    docs = C.t(spark, SF_DIR, "documents").select("doc_id").collect()
    bench = {r.doc_id for r in docs
             if (r.doc_id * C.MULT) % C.MOD < C.BENCH_RATE}
    assert bench, "benchmark split empty at this SF"
    assert not (out_ids & bench)          # benchmark rows never flagged
    assert out_ids == {r.doc_id for r in docs} - bench  # full corpus covered


def test_connected_components_consistent_with_pairs(spark):
    comps = {r.doc_id: r.component_id
             for r in C.dedup_connected_components(spark, SF_DIR).collect()}
    pairs = dedup_ngram_jaccard(spark, SF_DIR).select("d1", "d2").collect()
    if not pairs:
        pytest.skip("no duplicate pairs at this SF")
    # endpoints of every pair land in the same component
    for p in pairs:
        assert comps[p.d1] == comps[p.d2]
    # component id is the minimum member of its cluster
    members = {}
    for doc, comp in comps.items():
        members.setdefault(comp, []).append(doc)
    for comp, docs in members.items():
        assert comp == min(docs)


def test_ngram_topk_counts(spark):
    rows = C.ngram_topk(spark, SF_DIR).collect()
    assert 0 < len(rows) <= C.NGRAM_TOP_K
    # ordered by doc_freq desc with deterministic tiebreaks
    freqs = [(r.doc_freq, r.total_count) for r in rows]
    assert freqs == sorted(freqs, key=lambda t: (-t[0], -t[1]))
    for r in rows:
        assert r.total_count >= r.doc_freq >= 1
        assert len(r.ngram.split(" ")) == 3


def test_chunk_documents_covers_every_token(spark):
    toks = {r.doc_id: r.n for r in
            C.t(spark, SF_DIR, "documents")
            .selectExpr("doc_id",
                        "size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))"
                        " AS n").collect()}
    chunks = C.chunk_documents(spark, SF_DIR).collect()
    by_doc = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        # chunk starts advance by the stride; first starts at token 1
        assert [r.start_token for r in rows] == \
            list(range(1, toks[doc_id] + 1, C.CHUNK_STRIDE))
        # consecutive chunks overlap by CHUNK_TOKENS - CHUNK_STRIDE
        for a, b in zip(rows, rows[1:]):
            assert b.start_token - a.start_token == C.CHUNK_STRIDE
        for r in rows:  # each chunk holds every token it can reach
            assert r.chunk_tokens == min(C.CHUNK_TOKENS,
                                         toks[doc_id] - r.start_token + 1)
        last = rows[-1]
        assert last.start_token + last.chunk_tokens - 1 == toks[doc_id]
    # every non-empty doc is chunked
    assert set(by_doc) == {d for d, n in toks.items() if n > 0}


def test_repetition_ratio_bounds(spark):
    rows = C.repetition_stats(spark, SF_DIR).collect()
    for r in rows:
        assert 0 < r.top_token_ratio <= 1.0
        assert r.n_distinct <= r.n_tokens
        assert r.top_token_count * r.n_distinct >= r.n_tokens  # max >= mean
