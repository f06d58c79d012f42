"""Product-quantization invariants beyond the oracle hash: codebook
round-trip exactness, nibble-packing bounds, and ADC rank quality vs the
exact brute-force baseline."""

from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark.operators import similarity as S
from tests.conftest import SF_DIR


def _seed_ids(spark):
    rows = (
        S._vectors(spark, SF_DIR)
        .selectExpr("vec_id", f"{S._PQ_RK} AS rk")
        .orderBy("rk", "vec_id")
        .limit(S.PQ_K)
        .collect()
    )
    return {r.vec_id for r in rows}


def test_pq_seeds_quantize_to_zero_error(spark):
    """Every codebook seed IS one of the centroids in each subspace, so
    its quantization error must be exactly 0.0 — a bit-level round-trip
    check on collect -> literal -> distance fold."""
    seeds = _seed_ids(spark)
    rows = {r.vec_id: r for r in
            S.pq_codebook_assign(spark, SF_DIR).collect()}
    assert seeds <= set(rows)
    for vid in seeds:
        assert rows[vid].quant_err == 0.0, vid
    # non-seed vectors carry positive error (duplicates aside, the
    # synthetic corpus has none)
    assert sum(1 for r in rows.values() if r.quant_err > 0) \
        >= len(rows) - len(seeds)


def test_pq_codes_within_nibble_range(spark):
    rows = S.pq_codebook_assign(spark, SF_DIR).collect()
    hi = S.PQ_K ** S.PQ_M
    for r in rows:
        assert 0 <= r.pq_code < hi
        assert r.quant_err >= 0.0


def test_pq_adc_recall_against_exact(spark):
    """ADC over 4-bit codes is lossy but must stay correlated with the
    exact ranking: mean recall@k against brute-force cosine top-k has to
    clear a floor a broken codebook (or a scrambled lookup) would miss."""
    exact = S.ann_bruteforce_topk(spark, SF_DIR).collect()
    adc = S.ann_pq_adc_topk(spark, SF_DIR).collect()
    by_q_exact, by_q_adc = {}, {}
    for r in exact:
        by_q_exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in adc:
        by_q_adc.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(by_q_exact) == set(by_q_adc)
    recalls = [len(by_q_exact[q] & by_q_adc[q]) / len(by_q_exact[q])
               for q in by_q_exact]
    assert sum(recalls) / len(recalls) >= 0.2, recalls


def test_pq_adc_plan_broadcasts_queries_only(spark):
    """Same posture as the other ANN variants: the tiny query set is the
    single broadcast; the coded corpus streams (never broadcast, never a
    CartesianProduct); assignment stays JVM-side codegen."""
    df = S.ann_pq_adc_topk(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastExchange") == 1
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pq_assign_scan_local(spark):
    """Codebook assignment must be shuffle-free expression work: no
    joins, no aggregation exchange before the final presentation sort
    (the fan_out repartition is the only exchange besides it)."""
    df = S.pq_codebook_assign(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_refinement_is_a_lloyd_step(spark):
    """Independent numpy recompute: with centroids derived from the init
    assignment, every vector's final cluster must be at least as close as
    its init cluster (argmin property of the reassignment), clusters stay
    in range, and `moved` is exactly init != final."""
    import numpy as np

    from qucosa_fcrepo_reportingdb_spark.plans import advanced as A
    from qucosa_fcrepo_reportingdb_spark.plans.common import t

    rows = {r.vec_id: r for r in
            A.kmeans_refine_assignments(spark, SF_DIR).collect()}
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in
           t(spark, SF_DIR, "embeddings").collect()}
    assert set(rows) == set(emb)

    by_cluster = {}
    for vid, r in rows.items():
        assert 0 <= r.cluster_init < A.KM_K
        assert 0 <= r.cluster_final < A.KM_K
        assert r.moved == (r.cluster_init != r.cluster_final)
        by_cluster.setdefault(r.cluster_init, []).append(emb[vid])
    centroids = {c: np.mean(vs, axis=0) for c, vs in by_cluster.items()}
    for vid, r in rows.items():
        d_final = np.sum((emb[vid] - centroids[r.cluster_final]) ** 2)
        d_init = np.sum((emb[vid] - centroids[r.cluster_init]) ** 2)
        assert d_final <= d_init + 1e-9, vid


def test_multiprobe_recall_dominates_single_probe(spark):
    """Probing the 8 Hamming-1 buckets can only ADD candidates: every
    single-bucket neighbor set is a subset of the multi-probe candidate
    space, so recall@k vs brute force must not decrease (and the probe
    query plan keeps the single query-side broadcast)."""
    def neighbor_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    exact = neighbor_sets(S.ann_bruteforce_topk(spark, SF_DIR))
    single = neighbor_sets(S.ann_lsh_topk(spark, SF_DIR))
    multi = neighbor_sets(S.ann_lsh_multiprobe_topk(spark, SF_DIR))

    def recall(approx):
        per_q = [len(exact[q] & approx.get(q, set())) / len(exact[q])
                 for q in exact]
        return sum(per_q) / len(per_q)

    assert recall(multi) >= recall(single)

    plan = S.ann_lsh_multiprobe_topk(spark, SF_DIR) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastExchange") == 1


def test_ivf_rebalance_plan_invariants(spark):
    """Action semantics: occupancies reconcile with the corpus, split
    rows get >= 2 subcells sized by the integer ceiling, merge rows name
    a distinct target cell with a real cosine, keep rows carry neither."""
    rows = S.ivf_rebalance_plan(spark, SF_DIR).collect()
    total = sum(r.occupancy for r in rows)
    n_cells = len(rows)
    assert total > 0 and n_cells >= 2
    for r in rows:
        assert abs(r.mean_occupancy - total / n_cells) < 1e-9
        if r.action == "split":
            want = -(-r.occupancy * n_cells // total)  # ceil
            assert r.n_subcells == want >= 2
            assert r.merge_target is None
        elif r.action == "merge":
            assert r.n_subcells == 1
            assert r.merge_target is not None
            assert r.merge_target != r.cell
            assert -1.0 <= r.merge_cosine <= 1.0
        else:
            assert r.action == "keep"
            assert r.n_subcells == 1 and r.merge_target is None
