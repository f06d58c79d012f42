"""Property-based tests: state-machine invariants (pure, fast via
hypothesis) and batch cross-engine hash equivalence on randomized corpora."""

import random
import string
from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from qucosa_fcrepo_reportingdb_spark.streaming.state import (
    HarvestState,
    PageObservation,
    build_request_params,
    compute_wait,
    next_state,
)

TS = st.datetimes(min_value=datetime(2000, 1, 1),
                  max_value=datetime(2030, 1, 1))
TOKEN = st.one_of(st.none(), st.just(""), st.text(min_size=1, max_size=20))
ERRORS = st.dictionaries(
    st.sampled_from(["noRecordsMatch", "badResumptionToken", "badArgument",
                     "badVerb"]),
    st.just("msg"), max_size=2)


@st.composite
def states(draw):
    return HarvestState(
        run_id=draw(st.integers(min_value=1, max_value=10**6)),
        timestamp_of_run=draw(TS),
        response_date=draw(TS),
        resumption_token=draw(TOKEN),
        next_from_timestamp=draw(st.one_of(st.none(), TS)),
    )


@st.composite
def pages(draw):
    return PageObservation(
        response_date=draw(st.one_of(st.none(), TS)),
        resumption_token=draw(TOKEN),
        errors=draw(ERRORS),
    )


@given(states(), pages(), TS, st.booleans())
@settings(max_examples=300, deadline=None)
def test_next_state_invariants(last, page, start, fc3):
    s = next_state(last, page, start, fc3)
    # run sequence strictly increases; timestamps recorded
    assert s.run_id == last.run_id + 1
    assert s.timestamp_of_run == start
    assert s.response_date is not None
    # the token is always the observed one
    assert s.resumption_token == page.resumption_token
    # the watermark only ever advances to start_of_run or stays backed up
    assert s.next_from_timestamp in (start, last.next_from_timestamp)
    # any error other than noRecordsMatch never advances the watermark
    if page.errors and "noRecordsMatch" not in page.errors:
        assert s.next_from_timestamp == last.next_from_timestamp
    # noRecordsMatch counts as success-with-empty-page
    if "noRecordsMatch" in page.errors:
        assert s.next_from_timestamp == start


@given(states(), pages(), TS)
@settings(max_examples=100, deadline=None)
def test_mid_pagination_backs_up_watermark(last, page, start):
    # mid-pagination means a NON-BLANK token: the reference tests
    # StringUtils.isBlank (OaiHarvester.java:357-385), so a
    # whitespace-only token ('\r') counts as sequence COMPLETE, not
    # mid-pagination — the guard must use the state machine's own
    # blankness predicate (hypothesis found the '\r' case in round 8)
    from qucosa_fcrepo_reportingdb_spark.streaming.state import _is_blank
    if not page.errors and not _is_blank(page.resumption_token):
        s = next_state(last, page, start)
        assert s.next_from_timestamp == last.next_from_timestamp


@given(states(), st.booleans())
@settings(max_examples=200, deadline=None)
def test_request_params_well_formed(state, fc3):
    p = build_request_params(state, fc3)
    assert p["verb"] == "ListIdentifiers"
    if state.has_resumption_token:
        assert set(p) == {"verb", "resumptionToken"}
    else:
        assert "metadataPrefix" in p
        if "from" in p:
            assert p["from"].endswith("Z") != fc3


@given(states(), TS, st.booleans())
@settings(max_examples=200, deadline=None)
def test_wait_bounded_by_poll_interval(last, now, err):
    poll = timedelta(seconds=300)
    w = compute_wait(last, now, poll, last_run_resulted_in_error=err)
    assert timedelta(0) <= w <= poll


def test_cross_engine_hashes_on_random_corpus(spark):
    """The deterministic-hash contract on adversarial text: random ASCII
    incl. punctuation/whitespace runs, empty-ish strings, long tokens."""
    import duckdb

    from qucosa_fcrepo_reportingdb_spark.functions import hashing as H

    rng = random.Random(1234)
    alphabet = string.ascii_letters + string.digits + "    .,;!?-_'\"\n"
    corpus = [
        "".join(rng.choice(alphabet)
                for _ in range(rng.randrange(1, 400)))
        for _ in range(150)
    ] + ["", "   ", "a", "x" * 500, "7 7 7 7 7 7 7"]

    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)],
                                "doc_id int, text string")
    spark_rows = (
        sdf.selectExpr("doc_id", f"{H.tokens('text', 'spark')} AS toks")
        .selectExpr("doc_id", f"{H.token_hashes('toks', 'spark')} AS th")
        .selectExpr("doc_id",
                    f"{H.shingle_hashes('th', 'spark')} AS sh",
                    f"{H.simhash('th', 'spark')} AS simhash",
                    f"{H.fingerprint('th', 'spark')} AS fp")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)",
                    [(i, s) for i, s in enumerate(corpus)])
    duck = con.execute(f"""
        WITH toks AS (SELECT doc_id, {H.tokens('text', 'duck')} AS toks
                      FROM docs),
        th AS (SELECT doc_id, {H.token_hashes('toks', 'duck')} AS th
               FROM toks)
        SELECT doc_id, {H.shingle_hashes('th', 'duck')} AS sh,
               {H.simhash('th', 'duck')} AS simhash,
               {H.fingerprint('th', 'duck')} AS fp
        FROM th ORDER BY doc_id
    """).fetchall()
    duck_by_id = {r[0]: r for r in duck}
    for row in spark_rows:
        d = duck_by_id[row.doc_id]
        assert sorted(row.sh or []) == sorted(d[1] or []), row.doc_id
        assert row.simhash == d[2], row.doc_id
        assert row.fp == d[3], row.doc_id


def test_winnowing_guarantee_on_random_corpus(spark):
    """Winnowing's detection guarantee: if two documents share a token
    run of length >= WINNOW_WINDOW + 3 - 1 (window + k-gram - 1), their
    selected fingerprint sets intersect. Randomized pairs with an
    injected common run, one Spark pass over the whole batch."""
    from qucosa_fcrepo_reportingdb_spark.operators.corpus import (
        WINNOW_WINDOW,
    )
    from qucosa_fcrepo_reportingdb_spark.functions import hashing as H

    rng = random.Random(99)
    words = ["w%d" % i for i in range(50)]
    docs = []
    pairs = []
    for pi in range(20):
        run_len = WINNOW_WINDOW + 3 - 1 + rng.randrange(0, 4)
        run = [rng.choice(words) for _ in range(run_len)]
        a = ([rng.choice(words) for _ in range(rng.randrange(0, 15))]
             + run
             + [rng.choice(words) for _ in range(rng.randrange(0, 15))])
        b = ([rng.choice(words) for _ in range(rng.randrange(0, 15))]
             + run
             + [rng.choice(words) for _ in range(rng.randrange(0, 15))])
        docs.append((2 * pi, " ".join(a)))
        docs.append((2 * pi + 1, " ".join(b)))
        pairs.append((2 * pi, 2 * pi + 1))
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    w = WINNOW_WINDOW
    grams = H.ordered_shingle_hashes("th", "spark")
    rows = (
        sdf.selectExpr("doc_id", f"{H.tokens('text', 'spark')} AS toks")
        .selectExpr("doc_id", f"{H.token_hashes('toks', 'spark')} AS th")
        .selectExpr("doc_id", f"{grams} AS g")
        .selectExpr("doc_id",
                    f"array_distinct(transform("
                    f"sequence(1, greatest(size(g) - {w} + 1, 1)), "
                    f"i -> array_min(slice(g, i, {w})))) AS fps")
        .collect()
    )
    fps = {r.doc_id: set(r.fps) for r in rows}
    for d1, d2 in pairs:
        assert fps[d1] & fps[d2], (d1, d2)


def test_cross_engine_event_queries_on_random_corpus(spark, tmp_path):
    """Randomized events table through four oracle-checked event
    queries: the fixed driver dataset can mask tie-handling and boundary
    bugs (equal timestamps, duplicate values, empty-ish hours) that a
    seeded random corpus with FORCED ties surfaces."""
    import duckdb
    from datetime import datetime, timedelta
    from qucosa_fcrepo_reportingdb_spark.plans import events as E

    rng = random.Random(4242)
    base = datetime(2024, 3, 1)
    rows = []
    for eid in range(600):
        # coarse second resolution FORCES equal-ts ties across users and
        # within a user's stream — the tie-break paths the driver data
        # (microsecond timestamps) never exercises
        ts = base + timedelta(seconds=rng.randrange(0, 72 * 3600, 30))
        rows.append((eid, ts, rng.randrange(1, 20),
                     rng.choice(["view", "click", "error"]),
                     round(rng.uniform(0, 200), 2), "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string") \
        .coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet/*.parquet'")
    sf = str(tmp_path)
    from tests.oracle import compare
    for name, fn, sql in [
        ("sessionize", E.sessionize_events, E.SESSIONIZE_SQL),
        ("hourly", E.hourly_event_stats, E.HOURLY_SQL),
        ("session_window", E.session_window_rollup, E.SESSION_WINDOW_SQL),
        ("ivm", E.ivm_hourly_refresh, E.IVM_SQL),
    ]:
        r = compare(fn(spark, sf), con, sql)
        assert r["ok"], (name, r.get("detail", "")[:300])


def test_cross_engine_document_queries_on_adversarial_corpus(
        spark, tmp_path):
    """Randomized documents with forced edge shapes — empty text,
    single tokens, exact duplicates, near-duplicates, single-doc
    languages — through five oracle-checked corpus operators."""
    import duckdb
    from qucosa_fcrepo_reportingdb_spark.operators import corpus as C
    from qucosa_fcrepo_reportingdb_spark.operators import dedup as D

    rng = random.Random(777)
    words = ["tok%d" % i for i in range(40)]
    rows = []
    for i in range(60):
        kind = i % 6
        if kind == 0:
            text = ""                                     # empty
        elif kind == 1:
            text = rng.choice(words)                      # single token
        elif kind == 2:
            text = " ".join(rng.choice(words) for _ in range(30))
        elif kind == 3:
            text = rows[i - 1][1]                         # exact dup
        elif kind == 4:                                   # near dup
            text = rows[i - 2][1] + " " + rng.choice(words)
        else:
            text = " ".join(rng.choice(words) for _ in range(3))
        lang = "solo%d" % i if i % 17 == 0 else rng.choice(["en", "de"])
        rows.append((i, text, lang, "web", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long") \
        .coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet/*.parquet'")
    sf = str(tmp_path)
    from tests.oracle import compare
    for name, fn, sql in [
        ("exact", D.dedup_exact, D.DEDUP_EXACT_SQL),
        ("jaccard", D.dedup_ngram_jaccard, D.DEDUP_JACCARD_SQL),
        ("novelty", C.shingle_novelty_scores, C.SHINGLE_NOVELTY_SQL),
        ("winnowing", C.winnowing_fingerprints, C.WINNOWING_SQL),
        ("trim", C.length_trim_filter, C.LENGTH_TRIM_SQL),
    ]:
        r = compare(fn(spark, sf), con, sql)
        assert r["ok"], (name, r.get("detail", "")[:300])


def test_cross_engine_embedding_queries_with_zero_vectors(spark, tmp_path):
    """Zero-norm and identical vectors through the cosine family: a
    zero vector has no direction, so both engines must EXCLUDE it
    (under ANSI Spark the 0/0 division aborted the job before the
    nrm > 0 guard; DuckDB silently NULLed the cosine instead)."""
    import duckdb

    rng = random.Random(5)
    rows = []
    for i in range(40):
        if i in (0, 1):
            v, lab = [0.0] * 64, 0                   # zero vectors
        elif i in (2, 3):
            v, lab = [1.0] + [0.0] * 63, 1           # identical units
        else:
            v = [round(rng.uniform(-1, 1), 3) for _ in range(64)]
            lab = i % 10
        rows.append((i, v, lab))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int") \
        .coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{tmp_path}/embeddings.parquet/*.parquet'")
    import __spark_entry__ as em
    from tests.oracle import compare
    q, o = em.queries(), em.oracle_sql()
    for name in ["dedup_embedding_cosine", "ann_bruteforce_topk",
                 "ann_lsh_topk", "semdedup_keep"]:
        r = compare(q[name](spark, str(tmp_path)), con, o[name])
        assert r["ok"], (name, r.get("detail", "")[:300])


def test_cross_engine_relational_queries_on_edge_corpus(spark, tmp_path):
    """Synthetic mini-TPC-H with forced relational edges — customers
    with zero orders, an exact revenue TIE for the q15 argmax, brands
    whose filter selects nothing — through four classic-shape queries."""
    import duckdb
    from datetime import datetime
    from qucosa_fcrepo_reportingdb_spark.plans import tpch as T

    d = datetime(1997, 2, 1)
    tables = {
        "region": ([(0, "AMERICA")], "r_regionkey int, r_name string"),
        "nation": ([(0, "NATION_0", 0)],
                   "n_nationkey int, n_name string, n_regionkey int"),
        "customer": ([(1, "c1", 0, 100.0, "BUILDING"),
                      (2, "c2", 0, 900.0, "AUTOMOBILE"),   # no orders
                      (3, "c3", 0, 900.0, "MACHINERY")],   # no orders, tie
                     "c_custkey long, c_name string, c_nationkey int,"
                     " c_acctbal double, c_mktsegment string"),
        "supplier": ([(1, "s1", 0, 0.0), (2, "s2", 0, 0.0)],
                     "s_suppkey long, s_name string, s_nationkey int,"
                     " s_acctbal double"),
        "part": ([(1, "p1", "Brand#1", "PROMO", 5, 10.0)],
                 "p_partkey long, p_name string, p_brand string,"
                 " p_type string, p_size int, p_retailprice double"),
        "orders": ([(10, 1, "O", 50.0, d, "1-URGENT")],
                   "o_orderkey long, o_custkey long, o_orderstatus string,"
                   " o_totalprice double, o_orderdate timestamp,"
                   " o_orderpriority string"),
        # two suppliers with IDENTICAL revenue -> q15 must return both
        "lineitem": ([(10, 1, 1, 1, 2.0, 100.0, 0.0, 0.0, "N", "O",
                       datetime(1997, 2, 10)),
                      (10, 1, 2, 2, 2.0, 100.0, 0.0, 0.0, "N", "O",
                       datetime(1997, 2, 10))],
                     "l_orderkey long, l_partkey long, l_suppkey long,"
                     " l_linenumber int, l_quantity double,"
                     " l_extendedprice double, l_discount double,"
                     " l_tax double, l_returnflag string,"
                     " l_linestatus string, l_shipdate timestamp"),
    }
    con = duckdb.connect()
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(str(tmp_path / f"{name}.parquet"))
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"'{tmp_path}/{name}.parquet/*.parquet'")
    sf = str(tmp_path)
    from tests.oracle import compare
    checks = [
        ("q13", T.q13_customer_order_distribution, T.Q13_SQL),
        ("q15", T.q15_top_supplier, T.Q15_SQL),
        ("q17", T.q17_small_quantity_revenue, T.Q17_SQL),
        ("q22", T.q22_idle_balance_customers, T.Q22_SQL),
    ]
    for name, fn, sql in checks:
        r = compare(fn(spark, sf), con, sql)
        assert r["ok"], (name, r.get("detail", "")[:300])
    # the tie actually fires: q15 returns BOTH suppliers
    assert fn is not None and len(
        T.q15_top_supplier(spark, sf).collect()) == 2


# --- triangle enumeration vs brute force --------------------------------------
def test_triangle_counts_match_bruteforce_on_random_graphs(spark):
    """The production wedge enumeration (corpus.triangle_member_counts —
    the exact code dup_graph_triangles runs, pair table injected) must
    count the same per-node triangle memberships as a brute-force over
    all id-ordered triples — on random graphs including hubs (the case
    the degree orientation exists for), graphs with no triangles, and
    vertices with ids above 2^32 (where a packed deg*2^32+id order key
    would corrupt the orientation)."""
    import itertools

    from qucosa_fcrepo_reportingdb_spark.operators.corpus import (
        triangle_member_counts,
    )

    rng = random.Random(7)
    for trial in range(6):
        n = rng.randint(4, 14)
        # dense enough to force triangles in most trials; trial 0 sparse
        p = 0.15 if trial == 0 else rng.uniform(0.3, 0.7)
        # trial 5: ids straddle 2^32 (the packed-key failure regime)
        ids = ([(1 << 32) - 7 + i for i in range(n)]
               if trial == 5 else list(range(n)))
        edges = [(ids[a], ids[b]) for a in range(n) for b in range(a + 1, n)
                 if rng.random() < p]
        expected: dict[int, int] = {}
        eset = set(edges)
        for a, b, c in itertools.combinations(ids, 3):
            if (a, b) in eset and (b, c) in eset and (a, c) in eset:
                for v in (a, b, c):
                    expected[v] = expected.get(v, 0) + 1

        pairs = spark.createDataFrame(
            edges or [(0, 1)], "d1 long, d2 long")
        if not edges:
            pairs = pairs.filter("d1 < 0")
        got = {r.doc_id: r.tri_count
               for r in triangle_member_counts(pairs).collect()}
        assert got == expected, f"trial {trial}: {got} != {expected}"


# --- change feed reconstructs the new snapshot --------------------------------
def test_keyed_diff_reconstructs_new_snapshot(spark):
    """Applying the diff to the old snapshot must yield exactly the new
    snapshot (delete removed keys, upsert inserted/updated ones) — on
    random keyed tables with NULLs, for several seeds."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from qucosa_fcrepo_reportingdb_spark.operators.maintenance import (
        keyed_diff,
    )

    rng = random.Random(11)
    for _ in range(5):
        keys = range(rng.randint(3, 10))
        def rand_rows():
            return [
                Row(k=k, a=rng.choice([None, "x", "y", "z"]),
                    b=rng.choice([None, 1, 2, 3]))
                for k in keys if rng.random() < 0.8
            ]
        old_rows, new_rows = rand_rows(), rand_rows()
        schema = "k long, a string, b int"
        old = spark.createDataFrame(old_rows or [], schema)
        new = spark.createDataFrame(new_rows or [], schema)
        diff = keyed_diff(old, new, ["k"]).collect()

        state = {r.k: (r.a, r.b) for r in old_rows}
        for d in diff:
            if d.op == "delete":
                state.pop(d.k)
            else:
                state[d.k] = (d.after.a, d.after.b)
        assert state == {r.k: (r.a, r.b) for r in new_rows}


# --- OAI parse fuzz: arbitrary bytes never crash the harvest path -------------
def test_arbitrary_text_never_crashes_oai_parse(spark):
    """T8 failure isolation, fuzzed: ANY response body — random text,
    truncated XML, half-valid fragments, exotic unicode — must parse to
    the all-null "not an OAI document" row shape (which harvest_once
    routes to the failed-run path) or a well-formed page row; never an
    exception. One batched parse over 200 fuzz bodies + targeted
    truncations of the real fixture."""
    from qucosa_fcrepo_reportingdb_spark.functions.oai_xml import (
        parse_oai_pages,
    )
    from tests import fixtures_oai as fx

    rng = random.Random(4242)
    alphabet = (string.printable + "<>&;\"'é世界 ")
    bodies = ["".join(rng.choice(alphabet)
                      for _ in range(rng.randrange(0, 300)))
              for _ in range(200)]
    # truncations of a REAL page: the half-valid fragments most likely
    # to confuse a forgiving parser
    for cut in (10, 50, 120, len(fx.LIST_IDENTIFIERS) // 2):
        bodies.append(fx.LIST_IDENTIFIERS[:cut])
    bodies += ["<junk/>", "<?xml version='1.0'?><OAI-PMH>",
               "<OAI-PMH xmlns='http://www.openarchives.org/OAI/2.0/'>"]

    df = spark.createDataFrame([(b,) for b in bodies], "xml string")
    rows = parse_oai_pages(df, "xml").collect()   # must not raise
    assert len(rows) == len(bodies)
    for r in rows:
        # every row is either the unparseable null shape or a page with
        # typed fields — never a half-typed crash row
        assert r.headers is None or isinstance(r.headers, list)
        assert r.errors is None or hasattr(r.errors, "items")


def test_text_queries_survive_zero_token_docs(spark, tmp_path):
    """ANSI Spark raises DIVIDE_BY_ZERO even on double 0/0: the text
    quality/token-stat queries must NULL their ratios for a doc that
    tokenizes to zero tokens (punctuation-only, empty) instead of
    aborting the whole job — and DuckDB must agree on the NULLs."""
    import duckdb

    from qucosa_fcrepo_reportingdb_spark.functions.text import (
        TOKEN_STATS_SQL,
        text_quality_score,
        text_token_stats,
    )

    rows = [(1, "a normal document with several plain words", "en", "s0", 42),
            (2, "!!! ??? ...", "en", "s0", 11),
            (3, "", "en", "s0", 0)]
    sf = tmp_path / "sf"
    sf.mkdir()
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .coalesce(1).write.parquet(str(sf / "documents.parquet")))

    stats = {r.doc_id: r for r in text_token_stats(spark, str(sf)).collect()}
    assert stats[2].distinct_ratio is None and stats[3].distinct_ratio is None
    assert stats[1].distinct_ratio is not None
    qual = {r.doc_id: r for r in
            text_quality_score(spark, str(sf)).collect()}
    assert qual[2].mean_word_len is None and qual[3].stopword_ratio is None

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf}/documents.parquet/*.parquet'")
    duck = {r[0]: r for r in con.execute(TOKEN_STATS_SQL).fetchall()}
    assert duck[2][4] is None and duck[3][4] is None


def test_cap_recall_audit_detects_hot_shingle_loss(spark, tmp_path):
    """The SHINGLE_DF_MAX cap makes pairs similar ONLY through hot
    shingles invisible to the pair table; CORRECTNESS can't see that
    (the oracle applies the same cap), so the audit must. Corpus built
    so the cap provably bites: two 3-token docs that are exact dupes of
    each other AND whose single shingle is shared by >SHINGLE_DF_MAX
    longer filler docs -> uncapped jaccard 1.0, capped candidate set
    empty. Filler docs are long enough that every pair involving one
    stays under the threshold uncapped (1 shared shingle / >=6)."""
    import duckdb

    from qucosa_fcrepo_reportingdb_spark.operators import dedup as D
    from tests.oracle import compare

    rows = [(0, "xx yy zz"), (1, "xx yy zz")]
    for i in range(D.SHINGLE_DF_MAX + 1):
        filler = " ".join(f"f{i}w{j}" for j in range(8))
        rows.append((i + 2, f"xx yy zz {filler}"))
    (spark.createDataFrame(rows, "doc_id long, text string")
     .coalesce(1).write.parquet(str(tmp_path / "documents.parquet")))
    sf = str(tmp_path)

    row = D.jaccard_cap_recall_audit(spark, sf).collect()[0]
    assert (row.n_true, row.n_capped, row.n_both, row.n_missed) == \
        (1, 0, 0, 1)
    assert row.recall == 0.0
    # capped pipeline really surfaces nothing (the loss is real, not an
    # artifact of the audit's own join)
    assert D.dedup_ngram_jaccard(spark, sf).count() == 0

    # and the DuckDB oracle agrees on the audit row itself
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet/*.parquet'")
    r = compare(D.jaccard_cap_recall_audit(spark, sf), con,
                D.ORACLES["jaccard_cap_recall_audit"])
    assert r["ok"], r.get("detail", "")[:300]


def test_banding_sweep_monotone_under_refinement(spark):
    """The sweep's configs form a refinement chain over the SAME 16
    minhashes: agreement on a 8-row band implies agreement on both of
    its 4-row halves, which implies agreement on their 2-row halves — so
    candidates(2x8) ⊆ candidates(4x4) ⊆ candidates(8x2), and candidate,
    verified, and recall columns must be non-decreasing in n_bands. A
    violation means the band slicing drifted from contiguous
    rows-per-band groups."""
    from qucosa_fcrepo_reportingdb_spark.operators import dedup as D
    from tests.conftest import SF_DIR

    rows = {r.n_bands: r
            for r in D.lsh_banding_sweep(spark, SF_DIR).collect()}
    assert set(rows) == {2, 4, 8}
    assert rows[2].n_candidates <= rows[4].n_candidates <= \
        rows[8].n_candidates
    assert rows[2].n_verified <= rows[4].n_verified <= rows[8].n_verified
    assert len({rows[b].n_true for b in rows}) == 1   # shared ground truth
    for b in rows:
        assert rows[b].n_verified <= rows[b].n_candidates
        assert rows[b].n_verified <= rows[b].n_true


def test_audit_operators_on_pairless_corpus(spark, tmp_path):
    """Audits must degrade to zeros/NULLs, not errors, when a corpus has
    NO near-duplicate pairs: counts 0, recall NULL (never a 0/0 abort),
    one row always emitted — and the DuckDB oracles agree row-for-row."""
    import duckdb

    from qucosa_fcrepo_reportingdb_spark.operators import corpus as C
    from qucosa_fcrepo_reportingdb_spark.operators import dedup as D
    from tests.oracle import compare

    rows = [(i, " ".join(f"u{i}w{j}" for j in range(12)))
            for i in range(8)]                    # all-distinct vocab
    (spark.createDataFrame(rows, "doc_id long, text string")
     .coalesce(1).write.parquet(str(tmp_path / "documents.parquet")))
    sf = str(tmp_path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet/*.parquet'")

    row = D.jaccard_cap_recall_audit(spark, sf).collect()[0]
    assert (row.n_true, row.n_capped, row.recall) == (0, 0, None)
    for name, fn, sql in [
        ("cap_audit", D.jaccard_cap_recall_audit,
         D.ORACLES["jaccard_cap_recall_audit"]),
        ("cap_audit_sampled", C.jaccard_cap_recall_audit_sampled,
         C.ORACLES["jaccard_cap_recall_audit_sampled"]),
        ("banding_sweep", D.lsh_banding_sweep,
         D.ORACLES["lsh_banding_sweep"]),
    ]:
        r = compare(fn(spark, sf), con, sql)
        assert r["ok"], (name, r.get("detail", "")[:300])
    sweep = {r.n_bands: r for r in D.lsh_banding_sweep(spark, sf).collect()}
    assert all(sweep[b].n_verified == 0 and sweep[b].recall is None
               for b in sweep)
