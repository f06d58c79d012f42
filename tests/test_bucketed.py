"""BucketedKeyTable: partition-pruned merges that rewrite only affected
buckets — the 100 TB merge path."""

import os
from datetime import datetime

from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark import schemas
from qucosa_fcrepo_reportingdb_spark.operators.bucketed import BucketedKeyTable

D1 = datetime(2015, 1, 1)
D2 = datetime(2016, 1, 1)


def headers(spark, rows):
    return spark.createDataFrame(rows, schemas.OAI_HEADER_SCHEMA)


def _bucket_mtimes(path):
    out = {}
    for entry in os.listdir(path):
        if entry.startswith("bucket="):
            d = os.path.join(path, entry)
            out[entry] = max(os.path.getmtime(os.path.join(d, f))
                             for f in os.listdir(d))
    return out


def test_merge_correctness(spark, tmp_path):
    tbl = BucketedKeyTable(spark, str(tmp_path / "t"), "record_identifier",
                           n_buckets=8)
    tbl.init(headers(spark, [(f"id{i}", D1, None, False) for i in range(50)]))
    tbl.merge(headers(spark, [("id3", D2, ["x"], True), ("new1", D2, [], False)]),
              order_by=["datestamp"])
    rows = {r.record_identifier: r for r in tbl.read().collect()}
    assert len(rows) == 51
    assert rows["id3"].datestamp == D2 and rows["id3"].status_is_deleted is True
    assert rows["id7"].datestamp == D1


def test_merge_rewrites_only_affected_buckets(spark, tmp_path):
    path = str(tmp_path / "t")
    tbl = BucketedKeyTable(spark, path, "record_identifier", n_buckets=16)
    tbl.init(headers(spark, [(f"id{i}", D1, None, False) for i in range(200)]))
    before = _bucket_mtimes(path)
    affected = tbl.merge(headers(spark, [("id3", D2, None, True)]),
                         order_by=["datestamp"])
    after = _bucket_mtimes(path)
    assert len(affected) == 1
    changed = {b for b in after if after[b] != before.get(b)}
    assert changed == {f"bucket={affected[0]}"}


def test_merge_scan_is_partition_pruned(spark, tmp_path):
    tbl = BucketedKeyTable(spark, str(tmp_path / "t"), "record_identifier",
                           n_buckets=16)
    tbl.init(headers(spark, [(f"id{i}", D1, None, False) for i in range(100)]))
    pruned = tbl.read_buckets([3, 5])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    n_parts = pruned.select("bucket").distinct().count()
    assert n_parts <= 2


def test_merge_is_idempotent(spark, tmp_path):
    tbl = BucketedKeyTable(spark, str(tmp_path / "t"), "record_identifier",
                           n_buckets=8)
    tbl.init(headers(spark, [(f"id{i}", D1, None, False) for i in range(20)]))
    change = headers(spark, [("id3", D2, ["x"], True)])
    tbl.merge(change, order_by=["datestamp"])
    snap1 = sorted(map(tuple, tbl.read().collect()))
    tbl.merge(change, order_by=["datestamp"])
    snap2 = sorted(map(tuple, tbl.read().collect()))
    assert snap1 == snap2


# ---------------------------------------------------------------------------
# delete_matching: bucket-pruned optimistic-concurrency delete
# ---------------------------------------------------------------------------
def test_delete_matching_removes_only_unchanged_tuples(spark, tmp_path):
    tbl = BucketedKeyTable(spark, str(tmp_path / "t"), "record_identifier",
                           n_buckets=8)
    tbl.init(headers(spark, [(f"id{i}", D1, None, False) for i in range(20)]))
    processed = headers(spark, [
        ("id3", D1, None, False),   # unchanged -> deleted
        ("id4", D2, None, False),   # datestamp moved -> survives (T6)
    ])
    tbl.delete_matching(
        processed, ["record_identifier", "datestamp", "status_is_deleted"])
    left = {r.record_identifier for r in tbl.read().collect()}
    assert "id3" not in left and "id4" in left and len(left) == 19


def test_delete_matching_rewrites_only_affected_buckets(spark, tmp_path):
    path = str(tmp_path / "t")
    tbl = BucketedKeyTable(spark, path, "record_identifier", n_buckets=16)
    tbl.init(headers(spark, [(f"id{i}", D1, None, False) for i in range(200)]))
    before = _bucket_mtimes(path)
    affected = tbl.delete_matching(
        headers(spark, [("id3", D1, None, False)]),
        ["record_identifier", "datestamp", "status_is_deleted"])
    after = _bucket_mtimes(path)
    changed = {b for b in after if after[b] != before.get(b)}
    assert changed <= {f"bucket={a}" for a in affected} and len(affected) == 1


def test_delete_matching_drops_emptied_bucket(spark, tmp_path):
    """Dynamic overwrite cannot replace a partition absent from the output;
    a fully-consumed bucket must be dropped explicitly."""
    tbl = BucketedKeyTable(spark, str(tmp_path / "t"), "record_identifier",
                           n_buckets=4)
    rows = [(f"id{i}", D1, None, False) for i in range(10)]
    tbl.init(headers(spark, rows))
    tbl.delete_matching(
        headers(spark, rows),
        ["record_identifier", "datestamp", "status_is_deleted"])
    assert tbl.read().count() == 0


# ---------------------------------------------------------------------------
# BucketedTableStore: the pipeline on the bucketed write path
# ---------------------------------------------------------------------------
from qucosa_fcrepo_reportingdb_spark.operators.bucketed import (  # noqa: E402
    pipeline_store,
)


def test_pipeline_e2e_on_bucketed_store(spark, tmp_path):
    """Same harvest -> enrich -> consume flow as test_pipeline_e2e, but the
    keyed tables live bucket-partitioned; per-batch rewrite cost is
    O(touched buckets), not O(table)."""
    from tests import fixtures_oai as fx
    from qucosa_fcrepo_reportingdb_spark.sources.mets import (
        REPORTING_DOCUMENTS_TABLE, enrich_once, fixture_mets_fetcher)
    from qucosa_fcrepo_reportingdb_spark.sources.oai import (
        OAI_HEADER_TABLE, OaiHarvestSource, fixture_fetcher)

    store = pipeline_store(spark, str(tmp_path / "btables"), n_buckets=8)
    src = OaiHarvestSource(spark, store, fixture_fetcher([fx.LIST_IDENTIFIERS]))
    src.harvest_once()
    assert store.read(OAI_HEADER_TABLE).count() == 2

    mets_docs = {"qucosa:1044": fx.mets_document("SLUB", "issue", "2008-08-04")}
    counters = enrich_once(spark, store, fixture_mets_fetcher(mets_docs))
    assert counters == {"processed": 2, "persisted": 1, "rejected": 1}
    docs = store.read(REPORTING_DOCUMENTS_TABLE).collect()
    assert len(docs) == 1 and docs[0].mandator == "SLUB"
    # queue fully consumed (valid AND rejected rows)
    assert store.read(OAI_HEADER_TABLE).count() == 0
    # idempotence: empty queue -> no-op batch
    again = enrich_once(spark, store, fixture_mets_fetcher(mets_docs))
    assert again["processed"] == 0


def test_bucketed_store_header_table_is_bucket_partitioned(spark, tmp_path):
    import os as _os
    from tests import fixtures_oai as fx
    from qucosa_fcrepo_reportingdb_spark.sources.oai import (
        OaiHarvestSource, fixture_fetcher)
    store = pipeline_store(spark, str(tmp_path / "btables"), n_buckets=8)
    src = OaiHarvestSource(spark, store, fixture_fetcher([fx.LIST_IDENTIFIERS]))
    src.harvest_once()
    tdir = _os.path.join(str(tmp_path / "btables"), "oai_header")
    assert any(e.startswith("bucket=") for e in _os.listdir(tdir))


def test_bucketed_store_schema_column_order(spark, tmp_path):
    from qucosa_fcrepo_reportingdb_spark import schemas
    from qucosa_fcrepo_reportingdb_spark.operators.bucketed import (
        BucketedTableStore)
    store = BucketedTableStore(spark, str(tmp_path / "bt"),
                               bucketed={"h": "record_identifier"},
                               n_buckets=4)
    store.merge_keyed("h", headers(spark, [("a", D1, None, False)]),
                      keys=["record_identifier"], order_by=["datestamp"],
                      schema=schemas.OAI_HEADER_SCHEMA)
    got = store.read("h", schemas.OAI_HEADER_SCHEMA)
    assert [f.name for f in got.schema.fields] == \
        [f.name for f in schemas.OAI_HEADER_SCHEMA.fields]


def test_bucketed_merge_schema_evolution_adds_column(spark, tmp_path):
    """The bucketed path honors the same tolerant-evolution contract as
    TableStore: a batch carrying a NEW column merges without dropping it,
    old rows read back as typed NULLs, and read(schema) restores declared
    order instead of failing on the missing stored column."""
    from pyspark.sql import types as T

    from qucosa_fcrepo_reportingdb_spark.operators.bucketed import (
        BucketedTableStore,
    )

    v2 = T.StructType([T.StructField("k", T.LongType()),
                       T.StructField("v", T.StringType()),
                       T.StructField("extra", T.LongType())])
    store = BucketedTableStore(spark, str(tmp_path / "bt"),
                               bucketed={"evo": "k"}, n_buckets=4)
    store.overwrite("evo", spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"))
    store.merge_keyed("evo", spark.createDataFrame(
        [(2, "B", 42), (3, "c", 7)], v2), keys=["k"], schema=v2)
    rows = {r.k: (r.v, r.extra) for r in store.read("evo", v2).collect()}
    assert rows == {1: ("a", None), 2: ("B", 42), 3: ("c", 7)}
    assert [f.name for f in store.read("evo", v2).schema.fields] == \
        ["k", "v", "extra"]


def test_emptied_table_keeps_evolved_schema(spark, tmp_path):
    """ADVICE r5: merge evolved the on-disk schema but _schema.json was
    written only at init — an EMPTIED table (zero-file fallback reads
    the stored schema) silently reverted to the pre-evolution shape.
    Pinned: evolve via merge, delete every row, read back — the evolved
    column must survive."""
    tab = BucketedKeyTable(spark, str(tmp_path / "evo2"), key="k",
                           n_buckets=4)
    tab.init(spark.createDataFrame([(1, "a")], "k long, v string"))
    tab.merge(spark.createDataFrame([(1, "A", 42), (2, "b", 7)],
                                    "k long, v string, extra long"))
    assert {f.name for f in tab.read().schema.fields} == {"k", "v", "extra"}
    # empty it: conditional delete on the full current tuples
    tab.delete_matching(tab.read(), compare_cols=["k"])
    empty = tab.read()
    assert empty.count() == 0
    assert {f.name for f in empty.schema.fields} == {"k", "v", "extra"}


def test_partial_merge_crash_converges_on_rerun(spark, tmp_path):
    """The recovery stance the module docstring claims, executed: a
    crashed dynamic-partition merge leaves SOME buckets new and some
    old; re-running the SAME batch converges to the fully-merged state
    (idempotent same-input merge). Simulated by restoring one affected
    bucket's pre-merge files after a successful merge."""
    import shutil

    path = str(tmp_path / "pm")
    tab = BucketedKeyTable(spark, path, key="record_identifier",
                          n_buckets=4)
    tab.init(headers(spark, [
        (f"qucosa:{i}", D1, [], False) for i in range(16)]))
    changes = headers(spark, [
        (f"qucosa:{i}", D2, ["s"], True) for i in range(8)])
    affected = tab.merge(changes, order_by=["datestamp"])
    assert len(affected) >= 2    # need >=2 buckets to crash "between"

    # snapshot the post-merge state, then roll ONE bucket back to its
    # pre-merge content by re-initializing and re-merging all but one
    victim = affected[0]
    post = {r.record_identifier: r for r in tab.read().collect()}
    pre_tab = BucketedKeyTable(spark, str(tmp_path / "pre"),
                               key="record_identifier", n_buckets=4)
    pre_tab.init(headers(spark, [
        (f"qucosa:{i}", D1, [], False) for i in range(16)]))
    shutil.rmtree(os.path.join(path, f"bucket={victim}"))
    shutil.copytree(os.path.join(str(tmp_path / "pre"),
                                 f"bucket={victim}"),
                    os.path.join(path, f"bucket={victim}"))
    # crash state: victim bucket old, the rest new
    mixed = {r.record_identifier: r.datestamp for r in tab.read().collect()}
    assert any(v == D1 for k, v in mixed.items()
               if k in {f"qucosa:{i}" for i in range(8)})

    tab.merge(changes, order_by=["datestamp"])   # re-run the same batch
    final = {r.record_identifier: r for r in tab.read().collect()}
    assert set(final) == set(post)
    for k in final:
        assert (final[k].datestamp, final[k].status_is_deleted) == \
            (post[k].datestamp, post[k].status_is_deleted), k
