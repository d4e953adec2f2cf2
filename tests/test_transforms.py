"""Transform layer (SURVEY §2.2 T1-T9) against the reference-shaped doc."""

from __future__ import annotations

from ig_etl_sync_spark.operators import transforms as T
from ig_etl_sync_spark.sources.json_source import read_json_document


def rows(df):
    return sorted([tuple(r) for r in df.collect()])


def test_bucket_t1(spark, source_doc):
    df = T.BUCKET.apply(read_json_document(spark, source_doc))
    assert df.columns == ["external_id", "name", "created_at", "updated_at", "resource_name"]
    got = {r["external_id"]: r.asDict() for r in df.collect()}
    assert set(got) == {"bkt-1", "bkt-2", "bkt-3"}
    assert got["bkt-1"]["created_at"] == "2024-01-01T00:00:00Z"  # kebab source key
    assert got["bkt-2"]["updated_at"] == ""  # empty string preserved


def test_org_project_dedup_t2_t3(spark, source_doc):
    doc = read_json_document(spark, source_doc)
    orgs = T.ORGANIZATION.apply(doc)
    projects = T.PROJECT.apply(doc)
    assert rows(orgs) == [("org-1",), ("org-2",)]  # 3 buckets → 2 orgs
    assert rows(projects) == [("proj-1",), ("proj-2",)]


def test_version_literal_t4(spark, source_doc):
    df = T.VERSION.apply(read_json_document(spark, source_doc))
    for r in df.collect():
        assert r["latest"] == "true"  # literal column, stringly
    assert {r["external_id"] for r in df.collect()} == {"ver-1", "ver-2", "ver-3"}


def test_build_double_explode_t5(spark, source_doc):
    df = T.BUILD.apply(read_json_document(spark, source_doc))
    ids = {r["external_id"] for r in df.collect()}
    assert ids == {"build-1", "build-2", "build-3"}  # bkt-2's empty builds drop out


def test_edge_projections_t6_t7_t8(spark, source_doc):
    doc = read_json_document(spark, source_doc)
    assert rows(T.ORG_PROJECT_R.apply(doc)) == [("org-1", "proj-1"), ("org-2", "proj-2")]
    assert rows(T.PROJECT_BUCKET_R.apply(doc)) == [
        ("proj-1", "bkt-1"),
        ("proj-1", "bkt-2"),
        ("proj-2", "bkt-3"),
    ]
    assert rows(T.BUCKET_VERSION_R.apply(doc)) == [
        ("bkt-1", "ver-1"),
        ("bkt-2", "ver-2"),
        ("bkt-3", "ver-3"),
    ]


def test_correlated_flatten_t9(spark, source_doc):
    """J3: parent key (latest_version.id) carried across the child explode."""
    df = T.VERSION_BUILD_R.apply(read_json_document(spark, source_doc))
    assert rows(df) == [
        ("ver-1", "build-1"),
        ("ver-1", "build-2"),
        ("ver-3", "build-3"),
    ]


def test_empty_doc_yields_no_rows(spark):
    schema = (
        "buckets array<struct<id:string,name:string,`created-at`:string,"
        "`updated-at`:string,resource_name:string,"
        "location:struct<organization_id:string,project_id:string>,"
        "latest_version:struct<id:string,name:string,"
        "builds:array<struct<id:string,created_at:string,updated_at:string>>>>>"
    )
    doc = read_json_document(spark, {"buckets": []}, schema=schema)
    assert T.BUCKET.apply(doc).count() == 0
    assert T.VERSION_BUILD_R.apply(doc).count() == 0
