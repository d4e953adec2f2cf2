from __future__ import annotations

import copy
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ig_etl_sync_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="ig-etl-sync-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


#: Reference-shaped nested source document (FIXTURES.md §A). Includes the
#: load-bearing edge cases: a bucket with builds=[] and one with empty
#: `updated-at` (forces the hash fallback chain, recon.go:141-153);
#: org/project ids repeat across buckets (implicit-dedup path).
SOURCE_DOC: dict = {
    "buckets": [
        {
            "id": "bkt-1",
            "name": "ubuntu-base",
            "created-at": "2024-01-01T00:00:00Z",
            "updated-at": "2024-06-01T10:00:00Z",
            "resource_name": "packer/bkt-1",
            "location": {"organization_id": "org-1", "project_id": "proj-1"},
            "latest_version": {
                "id": "ver-1",
                "name": "v1.2.0",
                "builds": [
                    {
                        "id": "build-1",
                        "created_at": "2024-06-01T09:00:00Z",
                        "updated_at": "2024-06-01T09:30:00Z",
                    },
                    {
                        "id": "build-2",
                        "created_at": "2024-06-01T09:05:00Z",
                        "updated_at": "2024-06-01T09:35:00Z",
                    },
                ],
            },
        },
        {
            "id": "bkt-2",
            "name": "alpine-minimal",
            "created-at": "2024-02-01T00:00:00Z",
            "updated-at": "",  # empty → hash falls through the chain
            "resource_name": "packer/bkt-2",
            "location": {"organization_id": "org-1", "project_id": "proj-1"},
            "latest_version": {
                "id": "ver-2",
                "name": "v0.9.1",
                "builds": [],  # empty array: no build rows, no edge rows
            },
        },
        {
            "id": "bkt-3",
            "name": "windows-2022",
            "created-at": "2024-03-01T00:00:00Z",
            "updated-at": "2024-07-01T12:00:00Z",
            "resource_name": "packer/bkt-3",
            "location": {"organization_id": "org-2", "project_id": "proj-2"},
            "latest_version": {
                "id": "ver-3",
                "name": "v2.0.0",
                "builds": [
                    {
                        "id": "build-3",
                        "created_at": "2024-07-01T11:00:00Z",
                        "updated_at": "2024-07-01T11:30:00Z",
                    }
                ],
            },
        },
    ]
}


@pytest.fixture()
def source_doc() -> dict:
    return copy.deepcopy(SOURCE_DOC)
