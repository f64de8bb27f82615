from __future__ import annotations

import tempfile

import pytest

from mapreduce_assignments_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    warehouse = tempfile.mkdtemp(prefix="mras-warehouse-")
    s = get_spark(
        "mras-tests",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "4g",
            # managed tables (bucketed-join tests) go to a temp dir,
            # not the repo cwd
            "spark.sql.warehouse.dir": warehouse,
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    """Smallest driver-generated parquet scale factor."""
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def docs(spark):
    """Tiny reference-shaped corpus with hand-checkable counts."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (9, "the quick brown fox"),
        (100, "pack my box with five dozen liquor jugs"),
        (200, "the dog barks at the fox"),
        (300, ""),
        (400, "fox fox fox"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")
