from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mediachain_indexer_spark.session import get_spark  # noqa: E402
from mediachain_indexer_spark.sources import fixtures  # noqa: E402

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mediachain-indexer-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def corpus500():
    return fixtures.generate_corpus(500)


@pytest.fixture(scope="session")
def corpus500_paths():
    return fixtures.write_corpus(os.path.join(CACHE, "fx500"), 500)


@pytest.fixture(scope="session")
def docs500(spark, corpus500_paths):
    from mediachain_indexer_spark.sources.io import read_documents

    return read_documents(spark, corpus500_paths["spans_documents"])


@pytest.fixture(scope="session")
def labels500(spark, corpus500_paths):
    return spark.read.parquet(corpus500_paths["labeled_pairs"])


@pytest.fixture(scope="session")
def golden500(spark, corpus500_paths):
    return spark.read.parquet(corpus500_paths["expected_clusters"])
