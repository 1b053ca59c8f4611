import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nutch_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nutch-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    from nutch_spark.corpus import SyntheticWeb

    return SyntheticWeb(n_hosts=10, pages_per_host=4, mega_factor=10, seed=42)


@pytest.fixture(scope="session")
def corpus_tables(spark, corpus):
    tables = corpus.to_spark(spark)
    for df in tables.values():
        df.cache().count()
    return tables
