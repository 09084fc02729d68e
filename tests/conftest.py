import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from lucene_solr_spark.session import get_spark

    s = get_spark(app_name="lss-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus():
    """sf-s tier: 300 docs (kept small so the pure-Python oracle stays
    fast in unit tests; bench tiers are generated separately)."""
    from lucene_solr_spark.corpusgen import corpus_rows

    return corpus_rows(300)
