import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from supercrawler_spark.session import get_spark

    spark = get_spark("supercrawler-tests", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def corpus_sf0001(tmp_path_factory):
    from supercrawler_spark.sources.synth import ensure_corpus

    root = tmp_path_factory.mktemp("synth")
    return ensure_corpus(0.001, cache_root=str(root), num_buckets=8)
