import os
import sys

import pytest

try:
    # Deterministic hypothesis runs for the driver's verify gate: the
    # property tests explored fresh corners every run (good in dev — two
    # real canonicalization bugs were found that way); a verification
    # gate should be reproducible.
    from hypothesis import settings

    settings.register_profile("ci", derandomize=True)
    settings.load_profile("ci")
except ImportError:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lectura.config import CrawlConfig  # noqa: E402
from lectura.synth import SynthParams, make_corpus  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from lectura.session import get_spark

    s = get_spark(master="local[8]", app_name="lectura-tests",
                  shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def synth_params():
    return SynthParams(n_urls=500, n_hosts=20)


@pytest.fixture(scope="session")
def corpus(synth_params):
    return make_corpus(synth_params)


@pytest.fixture(scope="session")
def cfg():
    return CrawlConfig(max_round_urls=200)


@pytest.fixture()
def wh_root(tmp_path):
    return str(tmp_path / "wh")


def corpus_dfs(spark, corpus):
    import pandas as pd

    pages = spark.createDataFrame(
        pd.DataFrame(corpus["pages"]),
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    seeds = spark.createDataFrame(
        pd.DataFrame(corpus["seeds"]), schema="url string, score double"
    )
    robots = spark.createDataFrame(
        pd.DataFrame(corpus["robots"]), schema="host string, body string"
    )
    return pages, seeds, robots
