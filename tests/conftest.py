import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SKETCHLIB_TESTDATA", "/root/testdata")
SEQ_TINY_ROWS = 2_000
SEQ_SMALL_ROWS = 20_000


@pytest.fixture(scope="session")
def spark():
    from sketchlib.spark import get_spark

    s = get_spark("sketchlib-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def seq_tiny_dir(tmp_path_factory):
    from sketchlib.data.gen import write_sequences

    d = str(tmp_path_factory.mktemp("seq") / "tiny")
    write_sequences(d, SEQ_TINY_ROWS)
    return d


@pytest.fixture(scope="session")
def seq_small_dir(tmp_path_factory):
    from sketchlib.data.gen import write_sequences

    d = str(tmp_path_factory.mktemp("seq") / "small")
    write_sequences(d, SEQ_SMALL_ROWS)
    return d


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
