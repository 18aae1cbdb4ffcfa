from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgforge import synth  # noqa: E402
from kgforge.session import get_spark  # noqa: E402

SF_TINY = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    sp = get_spark(master="local[4]", app_name="kgforge-tests", shuffle_partitions=8)
    yield sp
    sp.stop()


@pytest.fixture(scope="session")
def corpus():
    return synth.tiny_corpus(seed=42)


@pytest.fixture(scope="session")
def ref(corpus):
    from tests import oracle_ref

    return oracle_ref.run_reference(
        corpus.transcripts, corpus.dictionary, corpus.xref_edges
    )


@pytest.fixture(scope="session")
def spark_corpus(spark, corpus):
    tr, d, e = synth.to_spark(spark, corpus)
    return tr.cache(), d.cache(), e.cache()
