"""Shared pytest fixtures.

Mirrors the reference's fixture-isolation discipline
(``/root/reference/tests/conftest.py:28-141``): one shared local
SparkSession, tmp-dir output roots per test, deterministic generator
configs so every assertion is reproducible.
"""

from __future__ import annotations

import pytest

from chronominer_spark.datagen import (
    ROLE_VOCAB,
    TOOL_VOCAB,
    TranscriptGenConfig,
    generate_reference_snapshot,
    generate_transcripts,
)
from chronominer_spark.session import build_session

TEST_CONF = {
    "spark.driver.memory": "8g",
    "spark.sql.shuffle.partitions": "8",
}


@pytest.fixture(scope="session")
def spark():
    s = build_session("chronominer-tests", master="local[4]", extra_conf=TEST_CONF)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def gen_cfg():
    # rates bumped from the FIXTURES defaults so every planted-violation
    # class has a solidly nonzero expected count at 20k rows
    return TranscriptGenConfig(
        n_turns=20_000, n_convs=500, seed=42, n_buckets=8,
        dup_key_rate=5e-4, null_role_rate=5e-4, bad_role_rate=5e-4,
        null_text_rate=5e-4, empty_text_rate=5e-4, bad_tool_rate=2e-3,
    )


@pytest.fixture(scope="session")
def transcripts(spark, gen_cfg):
    df = generate_transcripts(spark, gen_cfg).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def ref_snapshot(spark, gen_cfg):
    df = generate_reference_snapshot(spark, gen_cfg).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def vocabs():
    return list(ROLE_VOCAB), list(TOOL_VOCAB)
