"""Test configuration.

Multi-chip sharding paths are tested without hardware: force the JAX CPU
backend with 8 virtual devices (the fake-backend strategy the reference
lacks — SURVEY.md §4).  Must run before any jax import.
"""

import os

# Must be set before the jax backend initializes.  The axon TPU hook in this
# image force-registers itself via jax.config "jax_platforms=axon,cpu", so we
# override the config (not just the env var) to keep tests off the real chip.
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def corpus_dir():
    return "/root/reference/test"


@pytest.fixture(scope="session")
def paradiselost(corpus_dir):
    with open(corpus_dir + "/paradiselost.txt", "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def simple_txt(corpus_dir):
    with open(corpus_dir + "/simple.txt", "rb") as f:
        return f.read()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
