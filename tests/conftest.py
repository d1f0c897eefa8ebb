"""Test configuration.

Multi-chip sharding paths are tested without hardware: force the JAX CPU
backend with 8 virtual devices (the fake-backend strategy the reference
lacks — SURVEY.md §4).  Must run before any jax import.
"""

import os

# Must run before the jax backend initializes.  The axon TPU hook in this
# image imports jax at interpreter start (so env vars set here are too late)
# and force-registers itself via jax.config "jax_platforms=axon,cpu" — both
# knobs must be set through jax.config, which works until first backend use.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

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
