"""Test env: force an 8-device virtual CPU platform before JAX initializes.

Distributed/sharding tests exercise DP + row-sharded embedding collectives on
the virtual mesh (SURVEY.md §4); numeric tests don't need the real TPU and
run faster on CPU without competing for the chip.
"""

import os

# Overwrite (not setdefault): the image presets JAX_PLATFORMS=axon and
# pre-imports jax via sitecustomize, so we must also update jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ml100k():
    from deeplearningrecommendationsystem_tpu.data import MovieLens100K

    path = os.environ.get("ML100K_PATH", "/root/reference/dataset_example/ml-100k")
    return MovieLens100K(path, seed=0)
