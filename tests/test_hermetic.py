"""Harness hermeticity: the suite must run on the virtual CPU platform.

The environment's sitecustomize force-selects the remote-TPU 'axon'
platform via a config update at interpreter start (overriding
JAX_PLATFORMS); conftest.py must win that fight or the whole suite (a)
hangs whenever the TPU tunnel goes dark and (b) silently runs numerics
checks at TPU bf16 precision.  These asserts fail loudly if the pin ever
regresses.
"""

import jax


def test_suite_runs_on_virtual_cpu_platform():
    assert jax.default_backend() == "cpu"
    assert all(d.platform == "cpu" for d in jax.devices())


def test_virtual_device_count_for_mesh_tests():
    # parallel/ tests shard over an 8-device mesh (SURVEY.md §4).
    assert len(jax.devices("cpu")) >= 8
