"""Multi-chip sharded prover kernels vs the host numpy pipeline.

conftest.py forces an 8-virtual-device CPU platform, so these tests
exercise real jax.sharding.Mesh partitioning (rows x cols), XLA-inserted
reshards/collectives, and bit-compare against the host path.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from luminair_tpu.parallel import sharding


def _random_inputs(n_cols=8, log_n=5, seed=7):
    rng = np.random.default_rng(seed)
    cols = rng.integers(0, (1 << 31) - 1, size=(n_cols, 1 << log_n), dtype=np.uint32)
    mult = rng.integers(0, (1 << 31) - 1, size=(1 << log_n,), dtype=np.uint32)
    z = rng.integers(1, (1 << 31) - 1, size=(4,), dtype=np.uint32)
    alpha = rng.integers(1, (1 << 31) - 1, size=(4,), dtype=np.uint32)
    return cols, mult, z, alpha


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_prover_step_matches_host(shape):
    n_dev = shape[0] * shape[1]
    if n_dev > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = sharding.make_mesh(n_dev, shape)
    cols, mult, z, alpha = _random_inputs()
    evals, root, claimed = sharding.prover_step(mesh, cols, mult, z, alpha)
    evals_h, root_h, claimed_h = sharding.host_reference_step(cols, mult, z, alpha)
    np.testing.assert_array_equal(evals, evals_h)
    np.testing.assert_array_equal(root, root_h)
    np.testing.assert_array_equal(claimed, claimed_h)


def test_default_mesh_uses_all_devices():
    mesh = sharding.make_mesh()
    assert mesh.devices.size == len(jax.devices())
    cols, mult, z, alpha = _random_inputs(seed=11)  # same shapes -> jit cache hit
    evals, root, claimed = sharding.prover_step(mesh, cols, mult, z, alpha)
    evals_h, root_h, claimed_h = sharding.host_reference_step(cols, mult, z, alpha)
    np.testing.assert_array_equal(root, root_h)
    np.testing.assert_array_equal(claimed, claimed_h)
