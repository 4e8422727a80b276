"""Multi-chip sharded prover vs the host numpy pipeline.

conftest.py forces an 8-virtual-device CPU platform, so these tests
exercise real jax.sharding.Mesh partitioning, XLA-inserted reshards/
collectives, and bit-compare against the host path.  The decisive test is
`test_full_prove_sharded_bit_identical`: the COMPLETE 4-phase prove() runs
SPMD over the mesh and must produce byte-identical proofs.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from luminair_tpu import serde
from luminair_tpu.parallel import sharding
from luminair_tpu.pcs.config import FriConfig, PcsConfig
from luminair_tpu.prelude import (
    Graph,
    gen_circuit_settings,
    gen_trace,
    prove,
    verify,
)

CFG = PcsConfig(
    pow_bits=2,
    fri=FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=8),
)


def test_full_prove_sharded_bit_identical():
    """All 4 prover phases SPMD over an 8-chip mesh: LDE (column-parallel),
    Merkle + interaction + constraints + quotients + FRI (row-parallel).
    The proof must be bit-identical to the host proof and verify."""
    n_dev = min(8, len(jax.devices()))
    cx = Graph()
    rng = np.random.default_rng(5)
    a = cx.tensor((8, 8)).set(rng.normal(size=(8, 8)))
    b = cx.tensor((8, 8)).set(rng.normal(size=(8, 8)))
    (a * b + a).retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)

    proof_host = prove(pie, settings, CFG)
    host_bytes = serde.proof_to_flat_bytes(proof_host)

    mesh = sharding.make_chip_mesh(n_dev)
    with sharding.prove_mesh(mesh, offload_min_rows=1):
        proof_mesh = prove(pie, settings, CFG)
    assert serde.proof_to_flat_bytes(proof_mesh) == host_bytes
    assert verify(proof_mesh, settings)


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


def test_full_prove_sharded_n64_native():
    """Real-size sharded prove (VERDICT round-2 item 7): a 64x64 graph on
    the full 8-virtual-device mesh -- the cols->rows reshard moves 2^12-row
    tables, not toy 16-row ones.  Bit-identity against the host proof AND
    acceptance by the production (native C++) verifier."""
    n_dev = min(8, len(jax.devices()))
    cx = Graph()
    rng = np.random.default_rng(17)
    a = cx.tensor((64, 64)).set(rng.normal(size=(64, 64)))
    b = cx.tensor((64, 64)).set(rng.normal(size=(64, 64)))
    (a * b + a).retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)

    proof_host = prove(pie, settings, CFG)
    host_bytes = serde.proof_to_flat_bytes(proof_host)

    mesh = sharding.make_chip_mesh(n_dev)
    with sharding.prove_mesh(mesh, offload_min_rows=1):
        proof_mesh = prove(pie, settings, CFG)
    assert serde.proof_to_flat_bytes(proof_mesh) == host_bytes
    from luminair_tpu import native

    try:
        native.build()
    except Exception as e:  # pragma: no cover - no toolchain
        pytest.skip(f"native toolchain unavailable: {e}")
    assert native.verify(proof_mesh, settings)


def test_hosts_chips_mesh_prove_bit_identical():
    """2-D ('hosts', 'chips') mesh (SURVEY §7.8 multi-host scale-out): the
    full prove() SPMD over a 2x4 host-major grid must still be bit-identical
    to the host proof."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cx = Graph()
    rng = np.random.default_rng(29)
    a = cx.tensor((16, 16)).set(rng.normal(size=(16, 16)))
    b = cx.tensor((16, 16)).set(rng.normal(size=(16, 16)))
    (a * b + a).retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)

    proof_host = prove(pie, settings, CFG)
    host_bytes = serde.proof_to_flat_bytes(proof_host)

    mesh = sharding.make_host_chip_mesh(2, 4)
    assert mesh.axis_names == ("hosts", "chips")
    with sharding.prove_mesh(mesh, offload_min_rows=1):
        proof_mesh = prove(pie, settings, CFG)
    assert serde.proof_to_flat_bytes(proof_mesh) == host_bytes
    assert verify(proof_mesh, settings)


def test_lde_reshard_compiles_to_all_to_all():
    """The cols->rows reshard after the per-tree LDE must lower to an
    all-to-all (or collective-permute) -- NOT a full all-gather
    rematerialization of every column on every chip (the round-1 concern).
    Pins the collective by inspecting the compiled HLO."""
    from luminair_tpu.parallel import accel

    n_dev = min(8, len(jax.devices()))
    mesh = sharding.make_chip_mesh(n_dev)
    log_n = 12
    with sharding.prove_mesh(mesh, offload_min_rows=1):
        import jax.numpy as jnp

        fn = accel._jit_lde(log_n, 1, accel.mesh_key())
        cols = jnp.zeros((16, 1 << log_n), dtype=jnp.uint32)
        hlo = fn.lower(cols).compile().as_text()
    # XLA may lower the reshard as all-to-all or collective-permute across
    # versions; either is a point-to-point exchange, which is what we pin.
    # The bit-identity tests above are the correctness anchor; this only
    # guards the *cost model* (no full rematerialization).
    assert (
        "all-to-all" in hlo or "collective-permute" in hlo
    ), "cols->rows reshard did not lower to a point-to-point collective"
    # A rematerializing all-gather would produce the full (n_cols, big_n)
    # eval set on every chip.  Gate on that shape so an incidental small
    # all-gather in a future XLA version can't trip the test.
    remat_shape = f"u32[16,{1 << (log_n + 1)}]"
    for line in hlo.splitlines():
        if "all-gather" in line and remat_shape in line:
            raise AssertionError(f"LDE reshard rematerialized via all-gather: {line}")
