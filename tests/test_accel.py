"""Device-path (accel) end-to-end coverage on JAX-CPU.

conftest.py pins JAX to an 8-virtual-device CPU platform, so the SAME jit
plumbing that drives the real TPU (parallel/accel.py, the device branches in
prover.py / pcs/scheme.py / pcs/fri.py / crypto/merkle.py) runs here under
CI.  The decisive assertion is bit-exactness: the proof produced with
``accel.enable(True)`` must serialize to the identical flat wire bytes as
the host-numpy proof for the same PIE -- the framework's equivalent of the
reference's one-stwo-for-both-sides guarantee (SURVEY §4: "bit-exactness
... we must earn with cross-implementation test vectors").
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from luminair_tpu import serde
from luminair_tpu.parallel import accel
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


@pytest.fixture
def accel_on(monkeypatch):
    """Enable the device engine with the offload threshold dropped to 1 so
    even tiny test traces take the device branches."""
    monkeypatch.setattr(accel, "OFFLOAD_MIN_ROWS", 1)
    accel.enable(True)
    yield
    accel.enable(False)


def _build(kind: str):
    """PIE + settings for a graph exercising a given component mix."""
    cx = Graph()
    rng = np.random.default_rng(5)
    if kind == "muladd":
        a = cx.tensor((8, 8)).set(rng.normal(size=(8, 8)))
        b = cx.tensor((8, 8)).set(rng.normal(size=(8, 8)))
        (a * b + a).retrieve()
    elif kind == "wide":
        # LUT op (sin -> preprocessed lookup + multiplicity column),
        # less_than (range-check lookup), reduction, sqrt, recip.
        a = cx.tensor((4, 8)).set(rng.uniform(0.1, 2.0, size=(4, 8)))
        b = cx.tensor((4, 8)).set(rng.uniform(0.1, 2.0, size=(4, 8)))
        (a.sin() + b.sqrt()).retrieve()
        (a < b).retrieve()
        (a * b).sum_reduce(1).retrieve()
        a.recip().retrieve()
    else:
        raise ValueError(kind)
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)
    return pie, settings


@pytest.mark.parametrize(
    "kind",
    [
        "muladd",
        # The wide graph jit-compiles ~30 kernels (every component's
        # witness/domain/fold shapes) -- tens of minutes on XLA-CPU.
        pytest.param("wide", marks=pytest.mark.slow),
    ],
)
def test_accel_prove_verify_and_bit_exact(accel_on, kind):
    pie, settings = _build(kind)
    proof_dev = prove(pie, settings, CFG)
    assert verify(proof_dev, settings)

    accel.enable(False)
    proof_host = prove(pie, settings, CFG)

    dev_bytes = serde.proof_to_flat_bytes(proof_dev)
    host_bytes = serde.proof_to_flat_bytes(proof_host)
    assert dev_bytes == host_bytes, (
        f"device proof diverges from host proof ({kind}): "
        f"{len(dev_bytes)} vs {len(host_bytes)} bytes"
    )


def test_accel_proof_passes_native_verifier(accel_on):
    """The device-path proof must satisfy the independent C++ verifier."""
    native = pytest.importorskip("luminair_tpu.native")
    try:
        native.build()
    except Exception as e:  # no toolchain in this environment
        pytest.skip(f"native verifier unavailable: {e}")
    pie, settings = _build("muladd")
    proof = prove(pie, settings, CFG)
    assert native.verify(proof, settings)
