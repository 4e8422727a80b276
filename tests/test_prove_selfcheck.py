"""End-of-prove OODS self-check + heal ladder (round-4 VERDICT #2).

prove() must never RETURN a proof that fails the composition identity at
the OODS point: a corrupted device program (forced here by monkeypatching
accel dispatchers) has to be detected by verifier.prover_self_check and
healed -- first by forcing the natural FFT layout, then by re-proving on
host numpy.  The reference's CPU prover never emits an unverifiable proof
(crates/prover/src/prover.rs:28-319); these tests pin the same guarantee
for the device path.
"""

import warnings

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from luminair_tpu import fft
from luminair_tpu.parallel import accel
from luminair_tpu.pcs.config import FriConfig, PcsConfig
from luminair_tpu.prelude import (
    Graph,
    gen_circuit_settings,
    gen_trace,
    prove,
    verify,
)
from luminair_tpu.verifier import prover_self_check

CFG = PcsConfig(
    pow_bits=2,
    fri=FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=8),
)


@pytest.fixture
def accel_on(monkeypatch, tmp_path):
    monkeypatch.setattr(accel, "OFFLOAD_MIN_ROWS", 1)
    monkeypatch.setenv("LUMINAIR_FFT_MODES_DIR", str(tmp_path))
    monkeypatch.setattr(accel, "_FFT_MODES", {})
    monkeypatch.setattr(accel, "_FFT_MODES_LOADED", False)
    accel.enable(True)
    yield
    accel.force_fft_mode(None)
    accel.enable(False)


def _build():
    cx = Graph()
    rng = np.random.default_rng(5)
    a = cx.tensor((8, 8)).set(rng.normal(size=(8, 8)))
    b = cx.tensor((8, 8)).set(rng.normal(size=(8, 8)))
    (a * b + a).retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)
    return pie, settings


def test_self_check_passes_on_honest_prove(accel_on):
    pie, settings = _build()
    proof = prove(pie, settings, CFG)
    assert prover_self_check(proof, settings)
    assert "self_check" in __import__(
        "luminair_tpu.tracing", fromlist=["tracing"]
    ).last_phases("prove")


def test_transposed_corruption_heals_via_natural_layout(accel_on, monkeypatch):
    """Corrupt every transposed-mode LDE program (the round-4 failure
    class) *past* qualification: the self-check must catch the bad proof,
    purge verdicts, and the natural-layout re-prove must heal it."""
    real_factory = accel._jit_lde

    def factory(log_n, log_blowup, mk=None, small_m=None):
        fn = real_factory(log_n, log_blowup, mk, small_m)
        if small_m and small_m == fft._SMALL_M:
            # Corrupt the INPUT column, then run the honest transform: the
            # committed tree is then internally consistent (coeffs match
            # evals, degree bounds hold, FRI completes) but commits to the
            # wrong trace -- the constraint identity at the OODS point
            # breaks.  This mirrors the real batch-256 corruption, which
            # produced a complete proof that both verifiers rejected with
            # "composition polynomial OODS mismatch".
            def bad(cols, _fn=fn):
                import jax.numpy as jnp

                return _fn(jnp.asarray(cols).at[0, 3].set(cols[0, 3] ^ 1))
            return bad
        return fn

    monkeypatch.setattr(accel, "_jit_lde", factory)
    # Simulate a falsely-clean persisted verdict (what v2's spot sampling
    # produced at batch 256): skip first-use qualification entirely.
    monkeypatch.setattr(
        accel, "fft_mode_for", lambda kind, sig: fft._SMALL_M
    )
    if fft._SMALL_M == 0:
        pytest.skip("transposed path disabled in this environment")

    pie, settings = _build()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        proof = prove(pie, settings, CFG)
    assert any("OODS self-check" in str(w.message) for w in caught)
    assert prover_self_check(proof, settings)
    assert verify(proof, settings)


def test_device_corruption_heals_via_host_reprove(accel_on, monkeypatch):
    """Corruption that survives the natural-layout retry (patched at the
    dispatcher level, so layout changes don't clear it) must fall all the
    way back to the host prover and still return a valid proof."""
    real = accel.domain_constraints

    def bad(*args, **kwargs):
        import jax.numpy as jnp

        q, acc_pow = real(*args, **kwargs)
        return jnp.asarray(q).at[0].set(q[0] ^ 1), acc_pow

    monkeypatch.setattr(accel, "domain_constraints", bad)
    pie, settings = _build()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        proof = prove(pie, settings, CFG)
    assert any("host numpy" in str(w.message) for w in caught)
    assert prover_self_check(proof, settings)
    assert verify(proof, settings)


def test_host_prove_self_check_is_cheap_and_green():
    pie, settings = _build()
    proof = prove(pie, settings, CFG)
    import time

    t0 = time.perf_counter()
    assert prover_self_check(proof, settings)
    assert time.perf_counter() - t0 < 0.5


def test_oom_heals_to_host_and_persists_the_shape(accel_on, monkeypatch):
    """RESOURCE_EXHAUSTED is not a correctness failure: the heal ladder
    must skip the natural-layout rung (it needs MORE memory), re-prove on
    host, and PERSIST the shape so the next prove() of the same shape
    never re-attempts the doomed device path (the failed attempt costs
    minutes at flagship scale)."""
    calls = {"n": 0}
    real = accel.domain_constraints

    def oom(*args, **kwargs):
        calls["n"] += 1
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted).")

    monkeypatch.setattr(accel, "domain_constraints", oom)
    pie, settings = _build()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        proof = prove(pie, settings, CFG)
    assert any("ran out of HBM" in str(w.message) for w in caught)
    assert calls["n"] >= 1
    assert prover_self_check(proof, settings)
    assert verify(proof, settings)

    # Second prove of the same shape: straight to host, device untouched.
    calls["n"] = 0
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        proof2 = prove(pie, settings, CFG)
    assert any("previously exhausted" in str(w.message) for w in caught)
    assert calls["n"] == 0
    assert verify(proof2, settings)

    # Opt-out: LUMINAIR_RETRY_OOM_SHAPES re-attempts the device path.
    monkeypatch.setenv("LUMINAIR_RETRY_OOM_SHAPES", "1")
    monkeypatch.setattr(accel, "domain_constraints", real)
    proof3 = prove(pie, settings, CFG)
    assert verify(proof3, settings)
