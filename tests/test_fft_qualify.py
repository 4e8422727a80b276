"""First-use FFT program self-qualification (accel._qualify + checkers):
a production FFT program whose output fails its round-trip identity must
be detected on its FIRST real input, fall back to the next mode, and
persist the verdict -- the containment for the axon backend's
shape-unpredictable FFT miscompiles (round-3 VERDICT weak #7 follow-up)."""

import warnings

import numpy as np
import pytest

from luminair_tpu import fft
from luminair_tpu.fields import m31
from luminair_tpu.parallel import accel


@pytest.fixture
def qualify_env(monkeypatch, tmp_path):
    """Force validation ON (it is CPU-skipped by default) with a fresh
    on-disk verdict store."""
    monkeypatch.setattr(accel, "_validate_fft_programs", lambda: True)
    monkeypatch.setenv("LUMINAIR_FFT_MODES_DIR", str(tmp_path))
    monkeypatch.setattr(accel, "_FFT_MODES", {})
    monkeypatch.setattr(accel, "_FFT_MODES_LOADED", False)
    accel.enable(True)
    yield tmp_path
    accel.enable(False)


def _rand(C, log):
    rng = np.random.default_rng(31)
    return rng.integers(0, int(m31.P), size=(C, 1 << log), dtype=np.uint32)


def test_honest_program_qualifies_and_persists(qualify_env):
    x = _rand(3, 8)
    coeffs, evals = accel.lde_columns(x, 1)
    np.testing.assert_array_equal(np.asarray(coeffs), fft.ifft(x))
    np.testing.assert_array_equal(
        np.asarray(evals), fft.extend_coeffs_and_fft(fft.ifft(x), 1)
    )
    # verdict recorded (transposed default) and reused without re-checking
    key = [k for k in accel._FFT_MODES if ":lde:3x2^8:B1:" in k]
    assert key, accel._FFT_MODES
    import json

    on_disk = json.load(open(accel._modes_path()))
    assert on_disk == accel._FFT_MODES


def test_corrupt_mode_falls_back_and_records(qualify_env, monkeypatch):
    """Simulated miscompile: the transposed-mode production program returns
    bent evals; qualification must catch it via the round-trip identity and
    fall back to the natural mode."""
    real_factory = accel._jit_lde

    def factory(log_n, log_blowup, mk=None, small_m=None):
        fn = real_factory(log_n, log_blowup, mk, small_m)
        if small_m == fft._SMALL_M:  # corrupt the default (transposed) mode
            def bad(cols, _fn=fn):
                coeffs, evals = _fn(cols)
                return coeffs, evals ^ 1  # wholesale corruption (observed mode)
            return bad
        return fn

    monkeypatch.setattr(accel, "_jit_lde", factory)
    x = _rand(2, 8)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        coeffs, evals = accel.lde_columns(x, 1)
    assert any(
        "disagrees with its natural-layout recompute" in str(w.message)
        for w in caught
    )
    # the fallback (natural) result is correct
    np.testing.assert_array_equal(np.asarray(coeffs), fft.ifft(x))
    key = [k for k in accel._FFT_MODES if ":lde:2x2^8:B1:" in k]
    assert key and accel._FFT_MODES[key[0]] == 0  # natural mode recorded


def test_all_modes_corrupt_falls_back_to_host(qualify_env, monkeypatch):
    real_factory = accel._jit_fft

    def factory(log_n, mk=None, small_m=None):
        fn = real_factory(log_n, mk, small_m)

        def bad(coeffs, _fn=fn):
            return _fn(coeffs) ^ 1  # wholesale corruption (observed mode)
        return bad

    monkeypatch.setattr(accel, "_jit_fft", factory)
    c = _rand(4, 8)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        vals = accel.fft_eval(c)
    assert any("on the host" in str(w.message) for w in caught)
    np.testing.assert_array_equal(np.asarray(vals), fft.fft(c))
    key = [k for k in accel._FFT_MODES if ":fft:4x2^8:" in k]
    assert key and accel._FFT_MODES[key[0]] == accel._HOST_MODE


def test_dense_check_catches_thin_slice_corruption(qualify_env, monkeypatch):
    """The round-4 flagship failure mode: corruption confined to a thin
    slice of positions, which v2's 4-position spot sampling passed while
    both verifiers rejected the proof.  v3 compares EVERY element against
    the natural-layout recompute, so a single corrupt position anywhere
    must be caught and healed."""
    real_factory = accel._jit_lde

    def factory(log_n, log_blowup, mk=None, small_m=None):
        fn = real_factory(log_n, log_blowup, mk, small_m)
        if small_m == fft._SMALL_M:
            def bad(cols, _fn=fn):
                import jax.numpy as jnp

                coeffs, evals = _fn(cols)
                # exactly ONE corrupt element, in one column
                evals = jnp.asarray(evals).at[1, 137].set(evals[1, 137] ^ 1)
                return coeffs, evals
            return bad
        return fn

    monkeypatch.setattr(accel, "_jit_lde", factory)
    x = _rand(2, 8)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        coeffs, evals = accel.lde_columns(x, 1)
    assert any(
        "disagrees with its natural-layout recompute" in str(w.message)
        for w in caught
    )
    np.testing.assert_array_equal(np.asarray(coeffs), fft.ifft(x))
    np.testing.assert_array_equal(
        np.asarray(evals), fft.extend_coeffs_and_fft(fft.ifft(x), 1)
    )
    key = [k for k in accel._FFT_MODES if ":lde:2x2^8:B1:" in k]
    assert key and accel._FFT_MODES[key[0]] == 0


def test_ifft_t_qualifies(qualify_env):
    rng = np.random.default_rng(7)
    q = rng.integers(0, int(m31.P), size=(1 << 8, 4), dtype=np.uint32)
    coeffs = accel.ifft_t(q)
    np.testing.assert_array_equal(
        np.asarray(coeffs), fft.ifft(np.ascontiguousarray(q.T))
    )


def test_embedding_free_eval_identity():
    """The LDE evals spot check evaluates the SMALL coeff vector at
    big-domain points: with zero-stride embedding the basis-factor lists
    coincide, so no embedded array is ever materialized (the embedded
    variant OOMed at flagship scale)."""
    from luminair_tpu import circle
    from luminair_tpu.fields import qm31

    rng = np.random.default_rng(4)
    for log, B in ((6, 1), (5, 2)):
        C, n = 3, 1 << log
        coeffs = rng.integers(0, int(m31.P), size=(C, n), dtype=np.uint32)
        vals = fft.extend_coeffs_and_fft(coeffs, B)
        xs, ys = circle.domain_points(log + B)
        for j in (0, 3, (n << B) - 1):
            pt = (
                np.asarray(qm31.from_ints(int(xs[j])), dtype=np.uint32),
                np.asarray(qm31.from_ints(int(ys[j])), dtype=np.uint32),
            )
            got = np.asarray(fft.eval_at_point(coeffs, pt))
            want = np.zeros((C, 4), dtype=np.uint32)
            want[:, 0] = vals[:, j]
            np.testing.assert_array_equal(got, want)
