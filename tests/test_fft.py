"""Circle FFT correctness: roundtrip, basis/pointwise-eval consistency,
LDE agreement, vanishing polynomial, and the prev-row roll identity that
the LogUp mask depends on."""

import numpy as np

from luminair_tpu import circle, fft
from luminair_tpu.fields import m31, qm31

RNG = np.random.default_rng(42)
P = int(m31.P)


def rand_col(shape):
    return RNG.integers(0, P, size=shape, dtype=np.uint64).astype(np.uint32)


def lift(p):
    return circle.point_to_qm31(p)


class TestDomain:
    def test_domain_points_on_circle(self):
        for log in (3, 6, 10):
            xs, ys = circle.domain_points(log)
            lhs = m31.add(m31.mul(xs, xs), m31.mul(ys, ys))
            assert np.all(lhs == 1)
            # all distinct
            assert len({(int(a), int(b)) for a, b in zip(xs, ys)}) == 1 << log

    def test_domain_conjugate_pairing(self):
        xs, ys = circle.domain_points(5)
        n = 32
        assert np.all(xs[: n // 2] == xs[n // 2 :][::-1])
        assert np.all(ys[: n // 2] == m31.neg(ys[n // 2 :][::-1]))

    def test_row_order_matches_odd_multiples(self):
        log = 4
        q = circle.group_gen(log + 1)
        xs, ys = circle.domain_points(log)
        for i in range(1 << log):
            p = circle.point_mul(q, 2 * i + 1)
            assert int(xs[i]) == int(p[0]) and int(ys[i]) == int(p[1])


class TestFFT:
    def test_roundtrip(self):
        for log in (1, 2, 5, 10):
            v = rand_col((3, 1 << log))
            c = fft.ifft(v)
            back = fft.fft(c)
            assert np.all(back == v), f"log={log}"

    def test_eval_at_point_matches_fft(self):
        log = 4
        c = rand_col(1 << log)
        vals = fft.fft(c)
        xs, ys = circle.domain_points(log)
        for i in range(1 << log):
            pt = lift((xs[i], ys[i]))
            got = fft.eval_at_point(c, pt)
            assert np.all(got == qm31.from_m31(vals[i])), f"row {i}"

    def test_constant_poly(self):
        log = 5
        c = np.zeros(1 << log, dtype=np.uint32)
        c[0] = 7
        vals = fft.fft(c)
        assert np.all(vals == 7)

    def test_lde_consistency_with_pointwise_eval(self):
        log, blowup = 4, 2
        v = rand_col(1 << log)
        c = fft.ifft(v)
        big = fft.lde(v, blowup)
        xs, ys = circle.domain_points(log + blowup)
        for i in RNG.choice(1 << (log + blowup), size=8, replace=False):
            pt = lift((xs[i], ys[i]))
            got = fft.eval_at_point(c, pt)
            assert np.all(got == qm31.from_m31(big[i])), f"row {i}"

    def test_lde_batched(self):
        v = rand_col((5, 64))
        big = fft.lde(v, 1)
        for i in range(5):
            assert np.all(fft.lde(v[i], 1) == big[i])

    def test_vanishing_on_trace_domain(self):
        log = 6
        xs, _ = circle.domain_points(log)
        v = circle.coset_vanishing_eval(xs, log, log)
        assert np.all(v == 0)

    def test_vanishing_nonzero_on_eval_domain(self):
        log = 6
        xs, _ = circle.domain_points(log + 1)
        v = circle.coset_vanishing_eval(xs, log, log + 1)
        assert np.all(v != 0)

    def test_prev_row_is_roll_on_superdomain(self):
        """Evaluating f at P - G_n on D_{n+b} == rolling evals by 2^b."""
        log, blowup = 4, 1
        v = rand_col(1 << log)
        c = fft.ifft(v)
        big = fft.lde(v, blowup)
        step = circle.group_gen(log)  # G_n, the row step
        xs, ys = circle.domain_points(log + blowup)
        stride = 1 << blowup
        for i in (0, 1, 5, 17, 31):
            p = (xs[i], ys[i])
            prev = circle.point_add(p, circle.point_neg(step))
            got = fft.eval_at_point(c, lift(prev))
            expect = big[(i - stride) % (1 << (log + blowup))]
            assert np.all(got == qm31.from_m31(expect)), f"row {i}"

    def test_prev_row_on_trace_domain_is_roll_by_one(self):
        log = 4
        v = rand_col(1 << log)
        c = fft.ifft(v)
        step = circle.group_gen(log)
        xs, ys = circle.domain_points(log)
        p = (xs[3], ys[3])
        prev = circle.point_add(p, circle.point_neg(step))
        got = fft.eval_at_point(c, lift(prev))
        assert np.all(got == qm31.from_m31(v[2]))

    def test_qm31_coeff_eval(self):
        log = 3
        cols = rand_col((4, 1 << log))  # treat as 4 coords of a QM31 poly
        xs, ys = circle.domain_points(log + 1)
        pt = lift((xs[5], ys[5]))
        per_coord = [fft.eval_at_point(cols[k], pt) for k in range(4)]
        coeffs_q = np.stack([cols[k] for k in range(4)], axis=-1)
        got = fft.eval_at_point_qm31_coeffs(coeffs_q, pt)
        # QM31-linear combination: sum_k coord_k * u_basis... coordinates are
        # independent, so evaluating coordinate-wise then recombining as
        # [e0 + e1*i + (e2 + e3*i)u] must equal the qm31-coeff evaluation.
        basis = [qm31.from_ints(1), qm31.from_ints(0, 1), qm31.from_ints(0, 0, 1), qm31.from_ints(0, 0, 0, 1)]
        acc = qm31.zero()
        for k in range(4):
            acc = qm31.add(acc, qm31.mul(per_coord[k], basis[k]))
        assert np.all(got == acc)

    def test_jax_fft_matches_numpy(self):
        import jax
        import jax.numpy as jnp

        log = 8
        v = rand_col((4, 1 << log))
        tw = circle.fft_twiddles(log)
        tw_inv = circle.ifft_twiddles(log)
        jtw = [jnp.asarray(t) for t in tw]
        jtw_inv = [jnp.asarray(t) for t in tw_inv]

        @jax.jit
        def roundtrip(x):
            return fft.fft(fft.ifft(x, jtw_inv), jtw)

        out = np.asarray(roundtrip(jnp.asarray(v)))
        assert np.all(out == v)
        c_np = fft.ifft(v)
        c_jax = np.asarray(jax.jit(lambda x: fft.ifft(x, jtw_inv))(jnp.asarray(v)))
        assert np.all(c_np == c_jax)


class TestSmallMSelfCheck:
    """The axon-backend miscompile containment (fft.py history note):
    accel startup cross-checks the transposed small-m iFFT path against
    the host oracle and auto-falls back to the natural layout on mismatch."""

    def test_self_check_passes_on_honest_backend(self):
        from luminair_tpu.parallel import accel

        # Injected device fn = the host transform itself (honest).
        ok = accel.self_check_fft(
            device_ifft=lambda a: fft.ifft(a), force=True, log_n=12
        )
        assert ok
        assert fft._SMALL_M != 0

    def test_forced_miscompile_engages_fallback(self):
        import warnings

        from luminair_tpu.parallel import accel

        before = fft._SMALL_M
        assert before != 0

        def corrupted(a):
            out = np.array(fft.ifft(a), copy=True)
            out[0, 0] ^= 1  # simulate a backend miscompilation
            return out

        try:
            with warnings.catch_warnings(record=True) as caught:
                warnings.simplefilter("always")
                ok = accel.self_check_fft(device_ifft=corrupted, force=True, log_n=12)
            assert not ok
            assert fft._SMALL_M == 0, "fallback must disable the small-m path"
            assert any("natural FFT layout" in str(w.message) for w in caught)
            # Correctness on the fallback path: round trip still exact.
            v = rand_col((4, 1 << 12))
            assert np.all(fft.fft(fft.ifft(v)) == v)
        finally:
            fft._SMALL_M = before
            accel._FFT_CHECKED = False


class TestBadWindowSplit:
    """The [2^24, 2^25)-total miscompile workaround (fft._split_bad_total):
    device transforms in the window split into half-batches; C==1 pads a
    zero row.  Validated here on CPU with a shrunk window so the split
    logic itself is exercised at test sizes."""

    def test_split_matches_host_at_all_batch_shapes(self, monkeypatch):
        import jax
        import jax.numpy as jnp

        monkeypatch.setattr(fft, "_BAD_LO", 1 << 12)
        monkeypatch.setattr(fft, "_BAD_HI", 1 << 13)
        rng = np.random.default_rng(21)
        # in-window: even, odd (recursive), power-of-two, single-row (pad)
        for shape in ((4, 1 << 10), (3, 1 << 11), (12, 1 << 9), (1, 1 << 12), (2, 1 << 11)):
            assert (1 << 12) <= shape[0] * shape[1] < (1 << 13)
            x = rng.integers(0, int(m31.P), size=shape, dtype=np.uint32)
            host_c = fft.ifft(x)
            dev_c = np.asarray(jax.jit(fft.ifft)(jnp.asarray(x)))
            assert np.array_equal(host_c, dev_c), f"ifft window split wrong at {shape}"
            host_v = fft.fft(host_c)
            dev_v = np.asarray(jax.jit(fft.fft)(jnp.asarray(host_c)))
            assert np.array_equal(host_v, dev_v), f"fft window split wrong at {shape}"
            host_l = fft.extend_coeffs_and_fft(host_c, 1)
            dev_l = np.asarray(
                jax.jit(lambda c: fft.extend_coeffs_and_fft(c, 1))(jnp.asarray(host_c))
            )
            assert np.array_equal(host_l, dev_l), f"lde window split wrong at {shape}"


class TestFftDup2:
    """fft_dup2 = forward FFT of the duplicate-interleave embedding
    without materializing it (the (..., N, 2) stack was tile-padded 4.3x
    on TPU -- two 8 GB HLO temps at batch-1024 flagship scale).  Must be
    bit-identical to the materialized fft(interleave, m_start=4) in both
    layouts, under jit, and through the bad-window split."""

    def _interleave(self, c):
        return np.stack([c, c], axis=-1).reshape(c.shape[:-1] + (c.shape[-1] * 2,))

    def test_matches_materialized_both_layouts(self):
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(33)
        for C, log in ((3, 9), (1, 10), (5, 8), (2, 7)):
            c = rng.integers(0, int(m31.P), size=(C, 1 << log), dtype=np.uint32)
            want = fft.fft(self._interleave(c), m_start=4)
            # host (numpy) path
            assert np.array_equal(np.asarray(fft.fft_dup2(c)), want)
            # device transposed + natural layouts
            for sm in (256, 128, 0):
                got = np.asarray(
                    jax.jit(lambda x, _sm=sm: fft.fft_dup2(x, small_m=_sm))(
                        jnp.asarray(c)
                    )
                )
                assert np.array_equal(got, want), f"fft_dup2 {C}x2^{log} sm={sm}"

    def test_window_split(self, monkeypatch):
        import jax
        import jax.numpy as jnp

        monkeypatch.setattr(fft, "_BAD_LO", 1 << 12)
        monkeypatch.setattr(fft, "_BAD_HI", 1 << 13)
        rng = np.random.default_rng(34)
        for shape in ((4, 1 << 9), (1, 1 << 11), (3, 1 << 10)):
            assert (1 << 12) <= shape[0] * shape[1] * 2 < (1 << 13)
            c = rng.integers(0, int(m31.P), size=shape, dtype=np.uint32)
            want = fft.fft(self._interleave(c), m_start=4)
            got = np.asarray(jax.jit(fft.fft_dup2)(jnp.asarray(c)))
            assert np.array_equal(got, want), f"fft_dup2 split wrong at {shape}"
