"""Field arithmetic tests: M31/QM31 kernels vs uint64/python-int oracles,
and numpy-vs-jax backend equivalence."""

import numpy as np
import pytest

from luminair_tpu.fields import m31, qm31

P = int(m31.P)
RNG = np.random.default_rng(0)


def rand_m31(shape):
    return RNG.integers(0, P, size=shape, dtype=np.uint64).astype(np.uint32)


def rand_qm31(shape=()):
    return rand_m31(tuple(shape) + (4,))


class TestM31:
    def test_add_sub_neg(self):
        a, b = rand_m31(1000), rand_m31(1000)
        s = m31.add(a, b)
        assert np.all(s == (a.astype(np.uint64) + b) % P)
        d = m31.sub(a, b)
        assert np.all(d == (a.astype(np.int64) - b) % P)
        n = m31.neg(a)
        assert np.all(n == (-a.astype(np.int64)) % P)

    def test_mul_matches_uint64_oracle(self):
        a, b = rand_m31(5000), rand_m31(5000)
        assert np.all(m31.mul(a, b) == m31.mul_ref(a, b))

    def test_mul_edge_cases(self):
        edge = np.array([0, 1, 2, P - 1, P - 2, 1 << 30, (1 << 30) + 1], dtype=np.uint32)
        a, b = np.meshgrid(edge, edge)
        a, b = a.ravel(), b.ravel()
        assert np.all(m31.mul(a, b) == m31.mul_ref(a, b))

    def test_inv(self):
        a = rand_m31(500)
        a[0] = 1
        a[1] = P - 1
        assert np.all(m31.mul(a, m31.inv(a)) == 1)

    def test_pow_const(self):
        a = rand_m31(100)
        assert np.all(m31.pow_const(a, 5) == m31.mul(m31.mul(m31.square(a), m31.square(a)), a))

    def test_signed_roundtrip(self):
        v = RNG.integers(-(1 << 40), 1 << 40, size=1000)
        emb = m31.from_i64(v)
        assert np.all(emb < np.uint32(P))
        small = RNG.integers(-(1 << 29), 1 << 29, size=1000)
        assert np.all(m31.to_signed(m31.from_i64(small)) == small)

    def test_jax_backend_matches_numpy(self):
        import jax
        import jax.numpy as jnp

        a, b = rand_m31(2048), rand_m31(2048)
        f = jax.jit(lambda x, y: (m31.mul(x, y), m31.add(x, y), m31.inv(x + jnp.uint32(1))))
        ja, jb = jnp.asarray(a), jnp.asarray(b)
        jm, js, ji = f(ja, jb)
        assert np.all(np.asarray(jm) == m31.mul(a, b))
        assert np.all(np.asarray(js) == m31.add(a, b))
        assert np.all(np.asarray(ji) == m31.inv(a + np.uint32(1)))


def qm31_mul_oracle(x, y):
    """Python-int oracle for QM31 multiplication."""

    def cm_mul(a, b):
        return ((a[0] * b[0] - a[1] * b[1]) % P, (a[0] * b[1] + a[1] * b[0]) % P)

    def cm_add(a, b):
        return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)

    A, B = (int(x[0]), int(x[1])), (int(x[2]), int(x[3]))
    C, D = (int(y[0]), int(y[1])), (int(y[2]), int(y[3]))
    R = (2, 1)
    first = cm_add(cm_mul(A, C), cm_mul(R, cm_mul(B, D)))
    second = cm_add(cm_mul(A, D), cm_mul(B, C))
    return np.array([first[0], first[1], second[0], second[1]], dtype=np.uint32)


class TestQM31:
    def test_mul_oracle(self):
        for _ in range(50):
            x, y = rand_qm31(), rand_qm31()
            assert np.all(qm31.mul(x, y) == qm31_mul_oracle(x, y))

    def test_mul_batch(self):
        x, y = rand_qm31((64,)), rand_qm31((64,))
        out = qm31.mul(x, y)
        for i in range(64):
            assert np.all(out[i] == qm31_mul_oracle(x[i], y[i]))

    def test_inv(self):
        x = rand_qm31((100,))
        prod = qm31.mul(x, qm31.inv(x))
        assert np.all(prod == qm31.one((100,)))

    def test_embedding_mul(self):
        a, b = rand_m31(100), rand_m31(100)
        ea, eb = qm31.from_m31(a), qm31.from_m31(b)
        assert np.all(qm31.mul(ea, eb) == qm31.from_m31(m31.mul(a, b)))

    def test_conj_cm31_is_automorphism(self):
        x, y = rand_qm31((50,)), rand_qm31((50,))
        lhs = qm31.conj_cm31(qm31.mul(x, y))
        rhs = qm31.mul(qm31.conj_cm31(x), qm31.conj_cm31(y))
        assert np.all(lhs == rhs)
        # fixes CM31 (first two coords)
        z = rand_qm31((10,))
        z[..., 2:] = 0
        assert np.all(qm31.conj_cm31(z) == z)

    def test_mul_m31(self):
        x, s = rand_qm31((30,)), rand_m31(30)
        assert np.all(qm31.mul_m31(x, s) == qm31.mul(x, qm31.from_m31(s)))

    def test_pow_const(self):
        x = rand_qm31()
        x5 = qm31.pow_const(x, 5)
        man = qm31.mul(qm31.mul(qm31.mul(qm31.mul(x, x), x), x), x)
        assert np.all(x5 == man)
