"""QM31: degree-4 extension of M31, as (..., 4) uint32 arrays.

Tower: CM31 = M31[i]/(i^2+1);  QM31 = CM31[u]/(u^2 - (2+i)).
An element (a + b*i) + (c + d*i)*u is stored as the last-axis vector
[a, b, c, d].  This matches stwo's ``SECURE_EXTENSION_DEGREE = 4`` (used by
the reference at crates/air/src/components/mod.rs:164-170, where every
interaction column costs 4 base columns).

All kernels are uint32-only (see fields/m31.py) and run unmodified under
numpy and jax.numpy.
"""

from __future__ import annotations

import numpy as np

from . import m31

R_RE = np.uint32(2)  # u^2 = 2 + i
R_IM = np.uint32(1)

EXTENSION_DEGREE = 4


def _xp(*arrays):
    return m31._xp(*arrays)


def from_m31(a, xp=np):
    """Embed base-field array (...,) into QM31 (..., 4)."""
    a = xp.asarray(a, dtype=xp.uint32)
    z = xp.zeros_like(a)
    return xp.stack([a, z, z, z], axis=-1)


def from_ints(a: int, b: int = 0, c: int = 0, d: int = 0):
    return np.array([a % int(m31.P), b % int(m31.P), c % int(m31.P), d % int(m31.P)], dtype=np.uint32)


def zero(shape=(), xp=np):
    return xp.zeros(tuple(shape) + (4,), dtype=xp.uint32)


def one(shape=(), xp=np):
    o = xp.zeros(tuple(shape) + (4,), dtype=xp.uint32)
    if xp is np:
        o[..., 0] = 1
        return o
    return o.at[..., 0].set(1)


def add(x, y):
    return m31.add(x, y)


def sub(x, y):
    return m31.sub(x, y)


def neg(x):
    return m31.neg(x)


def _cm_mul(ar, ai, br, bi):
    """CM31 product: (ar + ai*i)(br + bi*i)."""
    rr = m31.sub(m31.mul(ar, br), m31.mul(ai, bi))
    ri = m31.add(m31.mul(ar, bi), m31.mul(ai, br))
    return rr, ri


_P = int(m31.P)


def _mul_scalar(x, y):
    """Python-int fast path for a single QM31 product: tiny numpy arrays pay
    ~20 us of per-op dispatch overhead PER field op, so transcript-side
    scalar arithmetic (composition check, FRI replay) is ~40x faster on
    ints.  Bit-identical: all inputs are canonical mod p."""
    a, b, c, d = (int(v) for v in x)
    e, f, g, h = (int(v) for v in y)
    ac_r, ac_i = (a * e - b * f) % _P, (a * f + b * e) % _P
    bd_r, bd_i = (c * g - d * h) % _P, (c * h + d * g) % _P
    ad_r, ad_i = (a * g - b * h) % _P, (a * h + b * g) % _P
    bc_r, bc_i = (c * e - d * f) % _P, (c * f + d * e) % _P
    return np.array(
        [
            (ac_r + 2 * bd_r - bd_i) % _P,
            (ac_i + bd_r + 2 * bd_i) % _P,
            (ad_r + bc_r) % _P,
            (ad_i + bc_i) % _P,
        ],
        dtype=np.uint32,
    )


def mul(x, y):
    """QM31 product of (..., 4) arrays."""
    if (
        isinstance(x, np.ndarray)
        and isinstance(y, np.ndarray)
        and x.shape == (4,)
        and y.shape == (4,)
    ):
        return _mul_scalar(x, y)
    xp = _xp(x, y)
    a, b, c, d = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    e, f, g, h = y[..., 0], y[..., 1], y[..., 2], y[..., 3]
    # (A + B u)(C + D u) = AC + R BD + (AD + BC) u  with A=(a,b), B=(c,d), ...
    ac_r, ac_i = _cm_mul(a, b, e, f)
    bd_r, bd_i = _cm_mul(c, d, g, h)
    ad_r, ad_i = _cm_mul(a, b, g, h)
    bc_r, bc_i = _cm_mul(c, d, e, f)
    # R * BD = (2 + i)(bd_r + bd_i i) = (2 bd_r - bd_i) + (bd_r + 2 bd_i) i
    rbd_r = m31.sub(m31.add(bd_r, bd_r), bd_i)
    rbd_i = m31.add(bd_r, m31.add(bd_i, bd_i))
    out0 = m31.add(ac_r, rbd_r)
    out1 = m31.add(ac_i, rbd_i)
    out2 = m31.add(ad_r, bc_r)
    out3 = m31.add(ad_i, bc_i)
    return xp.stack([out0, out1, out2, out3], axis=-1)


def mul_m31(x, s):
    """QM31 (..., 4) times base-field scalar/array s (broadcast over last axis)."""
    xp = _xp(x, s)
    s = xp.asarray(s, dtype=xp.uint32)
    if s.ndim == x.ndim - 1 or s.ndim == 0:
        s = s[..., None] if s.ndim else s
    return m31.mul(x, xp.broadcast_to(s, x.shape))


def _cm_inv(ar, ai):
    """CM31 inverse: (ar - ai i) / (ar^2 + ai^2)."""
    n = m31.add(m31.mul(ar, ar), m31.mul(ai, ai))
    ninv = m31.inv(n)
    return m31.mul(ar, ninv), m31.mul(m31.neg(ai), ninv)


def _inv_scalar(x):
    a, b, c, d = (int(v) for v in x)
    a2_r, a2_i = (a * a - b * b) % _P, (2 * a * b) % _P
    b2_r, b2_i = (c * c - d * d) % _P, (2 * c * d) % _P
    den_r = (a2_r - (2 * b2_r - b2_i)) % _P
    den_i = (a2_i - (b2_r + 2 * b2_i)) % _P
    n = (den_r * den_r + den_i * den_i) % _P
    ninv = pow(n, _P - 2, _P)
    di_r, di_i = (den_r * ninv) % _P, (-den_i * ninv) % _P
    return np.array(
        [
            (a * di_r - b * di_i) % _P,
            (a * di_i + b * di_r) % _P,
            (-c * di_r + d * di_i) % _P,
            (-c * di_i - d * di_r) % _P,
        ],
        dtype=np.uint32,
    )


def inv(x):
    """QM31 inverse via the tower: (A + Bu)^-1 = (A - Bu)/(A^2 - R B^2)."""
    if isinstance(x, np.ndarray) and x.shape == (4,):
        return _inv_scalar(x)
    xp = _xp(x)
    a, b, c, d = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    a2_r, a2_i = _cm_mul(a, b, a, b)
    b2_r, b2_i = _cm_mul(c, d, c, d)
    # R*B^2 = (2 b2_r - b2_i) + (b2_r + 2 b2_i) i
    rb2_r = m31.sub(m31.add(b2_r, b2_r), b2_i)
    rb2_i = m31.add(b2_r, m31.add(b2_i, b2_i))
    den_r = m31.sub(a2_r, rb2_r)
    den_i = m31.sub(a2_i, rb2_i)
    di_r, di_i = _cm_inv(den_r, den_i)
    # (A - B u) * (di)  -- component-wise CM31 multiply
    na_r, na_i = _cm_mul(a, b, di_r, di_i)
    nb_r, nb_i = _cm_mul(m31.neg(c), m31.neg(d), di_r, di_i)
    return xp.stack([na_r, na_i, nb_r, nb_i], axis=-1)


def pow_const(x, e: int):
    xp = _xp(x)
    result = one(x.shape[:-1], xp)
    base = x
    while e > 0:
        if e & 1:
            result = mul(result, base)
        base = mul(base, base)
        e >>= 1
    return result


def conj_cm31(x):
    """The Gal(QM31/CM31) involution phi^2: (A + B u) -> (A - B u).

    Fixes CM31 (hence M31); used for DEEP-quotient pair vanishing:
    for a column with M31 coefficients c, c(conj(z)) = conj(c(z)).
    """
    xp = _xp(x)
    return xp.stack([x[..., 0], x[..., 1], m31.neg(x[..., 2]), m31.neg(x[..., 3])], axis=-1)


def equal(x, y) -> bool:
    return bool(np.all(np.asarray(x) == np.asarray(y)))
