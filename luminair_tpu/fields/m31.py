"""Mersenne-31 (M31) base-field arithmetic as vectorized uint32 kernels.

TPU-first design: every primitive here is written against the *uint32-only*
instruction set available on the TPU VPU (no 32x32->64 widening multiply, no
64-bit integers).  Products are formed with a 16-bit-limb ``mulhi`` emulation
and reduced with the Mersenne fold ``2^31 == 1 (mod p)``.  The same code path
runs under ``numpy`` (host/tests) and ``jax.numpy`` (jit/Pallas on TPU) --
both have wrapping uint32 semantics -- so the host oracle and the device
kernels are literally the same source.

Reference parity: stwo's ``M31``/``PackedM31`` (SIMD 16-lane) as used
throughout /root/reference (e.g. crates/air/src/components/add/table.rs).
The reference reaches this via Rust `std::simd`; here the lanes are the
TPU's 8x128 VPU (or numpy SIMD on host).

Canonical representation: values in [0, P).  All inputs are assumed
canonical; all outputs are canonical.
"""

from __future__ import annotations

import numpy as np

P = np.uint32((1 << 31) - 1)  # 2147483647
MODULUS_BITS = 31

_U32_MASK16 = 0xFFFF


class _NullCtx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


_NULL_CTX = _NullCtx()


def _quiet(xp):
    """Silence numpy's benign unsigned-wraparound warnings on 0-d inputs
    (wraparound is intended: the discarded `where` branch may wrap)."""
    return np.errstate(over="ignore") if xp is np else _NULL_CTX


def _xp(*arrays):
    """Pick the array namespace (numpy or jax.numpy) from the arguments.

    jax.numpy wins if ANY argument is a device array/tracer: mixed
    numpy+device expressions must stay on device (a silent np coercion
    would force a host download -- ruinous over the tunneled TPU link)."""
    for a in arrays:
        if not (isinstance(a, (np.ndarray, int, float)) or np.isscalar(a)):
            import jax.numpy as jnp

            return jnp
    return np


def to_m31(x, xp=np):
    """Canonicalize arbitrary uint32 values (< 2*P) into [0, P)."""
    x = xp.asarray(x, dtype=xp.uint32)
    return xp.where(x >= P, x - P, x)


def add(a, b):
    xp = _xp(a, b)
    a, b = xp.asarray(a), xp.asarray(b)
    with _quiet(xp):
        s = a + b  # < 2^32, no wrap (both < 2^31)
        return xp.where(s >= P, s - P, s)


def neg(a):
    xp = _xp(a)
    a = xp.asarray(a)
    with _quiet(xp):
        # P - a, with -0 -> 0
        r = P - a
        return xp.where(r >= P, r - P, r)


def sub(a, b):
    xp = _xp(a, b)
    a, b = xp.asarray(a), xp.asarray(b)
    with _quiet(xp):
        d = a + (P - b)  # <= 2P - 1 < 2^32
        return xp.where(d >= P, d - P, d)


def _mul_wide(a, b):
    """Full 62-bit product of two 31-bit values using only uint32 ops.

    Returns (hi, lo) with prod = hi * 2^32 + lo.
    """
    a_l = a & _U32_MASK16
    a_h = a >> 16  # < 2^15
    b_l = b & _U32_MASK16
    b_h = b >> 16  # < 2^15
    ll = a_l * b_l  # < 2^32 (max (2^16-1)^2)
    lh = a_l * b_h  # < 2^31
    hl = a_h * b_l  # < 2^31
    hh = a_h * b_h  # < 2^30
    mid = (ll >> 16) + lh + hl  # < 2^32 (no wrap: < 2^16 + 2*(2^31 - 2^15))
    lo = (ll & _U32_MASK16) | ((mid & _U32_MASK16) << 16)
    hi = hh + (mid >> 16)
    return hi, lo


def mul(a, b):
    xp = _xp(a, b)
    a, b = xp.asarray(a), xp.asarray(b)
    with _quiet(xp):
        hi, lo = _mul_wide(a, b)
        # prod = hi*2^32 + lo; 2^32 == 2, 2^31 == 1 (mod p)
        t = (hi << 1) | (lo >> 31)  # hi < 2^30 so no overflow
        r = t + (lo & P)  # < 2^32
        r = (r & P) + (r >> 31)  # <= P
        return xp.where(r >= P, r - P, r)


def square(a):
    return mul(a, a)


def pow_const(a, e: int):
    """a ** e for a python-int exponent (static under jit)."""
    xp = _xp(a)
    result = xp.ones_like(a)
    base = a
    while e > 0:
        if e & 1:
            result = mul(result, base)
        base = mul(base, base)
        e >>= 1
    return result


def inv(a):
    """Inverse via Fermat: a^(p-2) with an addition chain.  Fully parallel
    (~37 muls); on TPU this beats a sequential Montgomery batch-inversion
    scan because every lane works independently.

    Tiny host inputs take the python-int pow() path: ~37 numpy ops on a
    handful of elements cost ~0.5 ms of pure dispatch overhead, while
    pow(x, p-2, p) is ~1 us per element (transcript-side scalar work)."""
    if isinstance(a, np.ndarray) and a.size <= 8:
        p = int(P)
        flat = [pow(int(x), p - 2, p) if int(x) else 0 for x in np.ravel(a)]
        return np.asarray(flat, dtype=np.uint32).reshape(np.shape(a))
    return _inv_chain(a)


def _inv_chain(a):
    """a^(2^31-3) with ~37 muls using the standard 2^k-1 ladder."""

    def pow2k(x, k):
        for _ in range(k):
            x = mul(x, x)
        return x

    t0 = mul(square(a), a)  # a^3 = a^(2^2-1)
    t1 = mul(pow2k(t0, 2), t0)  # a^(2^4-1)
    t2 = mul(pow2k(t1, 4), t1)  # a^(2^8-1)
    t3 = mul(pow2k(t2, 8), t2)  # a^(2^16-1)
    t4 = mul(pow2k(t3, 8), t2)  # a^(2^24-1)
    t5 = mul(pow2k(t4, 4), t1)  # a^(2^28-1)
    t6 = mul(pow2k(t5, 1), a)  # a^(2^29-1)
    # p - 2 = 2^31 - 3 = (2^29 - 1) * 4 + 1
    return mul(pow2k(t6, 2), a)


def from_i64(v, xp=np):
    """Embed signed 64-bit integers into M31: v mod p (numpy path)."""
    r = np.asarray(v, dtype=np.int64) % np.int64(P)
    return r.astype(np.uint32)


def to_signed(a):
    """Map canonical M31 back to a signed integer in (-p/2, p/2] (numpy)."""
    a = np.asarray(a, dtype=np.int64)
    return np.where(a > np.int64(P) // 2, a - np.int64(P), a)


# ---------------------------------------------------------------------------
# Reference (slow, uint64) implementations used only in tests.


def mul_ref(a, b):
    p = np.uint64(P)
    r = (a.astype(np.uint64) * b.astype(np.uint64)) % p
    return r.astype(np.uint32)


def inv_ref(a):
    flat = np.asarray(a, dtype=np.uint64).ravel()
    out = np.array([pow(int(x), int(P) - 2, int(P)) for x in flat], dtype=np.uint32)
    return out.reshape(np.shape(a))
