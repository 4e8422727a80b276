"""Fixed-point numerics over M31 (numerair equivalent).

Semantics (this framework's spec, mirroring the constraint forms the
reference uses at crates/air/src/components/{add,mul,recip,sqrt,rem}/
component.rs via numerair's EvalFixedPoint -- numerair itself is not
vendored in the reference tree, so these exact identities are re-derived
and locked in by tests):

A value is an integer ``v`` (int64) representing ``v / 2^SCALE`` with
SCALE = 12 (DEFAULT_FP_SCALE, crates/air/src/lib.rs:23).

  add:   out = a + b                                   a + b - out == 0
  mul:   prod = a*b; out = trunc(prod / s); rem = prod - out*s
                                                       a*b == out*s + rem
  recip: out = trunc(s^2 / a); rem = s^2 - a*out       a*out + rem == s^2
  sqrt:  out = isqrt(a * s);   rem = a*s - out^2       out^2 + rem == a*s
         (a >= 0)
  div_rem (Mod op): q = trunc(a/b); rem = a - q*b      q*b + rem == a

trunc = round toward zero (Rust i64 division semantics).  All identities
hold over the integers, hence over M31 after embedding ``to_m31(v) = v mod p``
-- which is what the in-circuit constraints check.

Every op here is backend-generic int64 arithmetic: with numpy inputs it is
the host oracle, with jax.numpy inputs (jax_enable_x64) the SAME functions
trace into the device trace-generation program (graph/device_trace.py).
The float conversions (from_float/to_float) are host-only: the device path
never runs float transcendentals -- function inputs are fixed-encoded on
the host and sin/exp2/log2 outputs come from LUT gathers.
"""

from __future__ import annotations

import numpy as np

from .fields import m31
from .fields.m31 import _xp

DEFAULT_FP_SCALE = 12
SCALE_FACTOR = np.int64(1 << DEFAULT_FP_SCALE)


_SAFE_MAX = float(1 << 62)


def from_float(x) -> np.ndarray:
    """Round-to-nearest fixed encoding of floats (host-only).

    Values beyond +-2^62 (e.g. exp2 of large arguments) saturate instead of
    hitting undefined float->int64 casts; like the reference, such values
    alias mod p consistently between op execution and LUT generation."""
    scaled = np.round(np.asarray(x, dtype=np.float64) * float(SCALE_FACTOR))
    scaled = np.nan_to_num(scaled, nan=0.0, posinf=_SAFE_MAX, neginf=-_SAFE_MAX)
    return np.clip(scaled, -_SAFE_MAX, _SAFE_MAX).astype(np.int64)


def to_float(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float64) / float(SCALE_FACTOR)


def to_m31(v):
    """v mod p as uint32.  Floor-mod of int64 is non-negative for positive
    modulus in both numpy and jax, so the embedding matches for negatives."""
    xp = _xp(v)
    r = xp.asarray(v, dtype=xp.int64) % np.int64(m31.P)
    return r.astype(xp.uint32)


def add(a, b):
    xp = _xp(a, b)
    return xp.asarray(a, dtype=xp.int64) + xp.asarray(b, dtype=xp.int64)


def _trunc_div(a, b):
    """Truncated (toward-zero) division, matching Rust i64 `/`."""
    xp = _xp(a, b)
    a = xp.asarray(a, dtype=xp.int64)
    b = xp.asarray(b, dtype=xp.int64)
    safe = xp.where(b == 0, xp.ones_like(b), b)
    q = xp.where(b != 0, a // safe, xp.zeros_like(a))
    r = a - q * b
    # floor-division rounds down; adjust toward zero when signs differ
    adjust = (r != 0) & ((a < 0) != (b < 0)) & (b != 0)
    return q + adjust


def mul(a, b):
    """Returns (out, rem) with a*b == out*2^S + rem, trunc semantics."""
    xp = _xp(a, b)
    prod = xp.asarray(a, dtype=xp.int64) * xp.asarray(b, dtype=xp.int64)
    out = _trunc_div(prod, SCALE_FACTOR)
    rem = prod - out * SCALE_FACTOR
    return out, rem


def square(a):
    """Returns (out, rem) with a*a == out*2^S + rem, trunc semantics.

    The worked example of docs/contribute/add-ops.md: a dedicated square
    primitive halves the LogUp traffic of `x * x` (one operand consumption
    instead of two) and proves the guide's extension path end-to-end."""
    xp = _xp(a)
    prod = xp.asarray(a, dtype=xp.int64) ** 2
    out = _trunc_div(prod, SCALE_FACTOR)
    rem = prod - out * SCALE_FACTOR
    return out, rem


def recip(a):
    """Returns (out, rem) with a*out + rem == 2^(2S).  a == 0 -> (0, s^2)."""
    xp = _xp(a)
    a = xp.asarray(a, dtype=xp.int64)
    s2 = SCALE_FACTOR * SCALE_FACTOR
    num = xp.full(a.shape, s2, dtype=xp.int64)
    out = _trunc_div(num, a)
    rem = s2 - a * out
    return out, rem


def sqrt(a):
    """Returns (out, rem) with out^2 + rem == a*2^S, out = isqrt(a*2^S)."""
    xp = _xp(a)
    a = xp.asarray(a, dtype=xp.int64)
    prod = a * SCALE_FACTOR
    clipped = xp.maximum(prod, xp.zeros_like(prod))
    # Float sqrt is only an ESTIMATE; the clamp below makes it exact.  The
    # host's correctly-rounded f64 sqrt is within +-1 of isqrt; the TPU's
    # emulated f64 sqrt was measured within +-1 of the host's, so the
    # device path clamps twice in each direction (worst case +-2).
    out = xp.sqrt(clipped.astype(xp.float64)).astype(xp.int64)
    steps = 1 if xp is np else 2
    for _ in range(steps):
        out = xp.where((out + 1) * (out + 1) <= clipped, out + 1, out)
    for _ in range(steps):
        out = xp.where(out * out > clipped, out - 1, out)
    rem = prod - out * out
    return out, rem


def div_rem(a, b):
    """Fixed `Mod`: q = trunc(a/b), rem = a - q*b.  b == 0 -> (0, a)."""
    xp = _xp(a, b)
    a = xp.asarray(a, dtype=xp.int64)
    b = xp.asarray(b, dtype=xp.int64)
    q = _trunc_div(a, b)
    rem = a - q * b
    return q, rem


def less_than(a, b):
    """Borrow-style comparison on raw fixed values (reference:
    crates/graph/src/op/prim.rs:1205-1213).

    Returns (out_fixed, borrow, diff): if a < b: out = 1.0 (fixed), borrow=0,
    diff = b - a;  else out = 0, borrow = 1, diff = b - a + (2^31 - 1)."""
    xp = _xp(a, b)
    a = xp.asarray(a, dtype=xp.int64)
    b = xp.asarray(b, dtype=xp.int64)
    two_pow_k = np.int64((1 << 31) - 1)
    lt = a < b
    out = xp.where(lt, SCALE_FACTOR, 0).astype(xp.int64)
    borrow = xp.where(lt, 0, 1).astype(xp.int64)
    diff = b - a + xp.where(lt, np.int64(0), two_pow_k)
    return out, borrow, diff
