"""Fixed-point numerics over M31 (numerair equivalent).

Semantics (this framework's spec, mirroring the constraint forms the
reference uses at crates/air/src/components/{add,mul,recip,sqrt,rem}/
component.rs via numerair's EvalFixedPoint -- numerair itself is not
vendored in the reference tree, so these exact identities are re-derived
and locked in by tests):

A value is an integer ``v`` (numpy int64) representing ``v / 2^SCALE`` with
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

Every op here is vectorized int64 numpy; the JAX/TPU execution path in
graph/ops.py uses the same identities with 32-bit limb arithmetic.
"""

from __future__ import annotations

import numpy as np

from .fields import m31

DEFAULT_FP_SCALE = 12
SCALE_FACTOR = np.int64(1 << DEFAULT_FP_SCALE)


_SAFE_MAX = float(1 << 62)


def from_float(x) -> np.ndarray:
    """Round-to-nearest fixed encoding of floats.

    Values beyond +-2^62 (e.g. exp2 of large arguments) saturate instead of
    hitting undefined float->int64 casts; like the reference, such values
    alias mod p consistently between op execution and LUT generation."""
    scaled = np.round(np.asarray(x, dtype=np.float64) * float(SCALE_FACTOR))
    scaled = np.nan_to_num(scaled, nan=0.0, posinf=_SAFE_MAX, neginf=-_SAFE_MAX)
    return np.clip(scaled, -_SAFE_MAX, _SAFE_MAX).astype(np.int64)


def to_float(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float64) / float(SCALE_FACTOR)


def to_m31(v) -> np.ndarray:
    return m31.from_i64(np.asarray(v, dtype=np.int64))


def add(a, b):
    return np.asarray(a, np.int64) + np.asarray(b, np.int64)


def _trunc_div(a, b):
    """Truncated (toward-zero) division, matching Rust i64 `/`."""
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    q = np.where(b != 0, a // np.where(b == 0, 1, b), 0)
    r = a - q * b
    # numpy floor-divides; adjust toward zero when signs differ and r != 0
    adjust = (r != 0) & ((a < 0) != (b < 0)) & (b != 0)
    q = q + adjust
    return q


def mul(a, b):
    """Returns (out, rem) with a*b == out*2^S + rem, trunc semantics."""
    prod = np.asarray(a, np.int64) * np.asarray(b, np.int64)
    out = _trunc_div(prod, SCALE_FACTOR)
    rem = prod - out * SCALE_FACTOR
    return out, rem


def recip(a):
    """Returns (out, rem) with a*out + rem == 2^(2S).  a == 0 -> (0, s^2)."""
    a = np.asarray(a, np.int64)
    s2 = SCALE_FACTOR * SCALE_FACTOR
    out = _trunc_div(np.broadcast_to(s2, a.shape).copy(), a)
    rem = s2 - a * out
    return out, rem


def sqrt(a):
    """Returns (out, rem) with out^2 + rem == a*2^S, out = isqrt(a*2^S)."""
    a = np.asarray(a, np.int64)
    prod = a * SCALE_FACTOR
    clipped = np.maximum(prod, 0)
    out = np.sqrt(clipped.astype(np.float64)).astype(np.int64)
    # float sqrt may be off by one either way; correct exactly.
    out = np.where((out + 1) * (out + 1) <= clipped, out + 1, out)
    out = np.where(out * out > clipped, out - 1, out)
    rem = prod - out * out
    return out, rem


def div_rem(a, b):
    """Fixed `Mod`: q = trunc(a/b), rem = a - q*b.  b == 0 -> (0, a)."""
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    q = _trunc_div(a, b)
    rem = a - q * b
    return q, rem


def less_than(a, b):
    """Borrow-style comparison on raw fixed values (reference:
    crates/graph/src/op/prim.rs:1205-1213).

    Returns (out_fixed, borrow, diff): if a < b: out = 1.0 (fixed), borrow=0,
    diff = b - a;  else out = 0, borrow = 1, diff = b - a + (2^31 - 1)."""
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    two_pow_k = np.int64((1 << 31) - 1)
    lt = a < b
    out = np.where(lt, SCALE_FACTOR, 0).astype(np.int64)
    borrow = np.where(lt, 0, 1).astype(np.int64)
    diff = b - a + np.where(lt, 0, two_pow_k)
    return out, borrow, diff
