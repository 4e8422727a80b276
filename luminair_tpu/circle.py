"""Circle group over M31 and canonic circle domains.

The circle C(M31) = {(x, y): x^2 + y^2 = 1} is cyclic of order 2^31 with
generator G = (2, 1268011823).  The canonic domain of size N = 2^n is the
single coset  D_n = { (2i+1) * G_{n+1} : i in [0, N) }  where G_k denotes the
generator of the order-2^k subgroup (G_k = 2^(31-k) * G).

Row-ordering convention (this framework's spec -- diverges from stwo's
bit-reversed twin-coset enumeration, see docs/PROTOCOL.md):
  * trace row i  <->  point (2i+1) * G_{n+1}  (natural coset order);
  * "previous row" = subtract G_n, which on a 2^m-point canonic superdomain
    is a cyclic roll by 2^(m-n) positions -- this is what makes the LogUp
    prefix-sum mask cheap on TPU (a roll instead of a gather);
  * conjugation -P pairs row i with row N-1-i, giving the FFT its
    palindromic butterfly structure.

Reference behavior mirrored: stwo `CanonicCoset` / `CircleDomain` as used by
crates/prover/src/prover.rs:38-42 (twiddle precompute) and
crates/air/src/preprocessed.rs (LUT columns on canonic domains).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .fields import m31, qm31

M31_CIRCLE_GEN = (np.uint32(2), np.uint32(1268011823))
M31_CIRCLE_LOG_ORDER = 31


# ---------------------------------------------------------------------------
# Point arithmetic.  Points are (x, y) pairs; base-field points use uint32
# arrays (vectorized), extension points use (..., 4) QM31 arrays.


def point_add(p, q):
    x1, y1 = p
    x2, y2 = q
    return (
        m31.sub(m31.mul(x1, x2), m31.mul(y1, y2)),
        m31.add(m31.mul(x1, y2), m31.mul(y1, x2)),
    )


def point_double(p):
    x, y = p
    x2 = m31.mul(x, x)
    return (m31.sub(m31.add(x2, x2), np.uint32(1)), m31.add(m31.mul(x, y), m31.mul(x, y)))


def point_neg(p):
    return (p[0], m31.neg(p[1]))


def point_mul(p, k: int):
    """Scalar multiple k*p (double-and-add, host-side)."""
    result = None
    base = p
    while k > 0:
        if k & 1:
            result = base if result is None else point_add(result, base)
        base = point_double(base)
        k >>= 1
    if result is None:
        return (np.uint32(1), np.uint32(0))
    return result


def point_add_qm31(p, q):
    x1, y1 = p
    x2, y2 = q
    return (
        qm31.sub(qm31.mul(x1, x2), qm31.mul(y1, y2)),
        qm31.add(qm31.mul(x1, y2), qm31.mul(y1, x2)),
    )


def point_neg_qm31(p):
    return (p[0], qm31.neg(p[1]))


def point_sub_qm31(p, q):
    return point_add_qm31(p, point_neg_qm31(q))


def point_to_qm31(p):
    return (qm31.from_m31(np.asarray(p[0])), qm31.from_m31(np.asarray(p[1])))


def point_from_t_qm31(t):
    """Map a QM31 field element to a point on the circle over QM31 via the
    rational parametrization x = (1-t^2)/(1+t^2), y = 2t/(1+t^2).
    Used to derive the OODS point from a channel draw."""
    one = qm31.from_ints(1)
    t2 = qm31.mul(t, t)
    denom_inv = qm31.inv(qm31.add(one, t2))
    x = qm31.mul(qm31.sub(one, t2), denom_inv)
    y = qm31.mul(qm31.add(t, t), denom_inv)
    return (x, y)


@lru_cache(maxsize=64)
def group_gen(log_size: int):
    """Generator of the order-2^log_size subgroup."""
    g = M31_CIRCLE_GEN
    for _ in range(M31_CIRCLE_LOG_ORDER - log_size):
        g = point_double(g)
    return g


def pi_x(x):
    """The squaring map on x-coordinates: pi(x) = 2x^2 - 1."""
    x2 = m31.mul(x, x)
    return m31.sub(m31.add(x2, x2), np.uint32(1))


def pi_x_qm31(x):
    x2 = qm31.mul(x, x)
    two_x2 = qm31.add(x2, x2)
    one = qm31.from_ints(1)
    return qm31.sub(two_x2, one)


@lru_cache(maxsize=32)
def domain_points(log_size: int):
    """Coordinates of the canonic domain D_log_size in row order.

    Returns (x, y) uint32 arrays of length 2^log_size with
    (x[i], y[i]) = (2i+1) * G_{log_size+1}.

    Built with O(log N) vectorized "offset doubling" steps: given the first
    k points, the next k are those plus the constant point 2k * G_{n+1}.
    """
    n = 1 << log_size
    q = group_gen(log_size + 1)
    xs = np.array([q[0]], dtype=np.uint32)
    ys = np.array([q[1]], dtype=np.uint32)
    step = point_double(q)  # 2 * q, order 2^log_size
    k = 1
    offset = step
    while k < n:
        ox = np.uint32(offset[0])
        oy = np.uint32(offset[1])
        nx, ny = point_add((xs, ys), (ox, oy))
        xs = np.concatenate([xs, nx])
        ys = np.concatenate([ys, ny])
        offset = point_double(offset)
        k *= 2
    return xs, ys


@lru_cache(maxsize=32)
def fft_twiddles(log_size: int):
    """Forward-FFT twiddle arrays, one per butterfly stage (top first).

    twiddles[0] = y-coords of the first N/2 domain points (circle stage);
    twiddles[k] = x-coords chain after k-1 squarings, first N/2^(k+1)
    entries (line stages).  len == log_size.
    """
    n = 1 << log_size
    xs, ys = domain_points(log_size)
    tw = [ys[: n // 2].copy()]
    cur = xs[: n // 2].copy()  # line-domain x-coords, level 0
    while len(cur) >= 2:
        tw.append(cur[: len(cur) // 2].copy())
        cur = pi_x(cur[: len(cur) // 2])
    return tw


@lru_cache(maxsize=32)
def ifft_twiddles(log_size: int):
    """Inverse twiddles 1/(2*t) for each stage (batch-inverted once)."""
    tw = fft_twiddles(log_size)
    inv2 = m31.inv_ref(np.array([2], dtype=np.uint32))[0]
    return [m31.mul(m31.inv(t), np.broadcast_to(inv2, t.shape).copy()) for t in tw]


def coset_vanishing_eval(x, trace_log_size: int, domain_log_size: int):
    """Evaluate V_{trace_log_size} (vanishing poly of D_trace) on x-coords of
    a (larger) domain: V_n(P) = pi^(n-1)(x(P))."""
    v = x
    for _ in range(trace_log_size - 1):
        v = pi_x(v)
    return v


def coset_vanishing_eval_qm31(x, trace_log_size: int):
    v = x
    for _ in range(trace_log_size - 1):
        v = pi_x_qm31(v)
    return v
