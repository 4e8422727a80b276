"""Circle FFT / iFFT / LDE over M31 columns, batched.

The transform follows the palindromic butterfly structure induced by the
natural coset row order (see circle.py):

  * circle stage: pair rows (i, N-1-i) (which hold f(P) and f(-P)),
    twiddle y_i;
  * line stages:  within each block of size M, pair (j, M-1-j),
    twiddle x-chain values.

Coefficient basis (index bits MSB..LSB = [y, x, pi(x), ..., pi^(n-2)(x)]):
  b_j(x, y) = y^bit_{n-1} * x^bit_{n-2} * pi(x)^bit_{n-3} * ...

Low-degree extension embeds a dim-2^n coefficient vector into a dim-2^m one
by striding (zeros in the low bits), then runs the forward FFT on the larger
domain.  `eval_at_point` evaluates the same basis at an arbitrary QM31 point
(used for OODS sampling and as the FFT's cross-check oracle in tests).

This replaces stwo's SimdBackend circle FFT used via
crates/prover/src/prover.rs:36-46 (twiddle precompute + LDE inside
tree_builder.extend_evals).  All loops here are static-shape stage loops,
so the same code jits under JAX for TPU execution.

All functions operate on arrays of shape (..., N) -- leading axes are
batched columns.
"""

from __future__ import annotations

import numpy as np

from . import circle
from .fields import m31, qm31


def _xp(a):
    return m31._xp(a)


# Block sizes below this run their butterflies in a transposed layout: in
# the natural (..., n_blocks, m) view a small-m stage's slices have minor
# dim m/2 < the TPU's 128-lane tile, so every such stage runs the FULL
# array at <= m/256 lane efficiency -- and worse, at multi-GB sizes XLA's
# tile padding of the materialized (..., n_blocks, m) buffers (minor dims
# 30 or 2 padded to 128) inflates HBM 4-64x: the PINN-scale 2^24-point
# LDE needs 16+ GB through the natural path and ~2 GB transposed.
#
# History: the transposed path once triggered a silent miscompilation on
# the axon TPU backend at exactly shape (4, 128, 32768) -- ifft of
# (4, 2^22) returned wrong values while (3, 2^22), (4, 2^21) and
# (4, 2^23) were all correct; identical code is right on JAX-CPU at every
# size.  It is re-enabled because PINN-scale proving is impossible without
# it, and every bench/driver proof is verified end-to-end, so an FFT
# miscompile fails loudly (completeness, never soundness).  Set
# LUMINAIR_FFT_SMALL_M=0 to fall back to the natural path.
import os as _os

_SMALL_M = int(_os.environ.get("LUMINAIR_FFT_SMALL_M", "256"))

# Round-4 on-chip measurement mapped the miscompile: device FFT programs
# whose array total lies in [2^24, 2^25) return wrong values -- measured
# BAD: (4, 2^22), (16, 2^20), (8, 2^21), (2, 2^23) (all 2^24) and
# (12, 2^21) (1.5x2^24, host-checksum-verified); measured OK: (4, 2^21),
# (7, 2^21), (4, 2^23), (16, 2^21), (16, 2^22), (1, 2^21) and every split
# variant.  Both layouts are implicated: the natural-layout whole
# transform at (16, 2^20) disagreed with a clean split.  Workaround: any
# device transform with total in the window splits into two half-batches
# inside the same program (recursively -- a half landing back in the
# window splits again; halves converge below 2^24).  A single-row 2^24
# transform computes as (2, n) with a zero row and keeps row 0.  The accel
# startup canaries (parallel/accel.py self_check_fft) guard that the
# workaround holds on the running backend.
_BAD_LO = 1 << 24
_BAD_HI = 1 << 25


def _split_bad_total(values, sm, xp) -> bool:
    return (
        xp is not np
        and _BAD_LO <= values.size < _BAD_HI
        and values.ndim >= 2
    )


def self_check_small_m(device_ifft, log_n: int = 22, batch: int = 4) -> bool:
    """Device-vs-host oracle check of the transposed small-m iFFT path on
    the known-miscompile shape class ((4, 2^22) was the axon-backend repro
    above).  `device_ifft` maps a host (batch, 2^log_n) uint32 array to its
    iFFT, computed on the device under test.  Returns True iff it matches
    the host numpy transform bit-for-bit.

    Callers (parallel/accel.py enable()) disable the transposed path
    (_SMALL_M = 0) and warn when this returns False, so a backend
    miscompilation degrades to the slower natural layout instead of
    producing proofs that fail verification after a multi-minute prove."""
    rng = np.random.default_rng(0xF57)
    a = rng.integers(0, int(m31.P), size=(batch, 1 << log_n), dtype=np.uint32)
    host = ifft(a)
    dev = np.asarray(device_ifft(a))
    return bool(np.array_equal(host, dev))


def disable_small_m() -> None:
    """Force every FFT onto the natural-layout path (auto-fallback target)."""
    global _SMALL_M
    _SMALL_M = 0


def _small_stages_ifft(a, twiddles_inv, stage, m, n_blocks, xp, sm=None):
    """Finish iFFT line stages for m < the small-m threshold in transposed
    layout.  a: (..., n) with n = n_blocks * m.  Returns (..., n)."""
    n = a.shape[-1]
    M0 = m
    nb0 = n // M0
    # (..., nb0, M0) -> (..., M0, nb0): block axis becomes minor.
    at = xp.swapaxes(a.reshape(a.shape[:-1] + (nb0, M0)), -1, -2)
    while m >= 2:
        t = twiddles_inv[stage][:, None]  # (m/2, 1) broadcasts over nb axis
        blocks = at.reshape(at.shape[:-2] + (M0 // m, m, nb0))
        v0 = blocks[..., : m // 2, :]
        v1 = blocks[..., m // 2 :, :][..., ::-1, :]
        e = m31.mul(m31.add(v0, v1), _half(xp, m // 2))
        o = m31.mul(m31.sub(v0, v1), t)
        at = xp.concatenate([e, o], axis=-2).reshape(at.shape[:-2] + (M0, nb0))
        m //= 2
        stage += 1
    return xp.swapaxes(at, -1, -2).reshape(a.shape[:-1] + (n,))


def _transposed_fft_loop(at, twiddles, M0, nb0, m, stage, xp, lead_shape):
    """The transposed-layout forward stage loop shared by _small_stages_fft
    and fft_dup2.  at: (..., M0, nb0).  Returns the natural-layout array
    (..., n) plus (m, n_blocks, stage) for the natural continuation."""
    n = M0 * nb0
    while m <= M0:
        t = twiddles[stage][:, None]  # (m/2, 1)
        blocks = at.reshape(at.shape[:-2] + (M0 // m, m, nb0))
        e = blocks[..., : m // 2, :]
        o = blocks[..., m // 2 :, :]
        to = m31.mul(t, o)
        v0 = m31.add(e, to)
        v1 = m31.sub(e, to)[..., ::-1, :]
        at = xp.concatenate([v0, v1], axis=-2).reshape(at.shape[:-2] + (M0, nb0))
        m *= 2
        stage -= 1
    a = xp.swapaxes(at, -1, -2).reshape(lead_shape + (n,))
    return a, m, n // m, stage


def _small_stages_fft(a, twiddles, log_n, xp, m_start=2, sm=None):
    """Run forward-FFT line stages for m < the small-m threshold in
    transposed layout.  Returns (a, m, n_blocks, stage) ready for the
    natural-layout stages."""
    if sm is None:
        sm = _SMALL_M
    n = a.shape[-1]
    M0 = min(sm // 2, n // 2)
    if M0 < m_start:
        return a, m_start, n // m_start, log_n - m_start.bit_length() + 1
    nb0 = n // M0
    at = xp.swapaxes(a.reshape(a.shape[:-1] + (nb0, M0)), -1, -2)
    stage = log_n - m_start.bit_length() + 1
    return _transposed_fft_loop(at, twiddles, M0, nb0, m_start, stage, xp,
                                a.shape[:-1])


def fft_dup2(coeffs, twiddles=None, small_m=None):
    """Forward FFT of the blowup-1 zero-embedding of `coeffs` -- the
    duplicate-interleave [c0, c0, c1, c1, ...] -- WITHOUT materializing the
    interleave.

    On the TPU the (..., N, 2) stack+reshape materialization is
    tile-padded 4.3x by XLA (measured: two 8 GB HLO temps for a
    (30, 2^23) -> 2^24 LDE -- the batch-1024 flagship OOM), so when the
    transposed small-m layout is active we build its starting array
    directly from `coeffs`:

      interleave(c)[j*M0 + i] = c[j*(M0/2) + (i >> 1)]
      => at[i, j] = crt[i >> 1, j]  with crt = swapaxes(c.reshape(nb0, M0/2))
      => at = repeat(crt, 2, axis=-2)   (minor dim stays the large nb0)

    and run the shared transposed stage loop from m=4 (the m=2 stage on an
    interleaved array is the identity that the duplicate already encodes).
    Equivalent to fft(interleave, m_start=4) bit-for-bit (tests/test_fft)."""
    xp = _xp(coeffs)
    n = coeffs.shape[-1]
    n2 = n * 2
    log_n2 = n2.bit_length() - 1
    sm = _SMALL_M if small_m is None else small_m
    if (
        xp is not np
        and coeffs.ndim >= 2
        and _BAD_LO <= coeffs.size * 2 < _BAD_HI
    ):
        # Conceptual transform total lands in the miscompile window: split
        # the batch exactly as fft() would split the materialized array.
        if coeffs.shape[0] == 1:
            padded = xp.concatenate([coeffs, xp.zeros_like(coeffs)], axis=0)
            return fft_dup2(padded, twiddles, small_m=sm)[:1]
        h = coeffs.shape[0] // 2
        return xp.concatenate(
            [
                fft_dup2(coeffs[:h], twiddles, small_m=sm),
                fft_dup2(coeffs[h:], twiddles, small_m=sm),
            ],
            axis=0,
        )
    if twiddles is None:
        twiddles = circle.fft_twiddles(log_n2)
    M0 = min(sm // 2, n2 // 2) if sm > 0 else 0
    if xp is not np and sm > 0 and n2 >= 2 * sm and M0 >= 4:
        nb0 = n2 // M0
        crt = xp.swapaxes(
            coeffs.reshape(coeffs.shape[:-1] + (nb0, M0 // 2)), -1, -2
        )
        at = xp.repeat(crt, 2, axis=-2)  # (..., M0, nb0)
        stage = log_n2 - 2  # m = 4
        a, m, n_blocks, stage = _transposed_fft_loop(
            at, twiddles, M0, nb0, 4, stage, xp, coeffs.shape[:-1]
        )
    else:
        a = xp.stack([coeffs, coeffs], axis=-1).reshape(
            coeffs.shape[:-1] + (n2,)
        )
        m, n_blocks, stage = 4, n2 // 4, log_n2 - 2
    # Natural-layout continuation + circle stage (same as fft()).
    while m <= n2 // 2:
        t = twiddles[stage]
        blocks = a.reshape(a.shape[:-1] + (n_blocks, m))
        e = blocks[..., : m // 2]
        o = blocks[..., m // 2 :]
        to = m31.mul(t, o)
        v0 = m31.add(e, to)
        v1 = m31.sub(e, to)[..., ::-1]
        a = xp.concatenate([v0, v1], axis=-1).reshape(a.shape[:-1] + (n2,))
        m *= 2
        n_blocks //= 2
        stage -= 1
    t = twiddles[0]
    e = a[..., : n2 // 2]
    o = a[..., n2 // 2 :]
    to = m31.mul(t, o)
    v0 = m31.add(e, to)
    v1 = m31.sub(e, to)[..., ::-1]
    return xp.concatenate([v0, v1], axis=-1)


def ifft(values, twiddles_inv=None, small_m=None):
    """Interpolate: domain values (..., N) -> coefficients (..., N).

    `small_m` overrides the module-level _SMALL_M transposed-path threshold
    (0 forces the natural layout; used by the accel self-check to compare
    both paths inside one program)."""
    sm = _SMALL_M if small_m is None else small_m
    xp = _xp(values)
    if _split_bad_total(values, sm, xp):
        if values.shape[0] == 1:
            padded = xp.concatenate([values, xp.zeros_like(values)], axis=0)
            return ifft(padded, twiddles_inv, small_m=sm)[:1]
        h = values.shape[0] // 2
        return xp.concatenate(
            [
                ifft(values[:h], twiddles_inv, small_m=sm),
                ifft(values[h:], twiddles_inv, small_m=sm),
            ],
            axis=0,
        )
    n = values.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if log_n == 0:
        return values
    if twiddles_inv is None:
        twiddles_inv = circle.ifft_twiddles(log_n)

    a = values
    # Stage 0: circle stage over the full row axis.
    t = twiddles_inv[0]  # 1/(2 y_i), length N/2
    v0 = a[..., : n // 2]
    v1 = a[..., n // 2 :][..., ::-1]
    e = m31.mul(m31.add(v0, v1), _half(xp, n // 2))
    o = m31.mul(m31.sub(v0, v1), t)
    a = xp.concatenate([e, o], axis=-1)

    # Line stages: operate blockwise via reshape.
    n_blocks = 2
    m = n // 2
    stage = 1
    while m >= 2:
        if xp is not np and m < sm and n >= 2 * sm:
            return _small_stages_ifft(a, twiddles_inv, stage, m, n_blocks, xp, sm)
        t = twiddles_inv[stage]  # 1/(2 x_j), length m/2
        blocks = a.reshape(a.shape[:-1] + (n_blocks, m))
        v0 = blocks[..., : m // 2]
        v1 = blocks[..., m // 2 :][..., ::-1]
        e = m31.mul(m31.add(v0, v1), _half(xp, m // 2))
        o = m31.mul(m31.sub(v0, v1), t)
        a = xp.concatenate([e, o], axis=-1).reshape(a.shape[:-1] + (n,))
        n_blocks *= 2
        m //= 2
        stage += 1
    return a


def fft(coeffs, twiddles=None, m_start=2, small_m=None):
    """Evaluate: coefficients (..., N) -> domain values (..., N).

    m_start > 2 skips the deepest line stages -- the caller guarantees the
    array already holds the stage-(m_start/2) output (used by the blowup-1
    LDE, whose zero-extended first stage collapses to duplication).
    `small_m` overrides _SMALL_M (see ifft)."""
    sm = _SMALL_M if small_m is None else small_m
    xp = _xp(coeffs)
    if _split_bad_total(coeffs, sm, xp):
        if coeffs.shape[0] == 1:
            padded = xp.concatenate([coeffs, xp.zeros_like(coeffs)], axis=0)
            return fft(padded, twiddles, m_start=m_start, small_m=sm)[:1]
        h = coeffs.shape[0] // 2
        return xp.concatenate(
            [
                fft(coeffs[:h], twiddles, m_start=m_start, small_m=sm),
                fft(coeffs[h:], twiddles, m_start=m_start, small_m=sm),
            ],
            axis=0,
        )
    n = coeffs.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if log_n == 0:
        return coeffs
    if twiddles is None:
        twiddles = circle.fft_twiddles(log_n)

    a = coeffs
    if xp is not np and n >= 2 * sm and sm > 0:
        a, m, n_blocks, stage = _small_stages_fft(a, twiddles, log_n, xp, m_start, sm)
    else:
        m, n_blocks, stage = m_start, n // m_start, log_n - m_start.bit_length() + 1
    # Line stages in reverse (deepest first: block size 2 ... up to N/2).
    while m <= n // 2:
        t = twiddles[stage]  # x twiddles, length m/2
        blocks = a.reshape(a.shape[:-1] + (n_blocks, m))
        e = blocks[..., : m // 2]
        o = blocks[..., m // 2 :]
        to = m31.mul(t, o)
        v0 = m31.add(e, to)
        v1 = m31.sub(e, to)[..., ::-1]
        a = xp.concatenate([v0, v1], axis=-1).reshape(a.shape[:-1] + (n,))
        m *= 2
        n_blocks //= 2
        stage -= 1

    # Circle stage.
    t = twiddles[0]  # y twiddles, length N/2
    e = a[..., : n // 2]
    o = a[..., n // 2 :]
    to = m31.mul(t, o)
    v0 = m31.add(e, to)
    v1 = m31.sub(e, to)[..., ::-1]
    return xp.concatenate([v0, v1], axis=-1)


def lde(values, log_blowup: int, twiddles_inv=None, twiddles_big=None):
    """Low-degree extend values on D_n to the canonic domain D_{n+log_blowup}."""
    xp = _xp(values)
    n = values.shape[-1]
    coeffs = ifft(values, twiddles_inv)
    return extend_coeffs_and_fft(coeffs, log_blowup, twiddles_big)


def extend_coeffs_and_fft(coeffs, log_blowup: int, twiddles_big=None):
    xp = _xp(coeffs)
    n = coeffs.shape[-1]
    big_n = n << log_blowup
    if log_blowup == 1 and n > 1:
        # Zero-extending by stride 2 makes the deepest FFT stage trivial:
        # each m=2 block is [c, 0] -> [c, c].  Materialize that directly
        # (duplicate-interleave) and skip both the zeros scatter and the
        # first stage -- a strided minor-axis scatter is one of the slowest
        # patterns on the TPU.
        a = xp.stack([coeffs, coeffs], axis=-1).reshape(coeffs.shape[:-1] + (big_n,))
        return fft(a, twiddles_big, m_start=4)
    stride = 1 << log_blowup
    ext = xp.zeros(coeffs.shape[:-1] + (big_n,), dtype=xp.uint32)
    if xp is np:
        ext[..., ::stride] = coeffs
    else:
        ext = ext.at[..., ::stride].set(coeffs)
    return fft(ext, twiddles_big)


def _soa_mul_scalar(c0, c1, c2, c3, t):
    """QM31 multiply in structure-of-arrays form: four (..., N) coordinate
    arrays times one scalar QM31 t (4,).  Returns four coordinate arrays.

    SoA keeps every intermediate a plain (..., N) array with the long axis
    minor -- an AoS (..., N, 4) layout gets its trailing dim padded to the
    TPU's 128-lane tile (32x HBM blowup on materialized temps, the cause of
    the N=1024 OODS OOM)."""
    e, f, g, h = t[..., 0], t[..., 1], t[..., 2], t[..., 3]
    ac_r = m31.sub(m31.mul(c0, e), m31.mul(c1, f))
    ac_i = m31.add(m31.mul(c0, f), m31.mul(c1, e))
    bd_r = m31.sub(m31.mul(c2, g), m31.mul(c3, h))
    bd_i = m31.add(m31.mul(c2, h), m31.mul(c3, g))
    ad_r = m31.sub(m31.mul(c0, g), m31.mul(c1, h))
    ad_i = m31.add(m31.mul(c0, h), m31.mul(c1, g))
    bc_r = m31.sub(m31.mul(c2, e), m31.mul(c3, f))
    bc_i = m31.add(m31.mul(c2, f), m31.mul(c3, e))
    # R * BD = (2 + i)(bd_r + bd_i i)
    rbd_r = m31.sub(m31.add(bd_r, bd_r), bd_i)
    rbd_i = m31.add(bd_r, m31.add(bd_i, bd_i))
    return (
        m31.add(ac_r, rbd_r),
        m31.add(ac_i, rbd_i),
        m31.add(ad_r, bc_r),
        m31.add(ad_i, bc_i),
    )


def eval_at_point(coeffs, point):
    """Evaluate base-field coefficient vectors at a QM31 circle point.

    coeffs: (..., N) uint32;  point: (x, y) with each a (4,) QM31.
    Returns (..., 4) QM31.  Folds in SoA form (see _soa_mul_scalar).
    """
    xp = m31._xp(coeffs)
    n = coeffs.shape[-1]
    log_n = n.bit_length() - 1
    if log_n == 0:
        return qm31.from_m31(coeffs[..., 0], xp)
    x, y = point
    # Twiddle chain MSB..LSB: [y, x, pi(x), ..., pi^(n-2)(x)]
    ts = [y]
    cur = x
    for _ in range(log_n - 1):
        ts.append(cur)
        cur = circle.pi_x_qm31(cur)
    # First fold straight from M31 coefficients (lo + hi*t lifts to QM31).
    t = ts[log_n - 1]
    lo, hi = coeffs[..., 0::2], coeffs[..., 1::2]
    c = (
        m31.add(lo, m31.mul(hi, t[..., 0])),
        m31.mul(hi, t[..., 1]),
        m31.mul(hi, t[..., 2]),
        m31.mul(hi, t[..., 3]),
    )
    for lvl in range(log_n - 2, -1, -1):
        t = ts[lvl]
        lo = tuple(ck[..., 0::2] for ck in c)
        hi = tuple(ck[..., 1::2] for ck in c)
        hit = _soa_mul_scalar(*hi, t)
        c = tuple(m31.add(l, h) for l, h in zip(lo, hit))
    return xp.stack([ck[..., 0] for ck in c], axis=-1)


def basis_at_point(log_n: int, point):
    """All 2^log_n FFT basis functions evaluated at a QM31 point, (N, 4).

    b_j = prod ts[k]^bit_k(j), ts = [y, x, pi(x), ...] MSB-first; built in
    log_n doubling steps (N total QM31 muls)."""
    x, y = point
    ts = [y]
    cur_t = x
    for _ in range(log_n - 1):
        ts.append(cur_t)
        cur_t = circle.pi_x_qm31(cur_t)
    B = qm31.one((1,), np)
    for i in range(log_n):
        t = ts[log_n - 1 - i]
        B = np.concatenate([B, qm31.mul(np.broadcast_to(t, B.shape), B)], axis=0)
    return B


def mod_dot(C, B):
    """Modular matmul: (m, N) uint32 x (N, 4) uint32 -> (m, 4) mod p.

    int64 MACs with 16-bit splitting and chunked reduction (exact)."""
    p = np.int64(int(m31.P))
    C64 = C.astype(np.int64)
    Bl = (B & np.uint32(0xFFFF)).astype(np.int64)
    Bh = (B >> np.uint32(16)).astype(np.int64)
    n = C.shape[1]
    chunk = 1 << 14  # products < 2^47; sums < 2^61
    acc = np.zeros((C.shape[0], 4), dtype=np.int64)
    for s in range(0, n, chunk):
        lo = C64[:, s : s + chunk] @ Bl[s : s + chunk]
        hi = C64[:, s : s + chunk] @ Bh[s : s + chunk]
        acc = (acc + lo % p + ((hi % p) << 16)) % p
    return (acc % p).astype(np.uint32)


def eval_at_point_many(coeffs2d, point):
    """Evaluate many same-size base-field coefficient vectors at one QM31
    point: one basis vector + one modular matmul.  (C, N) -> (C, 4)."""
    C, n = coeffs2d.shape
    log_n = n.bit_length() - 1
    if log_n == 0:
        return qm31.from_m31(coeffs2d[:, 0])
    B = basis_at_point(log_n, point)
    return mod_dot(coeffs2d, B)


def eval_at_point_qm31_coeffs(coeffs_qm31, point):
    """Same as eval_at_point but for QM31 coefficient vectors (..., N, 4)."""
    n = coeffs_qm31.shape[-2]
    log_n = n.bit_length() - 1
    x, y = point
    ts = [y]
    cur = x
    for _ in range(log_n - 1):
        ts.append(cur)
        cur = circle.pi_x_qm31(cur)
    a = coeffs_qm31
    for lvl in range(log_n - 1, -1, -1):
        t = ts[lvl]
        a = a.reshape(a.shape[:-2] + (a.shape[-2] // 2, 2, 4))
        a = qm31.add(a[..., 0, :], qm31.mul(a[..., 1, :], _bcast(t, a[..., 1, :].shape)))
    return a[..., 0, :]


def _bcast(t, shape):
    xp = m31._xp(t)
    return xp.broadcast_to(t, shape)


# ---------------------------------------------------------------------------
# Line-domain helpers (used by FRI): the line domain at fold level j of a
# size-2^k circle domain is the x-coordinate chain {x((2i+1) G_{k+1-j})}.


def line_ifft_qm31(values, twiddles_inv):
    """Interpolate a QM31 evaluation (..., L, 4) on a line domain into line
    coefficients (basis bits MSB..LSB = [x, pi(x), pi^2(x), ...]).

    twiddles_inv: list of arrays 1/(2*x) per stage (lengths L/2, L/4, ...).
    """
    xp = m31._xp(values)
    L = values.shape[-2]
    a = values
    n_blocks = 1
    m = L
    stage = 0
    while m >= 2:
        t = twiddles_inv[stage][:, None]  # (m/2, 1) broadcast over qm31 coords
        blocks = a.reshape(a.shape[:-2] + (n_blocks, m, 4))
        v0 = blocks[..., : m // 2, :]
        v1 = blocks[..., m // 2 :, :][..., ::-1, :]
        e = m31.mul(m31.add(v0, v1), _INV2)
        o = m31.mul(m31.sub(v0, v1), xp.broadcast_to(t, v0.shape))
        a = xp.concatenate([e, o], axis=-2).reshape(a.shape[:-2] + (L, 4))
        n_blocks *= 2
        m //= 2
        stage += 1
    return a


def line_eval_at_x(coeffs_qm31, x):
    """Evaluate line coefficients (L, 4) at an M31 x-coordinate (scalar).

    Basis fold mirrors line_ifft_qm31's ordering."""
    L = coeffs_qm31.shape[-2]
    log_l = L.bit_length() - 1
    ts = []
    cur = np.asarray(x, dtype=np.uint32)
    for _ in range(log_l):
        ts.append(cur)
        cur = circle_pi(cur)
    a = coeffs_qm31
    for lvl in range(log_l - 1, -1, -1):
        t = ts[lvl]
        a = a.reshape(a.shape[:-2] + (a.shape[-2] // 2, 2, 4))
        a = m31.add(a[..., 0, :], qm31_mul_scalar_m31(a[..., 1, :], t))
    return a[..., 0, :]


def qm31_mul_scalar_m31(q, s):
    return m31.mul(q, np.broadcast_to(np.asarray(s, dtype=np.uint32), q.shape))


def circle_pi(x):
    x2 = m31.mul(x, x)
    return m31.sub(m31.add(x2, x2), np.uint32(1))


_INV2 = np.uint32((int(m31.P) + 1) // 2)  # 1/2 in M31


def _half(xp, length):
    """(p+1)/2 = inverse of 2; plain numpy scalar broadcasts in both
    backends (a cached device array would leak tracers under jit)."""
    return _INV2
