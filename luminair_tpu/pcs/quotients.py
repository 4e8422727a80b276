"""DEEP quotients: reduce "column c opened at point z with value v" claims
to a FRI low-degree claim.

For committed columns with M31 coefficients, the quotient for a sample
(z, v) divides by the line through z and sigma(z), where sigma is the
Gal(QM31/CM31) involution (qm31.conj_cm31); the numerator subtracts the
linear interpolant through (z, v), (sigma z, sigma v).  Honest columns give
polynomial quotients one degree lower than the column -- strictly inside
the column's FFT space, so no extra decomposition is needed (see
docs/PROTOCOL.md for the degree accounting).

Sample batches opened at the same point share a denominator; every
(column, point) sample gets its own power of the batching challenge gamma,
assigned by deterministic enumeration order shared with the verifier.

Replaces stwo's quotient/OODS machinery driven from the reference's
crates/prover/src/prover.rs:304-312 (phase 3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import circle
from ..fields import m31, qm31


@dataclass
class ColumnSample:
    commit_log: int
    tree: int
    col: int
    point: tuple  # (x, y) each (4,) qm31
    value: np.ndarray  # (4,) qm31


def _sample_constants(s: ColumnSample):
    """Per-sample precomputation shared by prover and verifier.

    Returns (A, B, Cc, a_coef, c0) such that
      denominator L(P) = A*x_P - B*y_P + Cc
      numerator_i(P)  = c_i(P) - a_coef*x_P - c0
    """
    zx, zy = s.point
    zbx, zby = qm31.conj_cm31(zx), qm31.conj_cm31(zy)
    A = qm31.sub(zby, zy)
    B = qm31.sub(zbx, zx)
    # L(P) = A*(x - zx) - B*(y - zy) = A*x - B*y + (B*zy - A*zx)
    Cc = qm31.sub(qm31.mul(B, zy), qm31.mul(A, zx))
    # Interpolant I(P) = v + (vbar - v) * (x - zx) / (zbx - zx)
    dv = qm31.sub(qm31.conj_cm31(s.value), s.value)
    denom = qm31.sub(zbx, zx)
    assert not np.all(np.asarray(denom) == 0), "sample point x lies in CM31"
    a_coef = qm31.mul(dv, qm31.inv(denom))
    c0 = qm31.sub(s.value, qm31.mul(a_coef, zx))
    return A, B, Cc, a_coef, c0


def _batch_constants(samples: List[ColumnSample]):
    """Vectorized `_sample_constants` over all samples at once: one set of
    (S, 4) host numpy ops instead of S scalar QM31 inversions (the scalar
    version costs ~1 ms/sample on host -- at ~200 samples per proof that was
    the single largest host cost in phase 3b)."""
    zx = np.stack([np.asarray(s.point[0], dtype=np.uint32) for s in samples])
    zy = np.stack([np.asarray(s.point[1], dtype=np.uint32) for s in samples])
    v = np.stack([np.asarray(s.value, dtype=np.uint32) for s in samples])
    zbx, zby = qm31.conj_cm31(zx), qm31.conj_cm31(zy)
    A = qm31.sub(zby, zy)
    B = qm31.sub(zbx, zx)
    Cc = qm31.sub(qm31.mul(B, zy), qm31.mul(A, zx))
    dv = qm31.sub(qm31.conj_cm31(v), v)
    denom = qm31.sub(zbx, zx)
    assert not np.any(np.all(denom == 0, axis=-1)), "sample point x lies in CM31"
    a_coef = qm31.mul(dv, qm31.inv(denom))
    c0 = qm31.sub(v, qm31.mul(a_coef, zx))
    return A, B, Cc, a_coef, c0


def _gamma_powers(gamma, n: int) -> np.ndarray:
    """(n, 4) array of gamma^0..gamma^(n-1), built by repeated doubling
    (log2(n) vectorized muls)."""
    out = qm31.one((1,), np)
    g = np.asarray(gamma, dtype=np.uint32)
    while out.shape[0] < n:
        out = np.concatenate([out, qm31.mul(out, np.broadcast_to(qm31.mul(out[-1], g), out.shape))])
    return out[:n]


def accumulate_quotients(
    samples: List[ColumnSample],
    column_evals: Dict[Tuple[int, int], np.ndarray],
    gamma,
    domains: Optional[Dict[int, tuple]] = None,
) -> Dict[int, np.ndarray]:
    """Quotient evaluations per commit log, batched over positions.

    column_evals: {(tree, col): (N,) uint32 evaluations}.  By default N is
    the full commitment domain (prover); the verifier passes the queried
    subset together with `domains` = {commit_log: (xs, ys)} of matching
    point coordinates.  Returns {commit_log: (N, 4) qm31}.
    """
    # Group samples (in order) by (commit_log, point) for shared denominators.
    groups = {}
    order = []
    for idx, s in enumerate(samples):
        key = (s.commit_log, s.point[0].tobytes(), s.point[1].tobytes())
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append((idx, s))

    out: Dict[int, np.ndarray] = {}
    allA, allB, allCc, all_a, all_c0 = _batch_constants(samples)
    gpows = _gamma_powers(gamma, len(samples))

    from ..parallel import accel

    for key in order:
        batch = groups[key]
        log = batch[0][1].commit_log
        idxs = np.asarray([idx for idx, _ in batch])
        A, B, Cc = allA[idxs[0]], allB[idxs[0]], allCc[idxs[0]]
        gs = gpows[idxs]  # (S, 4)
        # acc_a = sum_i g_i*a_i, acc_c0 = sum_i g_i*c0_i (vectorized).
        ga = qm31.mul(gs, all_a[idxs])
        gc = qm31.mul(gs, all_c0[idxs])
        acc_a = ga[0]
        acc_c0 = gc[0]
        for j in range(1, len(batch)):  # tiny reduction over samples
            acc_a = qm31.add(acc_a, ga[j])
            acc_c0 = qm31.add(acc_c0, gc[j])
        device = domains is None and any(
            not isinstance(column_evals[(s.tree, s.col)], np.ndarray)
            for _, s in batch
        )
        if device:
            # One jitted kernel per (log, batch size): scalar constants are
            # host-precomputed (they come from channel draws / OODS values),
            # column evaluations never leave the device.
            cols = [column_evals[(s.tree, s.col)] for _, s in batch]
            q = accel.quotient_group(log, cols, list(gs), A, B, Cc, acc_a, acc_c0)
            if log in out:
                out[log] = qm31.add(out[log], q)
            else:
                out[log] = q
            continue
        if domains is not None:
            xs, ys = domains[log]
            n = len(xs)
        else:
            n = 1 << log
            xs, ys = circle.domain_points(log)
        # Denominator on the whole domain.
        L = qm31.add(
            qm31.sub(
                qm31.mul_m31(np.broadcast_to(A, (n, 4)), xs),
                qm31.mul_m31(np.broadcast_to(B, (n, 4)), ys),
            ),
            np.broadcast_to(Cc, (n, 4)),
        )
        Linv = qm31.inv(L)
        # num = sum_i g_i*c_i(P) - (sum_i g_i*a_i)*x_P - sum_i g_i*c0_i:
        # columns are M31, so each g_i*c_i costs 4 base muls, and the linear
        # terms collapse to one scalar-by-x multiply for the whole group.
        num_acc = qm31.zero((n,), np)
        for j, (idx, s) in enumerate(batch):
            col = column_evals[(s.tree, s.col)]
            num_acc = qm31.add(num_acc, m31.mul(gs[j][None, :], col[:, None]))
        num_acc = qm31.sub(num_acc, qm31.mul_m31(np.broadcast_to(acc_a, (n, 4)), xs))
        num_acc = qm31.sub(num_acc, np.broadcast_to(acc_c0, (n, 4)))
        q = qm31.mul(num_acc, Linv)
        if log in out:
            out[log] = qm31.add(out[log], q)
        else:
            out[log] = q
    return out


def quotient_at_position(
    samples: List[ColumnSample],
    opened,
    commit_log: int,
    position: int,
    gamma,
) -> np.ndarray:
    """Verifier side: the quotient value at one domain position.

    opened: callable (tree, col, position) -> uint32 scalar value.
    """
    xs, ys = circle.domain_points(commit_log)
    xP = np.asarray(xs[position])
    yP = np.asarray(ys[position])
    acc = qm31.zero((), np)
    # Group by point exactly as the prover (denominator shared).
    groups = {}
    order = []
    for idx, s in enumerate(samples):
        if s.commit_log != commit_log:
            continue
        key = (s.point[0].tobytes(), s.point[1].tobytes())
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append((idx, s))
    for key in order:
        batch = groups[key]
        A, B, Cc, _, _ = _sample_constants(batch[0][1])
        L = qm31.add(qm31.sub(qm31.mul_m31(A, xP), qm31.mul_m31(B, yP)), Cc)
        Linv = qm31.inv(L)
        num_acc = qm31.zero((), np)
        for idx, s in batch:
            _, _, _, a_coef, c0 = _sample_constants(s)
            c_val = qm31.from_m31(np.asarray(opened(s.tree, s.col, position)))
            num = qm31.sub(qm31.sub(c_val, qm31.mul_m31(a_coef, xP)), c0)
            num_acc = qm31.add(num_acc, qm31.mul(qm31.pow_const(gamma, idx), num))
        acc = qm31.add(acc, qm31.mul(num_acc, Linv))
    return acc
