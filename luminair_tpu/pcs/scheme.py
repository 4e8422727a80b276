"""Commitment scheme: multi-tree column commitments + openings via DEEP
quotients and FRI.

Prover and verifier live side-by-side so the Fiat-Shamir choreography is
one visible sequence:

  commit phase:   per tree: LDE columns -> Merkle -> mix root
  opening phase:  mix sampled values -> draw gamma -> FRI (alpha chain,
                  layer roots, last coeffs) -> PoW -> draw queries ->
                  decommit trees + FRI layers

Plays the role of stwo's CommitmentSchemeProver/Verifier as driven by the
reference at crates/prover/src/prover.rs:44-46 and
crates/verifiers/rust/src/verifier.rs:61-132.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import circle, fft
from ..fields import qm31
from ..crypto.merkle import MerkleTree, verify_decommitment, computed_positions
from . import fri as fri_mod
from .config import PcsConfig
from .quotients import ColumnSample, accumulate_quotients


@dataclass
class PcsProof:
    sampled_values: list  # [tree][col][point] -> (4,) uint32
    fri_proof: "fri_mod.FriProof"
    pow_nonce: int
    tree_queried_values: list  # [tree] -> list of value arrays
    tree_witnesses: list  # [tree] -> list of digests


class TreeProver:
    """One committed tree: columns given on their trace domains, stored as
    coefficients + LDE evaluations on commit domains (trace_log + blowup)."""

    def __init__(self, columns: List[np.ndarray], log_blowup: int):
        from ..parallel import accel

        self.log_blowup = log_blowup
        self.trace_logs = []
        for col in columns:
            log = int(col.shape[0]).bit_length() - 1
            assert 1 << log == col.shape[0]
            self.trace_logs.append(log)
        # Batch LDE per size group (one FFT kernel launch per size).
        # Device columns stay device-resident end-to-end (coeffs feed the
        # OODS evaluation, evals feed Merkle hashing + DEEP quotients).
        self.coeffs = [None] * len(columns)
        self.evals = [None] * len(columns)
        by_log: Dict[int, List[int]] = {}
        for i, log in enumerate(self.trace_logs):
            by_log.setdefault(log, []).append(i)
        for log, idxs in by_log.items():
            group = [columns[i] for i in idxs]
            if any(not isinstance(c, np.ndarray) for c in group):
                import jax.numpy as jnp

                mat = jnp.stack([jnp.asarray(c) for c in group])
                coeffs, evals = accel.lde_columns(mat, log_blowup)
            else:
                mat = np.stack([np.asarray(c, dtype=np.uint32) for c in group])
                from .. import fft

                coeffs = fft.ifft(mat)
                evals = fft.extend_coeffs_and_fft(coeffs, log_blowup)
            for j, i in enumerate(idxs):
                self.coeffs[i] = coeffs[j]
                self.evals[i] = evals[j]
        self.commit_logs = [l + log_blowup for l in self.trace_logs]
        self.merkle = MerkleTree(self.evals)

    @property
    def root(self):
        return self.merkle.root


class CommitmentSchemeProver:
    def __init__(self, config: PcsConfig, channel):
        self.config = config
        self.channel = channel
        self.trees: List[TreeProver] = []

    def commit(self, columns: List[np.ndarray]) -> int:
        tree = TreeProver(columns, self.config.log_blowup)
        self.channel.mix_root(tree.root)
        self.trees.append(tree)
        return len(self.trees) - 1

    def prove_values(self, sample_points: List[List[List[tuple]]]) -> PcsProof:
        """sample_points[tree][col] = list of (x, y) QM31 points.

        Returns the opening proof; mixes everything into the channel."""
        from .. import tracing

        timer = tracing.current("prove")
        ch = self.channel
        # 1. Evaluate samples (from coefficients), batched per
        # (point, size) group across columns.
        groups = {}
        for t, tree in enumerate(self.trees):
            for c, pts in enumerate(sample_points[t]):
                for pi, pt in enumerate(pts):
                    key = (pt[0].tobytes(), pt[1].tobytes(), len(tree.coeffs[c]))
                    groups.setdefault(key, (pt, []))[1].append((t, c, pi))
        from ..parallel import accel

        values = {}
        with timer.span("3b_oods_eval"):
            # Dispatch every group, then download ALL results in ONE sync
            # (each sync costs a full tunnel RTT).
            pending = []  # (members, evs) -- evs device or host
            for (pt, members) in groups.values():
                cols = [self.trees[t].coeffs[c] for t, c, _ in members]
                if accel.enabled() and any(not isinstance(c, np.ndarray) for c in cols):
                    import jax.numpy as jnp

                    mat = jnp.stack([jnp.asarray(c) for c in cols])
                    evs = accel.eval_at_point_many(mat, pt)
                else:
                    mat = np.stack(cols)
                    evs = fft.eval_at_point_many(mat, pt)
                pending.append((members, evs))
            dev = [i for i, (_, e) in enumerate(pending) if not isinstance(e, np.ndarray)]
            if dev:
                import jax.numpy as jnp

                flat = np.asarray(
                    jnp.concatenate([pending[i][1].reshape(-1) for i in dev])
                )
                off = 0
                for i in dev:
                    members, e = pending[i]
                    n = len(members) * 4
                    pending[i] = (members, flat[off : off + n].reshape(-1, 4))
                    off += n
            for members, evs in pending:
                for (t, c, pi), v in zip(members, evs):
                    values[(t, c, pi)] = np.asarray(v, dtype=np.uint32)
        # Coefficients exist only to serve the OODS evaluations above;
        # free them now so the DEEP-quotient phase (which stacks every
        # commit-log group) starts with a full tree-size of HBM headroom
        # (the batch-1024 flagship peak -- docs/tpu.md "HBM budget").
        for tree in self.trees:
            tree.coeffs = None

        sampled_values = []
        samples: List[ColumnSample] = []
        for t, tree in enumerate(self.trees):
            tree_vals = []
            for c, pts in enumerate(sample_points[t]):
                col_vals = []
                for pi, pt in enumerate(pts):
                    v = values[(t, c, pi)]
                    col_vals.append(v)
                    samples.append(
                        ColumnSample(
                            commit_log=tree.commit_logs[c],
                            tree=t,
                            col=c,
                            point=pt,
                            value=v,
                        )
                    )
                tree_vals.append(col_vals)
            sampled_values.append(tree_vals)
        for tree_vals in sampled_values:
            for col_vals in tree_vals:
                for v in col_vals:
                    ch.mix_felts(v)

        # 2. Quotients + FRI.
        gamma = ch.draw_felt()
        column_evals = {
            (t, c): tree.evals[c]
            for t, tree in enumerate(self.trees)
            for c in range(len(tree.evals))
        }
        with timer.span("3b_quotients"):
            quotients = accumulate_quotients(samples, column_evals, gamma)
        with timer.span("3b_fri_commit"):
            fri_proof, fri_ctx = fri_mod.fri_prove(quotients, self.config.fri, ch)

        # 3. PoW + queries.
        with timer.span("3b_pow"):
            nonce = ch.grind_pow(self.config.pow_bits)
        ch.mix_u64(nonce)
        kmax = max(quotients)
        positions = ch.draw_queries(self.config.fri.n_queries, kmax)

        # 4. Decommit FRI layers and trees.
        with timer.span("3b_decommit"):
            fri_mod.fri_decommit(fri_proof, fri_ctx, positions)
            fri_proof.pow_nonce = nonce
            need = fri_mod.needed_input_positions(positions, sorted(quotients), self.config.fri)
            # Tree openings: plan all gathers, one fused dispatch + download.
            plans = []
            for tree in self.trees:
                queries = {}
                for log in set(tree.commit_logs):
                    if log in need:
                        queries[log] = need[log]
                plans.append(
                    (
                        tree.merkle.queried_values_plan(queries),
                        tree.merkle.decommit_plan(queries),
                    )
                )
            all_specs = []
            for (q_specs, _), (d_specs, _) in plans:
                all_specs.extend(q_specs)
                all_specs.extend(d_specs)
            results = accel.gather_many(all_specs)
            tree_queried_values = []
            tree_witnesses = []
            off = 0
            for (q_specs, q_asm), (d_specs, d_asm) in plans:
                tree_queried_values.append(q_asm(results[off : off + len(q_specs)]))
                off += len(q_specs)
                tree_witnesses.append(d_asm(results[off : off + len(d_specs)]))
                off += len(d_specs)

        return PcsProof(
            sampled_values=sampled_values,
            fri_proof=fri_proof,
            pow_nonce=nonce,
            tree_queried_values=tree_queried_values,
            tree_witnesses=tree_witnesses,
        )


class CommitmentSchemeVerifier:
    def __init__(self, config: PcsConfig, channel):
        self.config = config
        self.channel = channel
        self.roots: List[np.ndarray] = []
        self.tree_trace_logs: List[List[int]] = []

    def commit(self, root, column_trace_logs: List[int]):
        self.channel.mix_root(root)
        self.roots.append(np.asarray(root, dtype=np.uint32))
        self.tree_trace_logs.append(list(column_trace_logs))

    def verify_values(self, sample_points, proof: PcsProof) -> bool:
        ch = self.channel
        B = self.config.log_blowup
        # 1. Mix claimed sampled values (shape check against points).
        samples: List[ColumnSample] = []
        for t, tree_pts in enumerate(sample_points):
            if len(proof.sampled_values[t]) != len(tree_pts):
                return False
            for c, pts in enumerate(tree_pts):
                vals = proof.sampled_values[t][c]
                if len(vals) != len(pts):
                    return False
                for pt, v in zip(pts, vals):
                    samples.append(
                        ColumnSample(
                            commit_log=self.tree_trace_logs[t][c] + B,
                            tree=t,
                            col=c,
                            point=pt,
                            value=np.asarray(v, dtype=np.uint32),
                        )
                    )
        for tree_vals in proof.sampled_values:
            for col_vals in tree_vals:
                for v in col_vals:
                    ch.mix_felts(np.asarray(v, dtype=np.uint32))

        gamma = ch.draw_felt()
        input_logs = sorted({s.commit_log for s in samples}, reverse=True)
        kmax = input_logs[0]

        # 2. Replay FRI commitments (structure + channel).
        replay = fri_mod.fri_replay(proof.fri_proof, self.config.fri, ch, input_logs)
        if replay is None:
            return False
        alpha0, alphas = replay

        # 3. PoW + queries.
        if not ch.check_pow_nonce(self.config.pow_bits, proof.pow_nonce):
            return False
        ch.mix_u64(proof.pow_nonce)
        positions = ch.draw_queries(self.config.fri.n_queries, kmax)

        # 4. Verify tree decommitments; build opened-value lookup.
        need = fri_mod.needed_input_positions(positions, input_logs, self.config.fri)
        opened: Dict[Tuple[int, int], Dict[int, int]] = {}
        for t, logs in enumerate(self.tree_trace_logs):
            commit_logs = [l + B for l in logs]
            queries = {}
            for log in set(commit_logs):
                if log in need:
                    queries[log] = need[log]
            if not verify_decommitment(
                self.roots[t],
                commit_logs,
                queries,
                proof.tree_queried_values[t],
                proof.tree_witnesses[t],
            ):
                return False
            #

            comp = computed_positions(commit_logs, queries)
            # Values are ordered: logs descending, insertion order within log.
            vi = iter(proof.tree_queried_values[t])
            for log in sorted(set(commit_logs), reverse=True):
                for c in [i for i, cl in enumerate(commit_logs) if cl == log]:
                    vals = np.asarray(next(vi), dtype=np.uint32)
                    opened[(t, c)] = {p: int(vals[j]) for j, p in enumerate(comp[log])}

        # 5. Recompute quotients at the query positions -- batched over
        # positions through the same code path as the prover.
        from .. import circle as _circle

        domains = {}
        pos_index = {}
        for log, poss in need.items():
            xs, ys = _circle.domain_points(log)
            idx = np.asarray(poss, dtype=np.int64)
            domains[log] = (xs[idx], ys[idx])
            pos_index[log] = idx  # sorted
        col_arrays = {}
        for s in samples:
            key = (s.tree, s.col)
            if key in col_arrays:
                continue
            vals = opened[key]
            col_arrays[key] = np.array(
                [vals[int(p)] for p in need[s.commit_log]], dtype=np.uint32
            )
        quots = accumulate_quotients(samples, col_arrays, gamma, domains)

        def query_eval(circle_log, pos):
            # Vectorized: pos is an int64 array; opened positions are sorted.
            j = np.searchsorted(pos_index[circle_log], np.asarray(pos, dtype=np.int64))
            return quots[circle_log][j]

        return fri_mod.fri_check_queries(
            proof.fri_proof,
            self.config.fri,
            alpha0,
            alphas,
            query_eval,
            input_logs,
            positions,
        )
