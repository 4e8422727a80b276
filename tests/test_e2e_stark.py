"""End-to-end STARK: hand-built PIE (inputs + add) -> prove -> verify,
plus soundness probes (constraint violation, LogUp imbalance, tampering)."""

import numpy as np
import pytest

from luminair_tpu import fixed
from luminair_tpu.air.pie import ExecutionResources, LuminairPie, Metadata, TraceTable
from luminair_tpu.air.settings import CircuitSettings
from luminair_tpu.errors import InvalidLogUpError, StwoVerifierError
from luminair_tpu.fields import m31
from luminair_tpu.pcs.config import FriConfig, PcsConfig
from luminair_tpu.prover import prove
from luminair_tpu.verifier import verify

P = 2**31 - 1
CFG = PcsConfig(pow_bits=2, fri=FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=8))

NEG1 = np.uint32(P - 1)


def build_add_pie(tamper_out=False, tamper_mult=False):
    a = fixed.from_float([1.0, 2.5, -3.25, 0.5])
    b = fixed.from_float([0.25, -1.5, 2.0, 4.0])
    out = a + b

    # inputs table: node 0 (a), node 1 (b), each consumed once by node 2.
    inp_cols = {
        "node_id": np.concatenate([np.full(4, 0), np.full(4, 1)]).astype(np.uint32),
        "idx": np.tile(np.arange(4, dtype=np.uint32), 2),
        "is_last_idx": np.tile(np.array([0, 0, 0, 1], dtype=np.uint32), 2),
        "next_node_id": np.concatenate([np.full(4, 0), np.full(4, 1)]).astype(np.uint32),
        "next_idx": np.tile(np.arange(1, 5, dtype=np.uint32), 2),
        "val": np.concatenate([fixed.to_m31(a), fixed.to_m31(b)]),
        "multiplicity": np.ones(8, dtype=np.uint32),
    }

    out_m31 = fixed.to_m31(out)
    if tamper_out:
        out_m31 = out_m31.copy()
        out_m31[1] = m31.add(out_m31[1], np.uint32(1))
    out_mult = np.zeros(4, dtype=np.uint32)  # final output
    if tamper_mult:
        out_mult = np.ones(4, dtype=np.uint32)
    add_cols = {
        "node_id": np.full(4, 2, dtype=np.uint32),
        "lhs_id": np.full(4, 0, dtype=np.uint32),
        "rhs_id": np.full(4, 1, dtype=np.uint32),
        "idx": np.arange(4, dtype=np.uint32),
        "is_last_idx": np.array([0, 0, 0, 1], dtype=np.uint32),
        "next_node_id": np.full(4, 2, dtype=np.uint32),
        "next_lhs_id": np.full(4, 0, dtype=np.uint32),
        "next_rhs_id": np.full(4, 1, dtype=np.uint32),
        "next_idx": np.arange(1, 5, dtype=np.uint32),
        "lhs": fixed.to_m31(a),
        "rhs": fixed.to_m31(b),
        "out": out_m31,
        "lhs_mult": np.full(4, NEG1, dtype=np.uint32),
        "rhs_mult": np.full(4, NEG1, dtype=np.uint32),
        "out_mult": out_mult,
    }

    pie = LuminairPie(
        trace_tables={
            "inputs": TraceTable("inputs", inp_cols),
            "add": TraceTable("add", add_cols),
        },
        metadata=Metadata(ExecutionResources({"inputs": 2, "add": 1}, 4)),
    )
    return pie, CircuitSettings()


class TestE2EStark:
    def test_prove_verify_roundtrip(self):
        pie, settings = build_add_pie()
        proof = prove(pie, settings, CFG)
        assert verify(proof, settings)

    def test_constraint_violation_rejected(self):
        pie, settings = build_add_pie(tamper_out=True)
        # The tampered output breaks both the add constraint and the LogUp
        # balance (out isn't consumed, so only the constraint matters when
        # out_mult = 0: LogUp stays balanced, the algebraic check trips).
        proof = prove(pie, settings, CFG)
        with pytest.raises(StwoVerifierError):
            verify(proof, settings)

    def test_logup_imbalance_rejected(self):
        pie, settings = build_add_pie(tamper_mult=True)
        proof = prove(pie, settings, CFG)
        with pytest.raises(InvalidLogUpError):
            verify(proof, settings)

    def test_tampered_proof_value_rejected(self):
        pie, settings = build_add_pie()
        proof = prove(pie, settings, CFG)
        proof.pcs_proof.sampled_values[1][9][0] = proof.pcs_proof.sampled_values[1][9][0].copy()
        proof.pcs_proof.sampled_values[1][9][0][0] ^= 1
        with pytest.raises(StwoVerifierError):
            verify(proof, settings)

    def test_tampered_claimed_sum_rejected(self):
        pie, settings = build_add_pie()
        proof = prove(pie, settings, CFG)
        proof.interaction_claim.sums["add"] = proof.interaction_claim.sums["add"].copy()
        proof.interaction_claim.sums["add"][0] = m31.add(
            np.asarray(proof.interaction_claim.sums["add"][0]), np.uint32(1)
        )
        with pytest.raises((InvalidLogUpError, StwoVerifierError)):
            verify(proof, settings)
