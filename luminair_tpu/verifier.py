"""verify(proof, settings): the cheap side of the STARK.

Mirrors the reference verifier (crates/verifiers/rust/src/verifier.rs:21-143):
re-derive the preprocessed trace from settings, replay the transcript
(claim -> roots -> elements -> claimed sums -> composition alpha -> OODS),
check the global LogUp sum, check the composition identity at the OODS
point, then verify DEEP quotients + FRI + Merkle decommitments.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from . import circle
from .fields import m31, qm31
from .crypto.channel import Blake2sChannel
from .crypto.merkle import MerkleTree
from .pcs.scheme import CommitmentSchemeVerifier
from .air.layout import AirLayout, recombine_qm31
from .air.framework import ConstraintAccumulator, PointEval
from .errors import InvalidLogUpError, StwoVerifierError
from .prover import LuminairProof


_PP_ROOT_CACHE: Dict[tuple, np.ndarray] = {}


def _validate_lut_tables(settings) -> None:
    """Settings may ship normative LUT output bytes (PROTOCOL §5).  The
    table is part of the public statement; before trusting it, bound how
    far it can deviate from the actual transcendental -- otherwise a
    malicious prover could label an arbitrary function "sin".  Tolerance
    (one fixed step + 2^-48 relative) dwarfs cross-libm last-ulp noise, so
    the check is implementation-independent.  Native (verify.inc) and JS
    (verify.mjs) verifiers run the same check."""
    from .air.preprocessed import validate_lut_outputs

    for kind in ("sin", "exp2", "log2"):
        layout = getattr(settings.lookups, kind, None)
        if layout is not None and layout.outputs is not None:
            ok, n_bad = validate_lut_outputs(kind, layout.all_values(), layout.outputs)
            if not ok:
                raise StwoVerifierError(
                    f"{kind} LUT output table out of tolerance ({n_bad} entries)"
                )


def _preprocessed_root(layout: AirLayout, settings, log_blowup: int) -> np.ndarray:
    from . import serde
    from .pcs.scheme import TreeProver

    key = (
        serde.settings_to_flat_bytes(settings),
        tuple(layout.pp_logs()),
        int(log_blowup),
    )
    root = _PP_ROOT_CACHE.get(key)
    if root is None:
        if len(_PP_ROOT_CACHE) >= 16:
            _PP_ROOT_CACHE.clear()
        root = np.asarray(TreeProver(layout.pp.columns(), log_blowup).root)
        _PP_ROOT_CACHE[key] = root
    return root


def composition_oods_matches(layout, claim, proof, elems, alpha, z) -> bool:
    """Does the composition polynomial's claimed OODS value match the
    constraint quotients recombined from the sampled trace values?  The
    core soundness identity (reference: stwo core verifier as driven by
    crates/verifiers/rust/src/verifier.rs:61-132); shared by verify() and
    the prover's end-of-prove self-check."""
    sv = proof.pcs_proof.sampled_values
    total = qm31.zero((), np)
    acc_pow = qm31.from_ints(1)
    for c in layout.components:
        n = claim.log_sizes[c.name]
        s0, _ = layout.main_slices[c.name]
        main_values = {
            name: sv[1][s0 + i][0] for i, name in enumerate(c.MAIN)
        }
        main_next_values = {
            name: sv[1][s0 + c.MAIN.index(name)][1] for name in c.MAIN_NEXT
        }
        pp_values = {pid: sv[0][layout.pp_index(pid)][0] for pid in list(c.PP_IDS)}
        b0, b1 = layout.inter_slices[c.name]
        inter_values = []
        for b in range(b1 - b0):
            coords = [sv[2][(b0 + b) * 4 + k][0] for k in range(4)]
            inter_values.append(recombine_qm31(coords))
        prev_coords = [sv[2][(b1 - 1) * 4 + k][1] for k in range(4)]
        inter_prev = recombine_qm31(prev_coords)
        is_first_val = sv[0][layout.pp_index(layout.is_first_id(c.name))][0]
        comp_acc = ConstraintAccumulator(alpha, ())
        comp_acc._pow = acc_pow
        pev = PointEval(
            main_values,
            pp_values,
            inter_values,
            inter_prev,
            is_first_val,
            np.asarray(proof.interaction_claim.sums[c.name], dtype=np.uint32),
            comp_acc,
            main_next_values,
        )
        c.evaluate(pev, elems)
        acc_pow = comp_acc._pow
        v = circle.coset_vanishing_eval_qm31(z[0], n)
        total = qm31.add(total, qm31.mul(comp_acc.acc, qm31.inv(v)))

    comp_at_z = recombine_qm31([sv[3][k][0] for k in range(4)])
    return bool(np.array_equal(np.asarray(total), np.asarray(comp_at_z)))


def prover_self_check(proof: LuminairProof, settings) -> bool:
    """Cheap whole-proof integrity gate run by prove() before returning
    (round-4 VERDICT directive #2): replay the Fiat-Shamir transcript from
    the proof's own roots (no tree recomputation -- milliseconds) and check
    the composition identity at the OODS point.  Every observed backend
    miscompilation that survived per-program qualification broke exactly
    this identity; a False here means the prover's arithmetic is corrupt
    and the caller must re-prove on a trusted path."""
    channel = Blake2sChannel()
    claim = proof.claim
    claim.mix_into(channel)
    layout = AirLayout(claim, settings)
    channel.mix_root(np.asarray(proof.roots[0], dtype=np.uint32))
    channel.mix_root(np.asarray(proof.roots[1], dtype=np.uint32))
    elems = layout.draw_elements(channel)
    if not proof.interaction_claim.is_balanced():
        return False
    proof.interaction_claim.mix_into(channel)
    channel.mix_root(np.asarray(proof.roots[2], dtype=np.uint32))
    alpha = channel.draw_felt()
    channel.mix_root(np.asarray(proof.roots[3], dtype=np.uint32))
    z = circle.point_from_t_qm31(channel.draw_felt())
    return composition_oods_matches(layout, claim, proof, elems, alpha, z)


def verify(proof: LuminairProof, settings, expected_config=None,
           min_security_bits: int = 0) -> bool:
    """Raises on failure; returns True on acceptance.

    The PCS parameters ride in the proof (PROTOCOL §10), so a verifier
    that accepts whatever arrives is open to parameter-downgrade: pass
    ``expected_config`` to require an exact `PcsConfig` match, or
    ``min_security_bits`` to enforce a floor on
    ``proof.config.security_bits()`` (e.g. 80).  Mirrors stwo's verify
    taking the config from the caller rather than the wire."""
    from . import tracing

    config = proof.config
    if expected_config is not None and config != expected_config:
        raise StwoVerifierError(
            f"proof config {config} != expected {expected_config}"
        )
    if config.security_bits() < min_security_bits:
        raise StwoVerifierError(
            f"proof offers {config.security_bits()} security bits; "
            f"caller requires >= {min_security_bits}"
        )
    _validate_lut_tables(settings)
    channel = Blake2sChannel()
    timer = tracing.start("verify")

    claim = proof.claim
    claim.mix_into(channel)
    layout = AirLayout(claim, settings)

    pcs = CommitmentSchemeVerifier(config, channel)

    # Tree 0: the verifier rebuilds the preprocessed columns itself and
    # recommits (LDE + Merkle) -- the root must match the prover's.  The
    # recommit depends only on (settings, pp layout, blowup), so the root is
    # cached across verifies of the same circuit (CI and benches verify many
    # proofs against one settings object; the LUT recommit is prover-scale
    # at large LUTs).
    with timer.span("preprocessed_recommit"):
        expect_root = _preprocessed_root(layout, settings, config.log_blowup)
        if not np.array_equal(expect_root, np.asarray(proof.roots[0])):
            raise StwoVerifierError("preprocessed tree root mismatch")
    pcs.commit(proof.roots[0], layout.pp_logs())
    pcs.commit(proof.roots[1], layout.main_logs)

    elems = layout.draw_elements(channel)

    # Global LogUp balance.
    if not proof.interaction_claim.is_balanced():
        raise InvalidLogUpError("sum of claimed LogUp sums != 0")
    proof.interaction_claim.mix_into(channel)
    pcs.commit(proof.roots[2], layout.inter_logs)

    alpha = channel.draw_felt()
    pcs.commit(proof.roots[3], [layout.composition_log] * 4)

    z = circle.point_from_t_qm31(channel.draw_felt())
    sample_points = layout.sample_points(z)

    # ---- composition identity at the OODS point ------------------------
    with timer.span("oods_composition_check"):
        if not composition_oods_matches(layout, claim, proof, elems, alpha, z):
            raise StwoVerifierError("composition polynomial OODS mismatch")

    # ---- PCS: sampled values, quotients, FRI, decommitments ------------
    with timer.span("pcs_fri_decommit"):
        if not pcs.verify_values(sample_points, proof.pcs_proof):
            raise StwoVerifierError("PCS verification failed")
    return True
