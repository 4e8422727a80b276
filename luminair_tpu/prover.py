"""prove(pie, settings) -> LuminairProof: the 4-phase STARK pipeline.

Mirrors the reference's prover orchestration
(crates/prover/src/prover.rs:28-319):

  Phase 0: commit preprocessed trace (LUT columns, is_first flags);
  Phase 1: pad + commit main trace columns per component;
  Phase 2: draw interaction elements, build LogUp interaction columns,
           mix claimed sums, commit;
  Phase 3: composition polynomial from the per-component constraint
           quotients, OODS sampling, DEEP quotients + FRI (pcs/scheme.py).

Everything heavy is vectorized column arithmetic (FFTs, constraint
evaluation, logup fractions) -- the JAX/TPU execution path runs the same
kernels on device (parallel/).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from . import circle, fft
from .fields import m31, qm31
from .crypto.channel import Blake2sChannel
from .pcs.config import PcsConfig
from .pcs.scheme import CommitmentSchemeProver, PcsProof
from .air.claim import LuminairClaim, LuminairInteractionClaim
from .air.layout import AirLayout, recombine_qm31
from .air.framework import ConstraintAccumulator, DomainEval, WitnessEval
from .air.pie import LuminairPie
from .errors import EmptyTraceError, ProverError


@dataclass
class LuminairProof:
    claim: LuminairClaim
    interaction_claim: LuminairInteractionClaim
    roots: List[np.ndarray]
    pcs_proof: PcsProof
    config: PcsConfig


def prove(pie: LuminairPie, settings, config: Optional[PcsConfig] = None) -> LuminairProof:
    """Prove with an end-of-prove integrity gate (round-4 VERDICT #2).

    After building the proof, replay the transcript and re-check the
    composition identity at the OODS point host-side (milliseconds,
    verifier.prover_self_check).  Per-program FFT qualification
    (parallel/accel.py) makes silent device corruption implausible, but
    this gate guarantees prove() can never RETURN a proof that fails that
    identity: on mismatch it falls back -- first forcing every device FFT
    onto the natural layout, then re-proving entirely on host numpy (the
    bit-exact oracle) -- warning at each step.  The reference's CPU prover
    never emits an unverifiable proof (crates/prover/src/prover.rs:28-319);
    neither does this one."""
    import os as _os
    import warnings

    from .parallel import accel

    tables = {n: t for n, t in pie.trace_tables.items() if t.n_rows > 0}
    device = bool(tables) and accel.offload_rows(
        1 << max(t.log_size for t in tables.values())
    )
    check = _os.environ.get("LUMINAIR_PROVE_SELFCHECK", "1") != "0"
    shape_sig = "|".join(
        f"{n}:{t.log_size}" for n, t in sorted(tables.items())
    ) + f":B{(config or PcsConfig()).log_blowup}"
    if device and accel.oom_shape_known(shape_sig):
        # This shape exhausted HBM before (persisted by the heal ladder);
        # skip the doomed device attempt and prove on host directly.
        warnings.warn(
            "this proof shape previously exhausted device HBM; proving on "
            "host numpy (LUMINAIR_RETRY_OOM_SHAPES=1 to re-attempt on "
            "device, e.g. on a bigger chip or a mesh)."
        )
        was_enabled = accel.enabled()
        accel.enable(False)
        try:
            proof = _prove_once(pie, settings, config)
        finally:
            if was_enabled:
                accel.enable(True)
        from .verifier import prover_self_check as _psc

        if check and not _psc(proof, settings):
            raise ProverError("host prove failed its own OODS self-check")
        return proof

    # A corrupt device program either yields a proof violating the OODS
    # identity (the observed batch-256 mode) or trips an internal
    # consistency assert mid-prove (e.g. the FRI last-layer degree bound);
    # both route to the heal ladder when the device path is in play.
    err: Optional[Exception] = None
    try:
        proof = _prove_once(pie, settings, config)
    except Exception as e:
        if not (device and check):
            raise
        err, proof = e, None
    if not (device and check):
        return proof
    from . import tracing
    from .verifier import prover_self_check

    timer = tracing.current("prove")
    if proof is not None:
        with timer.span("self_check"):
            if prover_self_check(proof, settings):
                return proof

    def _is_oom(e) -> bool:
        return e is not None and (
            "RESOURCE_EXHAUSTED" in repr(e) or "ResourceExhausted" in repr(e)
        )

    if _is_oom(err):
        # Not a correctness failure: the proof doesn't fit this chip's HBM.
        # The natural layout needs MORE memory (tile padding), so skip that
        # rung, keep the (valid) persisted verdicts, and go straight to the
        # host prover.  Multi-chip: shard over a mesh (docs/tpu.md).
        warnings.warn(
            f"device prove ran out of HBM ({err!r}); re-proving on host "
            "numpy (correct, slow).  For this proof size on-device, shard "
            "over a device mesh (parallel/sharding.py -- every resident "
            "divides by the chip count; see docs/tpu.md 'HBM budget').  "
            f"Phases completed before the OOM: {list(timer.phases) or 'none'}."
        )
        accel.record_oom_shape(shape_sig)
        was_enabled = accel.enabled()
        accel.enable(False)
        try:
            proof = _prove_once(pie, settings, config)
        finally:
            if was_enabled:
                accel.enable(True)
        if not prover_self_check(proof, settings):
            raise ProverError("host prove failed its own OODS self-check")
        return proof

    warnings.warn(
        "prove() failed on the device path "
        f"({'exception: ' + repr(err) if err else 'end-of-prove OODS self-check'}): "
        "a device FFT program may have slipped through qualification.  "
        "Purging persisted FFT verdicts and re-proving with every device "
        "FFT forced onto the natural layout."
    )
    accel.distrust_fft_modes()
    accel.force_fft_mode("natural")
    try:
        try:
            proof = _prove_once(pie, settings, config)
            with timer.span("self_check_retry"):
                ok = prover_self_check(proof, settings)
        except Exception as e:
            err, ok = e, False
    finally:
        accel.force_fft_mode(None)
    if ok:
        return proof

    warnings.warn(
        "natural-layout re-prove ALSO failed "
        f"({'exception: ' + repr(err) if err else 'OODS self-check'}); "
        "re-proving entirely on host numpy (correct, slow)."
    )
    was_enabled = accel.enabled()
    accel.enable(False)
    try:
        proof = _prove_once(pie, settings, config)
    finally:
        if was_enabled:
            accel.enable(True)
    if not prover_self_check(proof, settings):
        raise ProverError("host prove failed its own OODS self-check")
    return proof


def _prove_once(pie: LuminairPie, settings, config: Optional[PcsConfig] = None) -> LuminairProof:
    from . import tracing
    from .parallel import accel

    config = config or PcsConfig()
    assert 1 <= config.log_blowup <= 4, "log_blowup_factor must be in 1..4"
    channel = Blake2sChannel()
    timer = tracing.start("prove")

    # ---- claim ----------------------------------------------------------
    tables = {n: t for n, t in pie.trace_tables.items() if t.n_rows > 0}
    if not tables:
        raise EmptyTraceError("no trace tables")
    claim = LuminairClaim({n: t.log_size for n, t in tables.items()})
    claim.mix_into(channel)
    layout = AirLayout(claim, settings)
    # Device execution pays per-shape compile + transfer latency; small
    # proofs are faster end-to-end on host numpy.
    device = accel.offload_rows(1 << claim.max_log_size)
    if device:
        # AOT-compile every program this shape profile needs, in parallel
        # threads (the serial compile-at-first-use wall was ~19 min on the
        # flagship PINN -- parallel/precompile.py).  Idempotent and cheap
        # when the persistent cache is warm.
        from .parallel import precompile

        precompile.warm(layout, claim, config)

    pcs = CommitmentSchemeProver(config, channel)

    # ---- phase 0: preprocessed -----------------------------------------
    with timer.span("phase0_preprocessed"):
        pp_cols = layout.pp.columns()
        if device:
            pp_cols = [accel.device_put(c) for c in pp_cols]
        pp_ids = layout.pp.ids()
        pcs.commit(pp_cols)
        pp_by_id = dict(zip(pp_ids, pp_cols))

    # ---- phase 1: main trace -------------------------------------------
    with timer.span("phase1_main"):
        main_cols: List[np.ndarray] = []
        padded_by_comp: Dict[str, Dict[str, np.ndarray]] = {}
        for c in layout.components:
            padded = tables[c.name].padded_columns(c.MAIN)
            if device:
                padded = {n: accel.device_put(v) for n, v in padded.items()}
            padded_by_comp[c.name] = padded
            main_cols.extend(padded[n] for n in c.MAIN)
        pcs.commit(main_cols)
        # The tree holds its own coeffs/evals; drop the raw column refs so
        # HBM frees as soon as phase 2 consumes them (the flagship PINN sits
        # within ~1 GB of the chip's capacity -- every dead ref matters).
        main_cols = None

    # ---- phase 2: interaction ------------------------------------------
    with timer.span("phase2_interaction"):
        elems = layout.draw_elements(channel)
        inter_cols: List[np.ndarray] = []
        sums: Dict[str, np.ndarray] = {}
        for c in layout.components:
            if device:
                pp_sub = {p: pp_by_id[p] for p in c.PP_IDS}
                cols_q, claimed = accel.witness_interaction(
                    c, padded_by_comp[c.name], pp_sub, elems
                )
            else:
                wev = WitnessEval(padded_by_comp[c.name], pp_by_id)
                c.evaluate(wev, elems)
                cols_q, claimed = wev.build_interaction()
            # (cols_q feeds only this phase; nothing reads it afterwards)
            sums[c.name] = claimed
            for q in cols_q:
                for k in range(4):
                    if isinstance(q, np.ndarray):
                        inter_cols.append(np.ascontiguousarray(q[:, k]))
                    else:
                        inter_cols.append(q[:, k])
            # This component's raw trace uploads have no further reader:
            # free them NOW so the interaction tree's LDE (the phase-2 HBM
            # peak -- 20x2^23 on the b1024 flagship) starts with their
            # headroom reclaimed.
            padded_by_comp[c.name] = None
        # Claimed sums are tiny; stack device-resident ones and download in
        # ONE transfer (the tunneled-TPU link charges ~10 ms latency per
        # download, and there is one sum per component).
        dev_names = [n for n, v in sums.items() if not isinstance(v, np.ndarray)]
        if dev_names:
            import jax.numpy as jnp

            stacked = np.asarray(jnp.stack([sums[n] for n in dev_names]))
            for i, n in enumerate(dev_names):
                sums[n] = stacked[i]
        sums = {n: np.asarray(v, dtype=np.uint32) for n, v in sums.items()}
        interaction_claim = LuminairInteractionClaim(sums)
        interaction_claim.mix_into(channel)
        # Free the remaining phase-2 working sets BEFORE the interaction
        # commit: its LDE + Merkle build is the phase's HBM peak, and
        # nothing downstream reads raw trace columns (phase 3 reads
        # committed evals).
        padded_by_comp = None
        pp_by_id = None
        pcs.commit(inter_cols)
        inter_cols = None

    # ---- phase 3a: composition poly ------------------------------------
    with timer.span("phase3a_composition"):
        alpha = channel.draw_felt()
        B = config.log_blowup
        # Constraints are evaluated pointwise on each component's FULL
        # commit domain (trace_log + B): the committed evals are already
        # there, so no extra FFTs are needed at any blowup.  "Next row"
        # (translation by the trace-domain generator G_n) is a cyclic roll
        # by 2^B on that domain -- G_n = 2^(B+1) * G_{n+B+1}, so adding it
        # shifts the odd-multiple index (2i+1) by 2^(B+1)/2 positions.
        #
        # At blowup 1 the largest components' constraint-eval domain IS the
        # composition commit domain (stride 1): their quotient evaluations
        # sum pointwise into `comp_evals`, skipping the iFFT/FFT round trip
        # entirely.  Smaller components interpolate and land in
        # `comp_coeffs` (strided), evaluated once at the end.  At blowup
        # >= 2 the working domain (max_log + B) is larger than the
        # composition's degree bound (max_log + 1); the accumulated evals
        # are down-committed at the end of the phase.
        comp_log = claim.max_log_size + B  # working domain log
        comp_evals = None  # (2^comp_log, 4) qm31 evals
        comp_coeffs = None  # (4, 2^comp_log) coefficient rows
        acc_pow = qm31.from_ints(1)
        if device:
            import jax.numpy as jnp
        for c in layout.components:
            n = claim.log_sizes[c.name]
            eval_log = n + B
            tree_main = pcs.trees[1]
            tree_pp = pcs.trees[0]
            tree_inter = pcs.trees[2]
            s0, s1 = layout.main_slices[c.name]
            main_evals = {
                name: tree_main.evals[s0 + i] for i, name in enumerate(c.MAIN)
            }
            pp_evals = {
                pid: tree_pp.evals[layout.pp_index(pid)] for pid in list(c.PP_IDS)
            }
            b0, b1 = layout.inter_slices[c.name]
            is_first_evals = tree_pp.evals[layout.pp_index(layout.is_first_id(c.name))]
            claimed = (
                qm31.from_ints(0)
                if c.name not in sums
                else np.asarray(sums[c.name], dtype=np.uint32)
            )
            stride = 1 << (comp_log - eval_log)
            if device:
                inter_evals = [
                    jnp.stack([tree_inter.evals[(b0 + b) * 4 + k] for k in range(4)], axis=-1)
                    for b in range(b1 - b0)
                ]
                q, acc_pow = accel.domain_constraints(
                    c, eval_log, n, main_evals, pp_evals, inter_evals,
                    is_first_evals, claimed, alpha, acc_pow, elems,
                    roll_stride=1 << B,
                )
            else:
                inter_evals = [
                    np.stack([tree_inter.evals[(b0 + b) * 4 + k] for k in range(4)], axis=-1)
                    for b in range(b1 - b0)
                ]
                acc = ConstraintAccumulator(alpha, (1 << eval_log,))
                acc._pow = acc_pow
                dev = DomainEval(
                    main_evals,
                    pp_evals,
                    inter_evals,
                    is_first_evals,
                    claimed,
                    acc,
                    roll_stride=1 << B,
                )
                c.evaluate(dev, elems)
                acc_pow = acc._pow
                # Divide by the vanishing polynomial of the trace domain.
                xs, _ = circle.domain_points(eval_log)
                vinv = m31.inv(circle.coset_vanishing_eval(xs, n, eval_log))
                q = m31.mul(acc.acc, vinv[:, None])
            if stride == 1:
                comp_evals = q if comp_evals is None else m31.add(comp_evals, q)
                continue
            coeffs = (
                accel.ifft_t(q)
                if device
                else fft.ifft(np.ascontiguousarray(q.T.reshape(4, -1)))
            )
            if comp_coeffs is None:
                xp = jnp if device else np
                comp_coeffs = xp.zeros((4, 1 << comp_log), dtype=xp.uint32)
            if device:
                comp_coeffs = comp_coeffs.at[:, ::stride].set(
                    m31.add(comp_coeffs[:, ::stride], coeffs)
                )
            else:
                comp_coeffs[:, ::stride] = m31.add(comp_coeffs[:, ::stride], coeffs)

        if comp_coeffs is not None:
            vals_t = accel.fft_eval(comp_coeffs) if device else fft.fft(comp_coeffs)
            extra = (jnp if device else np).moveaxis(vals_t, 0, -1)
            comp_evals = extra if comp_evals is None else m31.add(comp_evals, extra)
        if B > 1:
            # Down-commit: the composition has degree < 2^(max_log + 1)
            # (constraints are degree <= 2), so its coefficient vector on
            # the working domain is supported on the stride-2^(B-1)
            # positions (the same embedding the strided scatter above and
            # the FRI last layer use).  Extract those and re-evaluate on
            # D_{max_log+1} so the committed column log is composition_log
            # at every blowup -- the verifiers never see the working domain.
            ct = (
                accel.ifft_t(comp_evals)
                if device
                else fft.ifft(np.ascontiguousarray(comp_evals.T.reshape(4, -1)))
            )
            sub = ct[:, :: 1 << (B - 1)]
            if not device:
                sub = np.ascontiguousarray(sub)
            vals_t = accel.fft_eval(sub) if device else fft.fft(sub)
            comp_evals = (jnp if device else np).moveaxis(vals_t, 0, -1)
        if device:
            pcs.commit([comp_evals[:, k] for k in range(4)])
        else:
            pcs.commit([np.ascontiguousarray(comp_evals[:, k]) for k in range(4)])

    # ---- phase 3b: OODS + FRI ------------------------------------------
    with timer.span("phase3b_oods_fri"):
        # Clamp the FRI last-layer bound to what the smallest committed
        # column admits (the bound trades committed fold layers -- each a
        # Merkle tree + transcript round trip -- for last-layer coefficient
        # count; it does not affect soundness).  The effective value ships
        # in the proof's config, which all verifiers parameterize from.
        from dataclasses import replace as _replace

        min_log = min(min(t.commit_logs) for t in pcs.trees)
        max_bound = min_log - 1 - config.log_blowup
        eff = max(0, min(config.fri.log_last_layer_degree_bound, max_bound))
        if eff != config.fri.log_last_layer_degree_bound:
            config = _replace(config, fri=_replace(config.fri, log_last_layer_degree_bound=eff))
            pcs.config = config

        z = circle.point_from_t_qm31(channel.draw_felt())
        sample_points = layout.sample_points(z)
        pcs_proof = pcs.prove_values(sample_points)

    return LuminairProof(
        claim=claim,
        interaction_claim=interaction_claim,
        roots=[t.root for t in pcs.trees],
        pcs_proof=pcs_proof,
        config=config,
    )
