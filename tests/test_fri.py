"""FRI prove/verify: honest accept (single & mixed sizes), tamper reject,
degree-bound enforcement."""

import numpy as np
import pytest

from luminair_tpu import fft
from luminair_tpu.fields import qm31
from luminair_tpu.pcs import fri
from luminair_tpu.pcs.config import FriConfig
from luminair_tpu.crypto.channel import Blake2sChannel

RNG = np.random.default_rng(3)
P = 2**31 - 1


def make_low_degree(log_size, log_blowup):
    """QM31 evaluation on D_log_size lying in FFT dim 2^(log-B)."""
    dim = 1 << (log_size - log_blowup)
    coeffs = RNG.integers(0, P, size=(4, dim), dtype=np.uint64).astype(np.uint32)
    full = np.zeros((4, 1 << log_size), dtype=np.uint32)
    full[:, :: 1 << log_blowup] = coeffs
    evals = fft.fft(full)  # (4, N)
    return np.ascontiguousarray(evals.T)  # (N, 4)


def run_roundtrip(inputs, config, tamper=None):
    ch = Blake2sChannel()
    ch.mix_bytes(b"fri test")
    proof, ctx = fri.fri_prove(inputs, config, ch)
    nonce = ch.grind_pow(4)
    ch.mix_u64(nonce)
    kmax = max(inputs)
    positions = ch.draw_queries(config.n_queries, kmax)
    fri.fri_decommit(proof, ctx, positions)

    # Verifier.
    vch = Blake2sChannel()
    vch.mix_bytes(b"fri test")

    def query_eval(circle_log, pos):
        pos = np.asarray(pos, dtype=np.int64)
        v = inputs[circle_log][pos].copy()
        if tamper:
            for (cl, p) in tamper:
                if cl == circle_log:
                    v[pos == p, 0] ^= 3
        return v

    ok = fri.fri_verify(proof, config, vch, query_eval, sorted(inputs, reverse=True), positions)
    if ok:
        assert vch.check_pow_nonce(4, nonce)
        vch.mix_u64(nonce)
        assert np.all(vch.draw_queries(config.n_queries, kmax) == positions)
    return ok, positions


class TestFri:
    def test_single_input_accepts(self):
        cfg = FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=6)
        inputs = {7: make_low_degree(7, 1)}
        ok, _ = run_roundtrip(inputs, cfg)
        assert ok

    def test_mixed_sizes_accept(self):
        cfg = FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=6)
        inputs = {8: make_low_degree(8, 1), 6: make_low_degree(6, 1), 5: make_low_degree(5, 1)}
        ok, _ = run_roundtrip(inputs, cfg)
        assert ok

    def test_larger_last_layer(self):
        cfg = FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=2, n_queries=4)
        inputs = {7: make_low_degree(7, 1), 6: make_low_degree(6, 1)}
        ok, _ = run_roundtrip(inputs, cfg)
        assert ok

    def test_blowup_two(self):
        cfg = FriConfig(log_blowup_factor=2, log_last_layer_degree_bound=0, n_queries=4)
        inputs = {8: make_low_degree(8, 2), 6: make_low_degree(6, 2)}
        ok, _ = run_roundtrip(inputs, cfg)
        assert ok

    def test_tampered_input_rejected(self):
        cfg = FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=8)
        inputs = {7: make_low_degree(7, 1)}
        # First run to learn the query positions, then tamper at one.
        _, positions = run_roundtrip(inputs, cfg)
        tamper = {(7, int(positions[0]))}
        ok, _ = run_roundtrip(inputs, cfg, tamper=tamper)
        assert not ok

    def test_high_degree_input_fails_prover(self):
        cfg = FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=4)
        bad = RNG.integers(0, P, size=(1 << 6, 4), dtype=np.uint64).astype(np.uint32)
        ch = Blake2sChannel()
        with pytest.raises(AssertionError):
            fri.fri_prove({6: bad}, cfg, ch)

    def test_fold_circle_preserves_low_degree(self):
        """Circle fold of an FFT-dim 2^(k-1) function is a line poly of
        dim 2^(k-2): its line iFFT must be stride-2 sparse."""
        from luminair_tpu import circle

        k = 6
        ev = make_low_degree(k, 1)
        alpha = np.array([5, 7, 11, 13], dtype=np.uint32)
        line = fri.fold_circle_to_line(ev, k, alpha)
        tw_inv = circle.ifft_twiddles(k)[1:]
        coeffs = fft.line_ifft_qm31(line, tw_inv)
        assert np.all(coeffs[1::2] == 0)

    def test_fold_line_roundtrip_degree(self):
        from luminair_tpu import circle

        k = 6
        ev = make_low_degree(k, 1)
        alpha = np.array([5, 7, 11, 13], dtype=np.uint32)
        line = fri.fold_circle_to_line(ev, k, alpha)
        tws = circle.ifft_twiddles(k)
        folded = fri.fold_line(line, tws[1], alpha)
        coeffs = fft.line_ifft_qm31(folded, tws[2:])
        assert np.all(coeffs[1::2] == 0)


class TestMultiFoldLayers:
    """folds_per_layer > 1: one committed layer covers several line folds
    (docs/PROTOCOL.md "FRI"), halving roots/witnesses and prover syncs."""

    @pytest.mark.parametrize("folds", [1, 2, 3])
    def test_arities_accept(self, folds):
        cfg = FriConfig(
            log_blowup_factor=1, log_last_layer_degree_bound=0,
            n_queries=6, folds_per_layer=folds,
        )
        inputs = {9: make_low_degree(9, 1), 6: make_low_degree(6, 1)}
        ok, _ = run_roundtrip(inputs, cfg)
        assert ok

    def test_layer_count_divides(self):
        inputs = {9: make_low_degree(9, 1)}
        roots = {}
        for folds in (1, 2):
            cfg = FriConfig(
                log_blowup_factor=1, log_last_layer_degree_bound=0,
                n_queries=4, folds_per_layer=folds,
            )
            ch = Blake2sChannel()
            proof, _ = fri.fri_prove(inputs, cfg, ch)
            roots[folds] = len(proof.layer_roots)
        assert roots[1] == 7  # line 8 -> 1 (last_line_log = blowup + bound)
        assert roots[2] == 4  # ceil(7 / 2)

    @pytest.mark.parametrize("folds", [2, 3])
    def test_tamper_rejected_multifold(self, folds):
        cfg = FriConfig(
            log_blowup_factor=1, log_last_layer_degree_bound=0,
            n_queries=6, folds_per_layer=folds,
        )
        inputs = {8: make_low_degree(8, 1), 6: make_low_degree(6, 1)}
        _, positions = run_roundtrip(inputs, cfg)
        tamper = {(8, int(positions[0]))}
        ok, _ = run_roundtrip(inputs, cfg, tamper=tamper)
        assert not ok

    def test_mid_layer_input_mix(self):
        """An input whose line log lands BETWEEN the two folds of a
        committed layer (9 -> line 8; 8 -> line 7 mixes mid-layer when
        folds_per_layer=2 and the chain starts at 8)."""
        cfg = FriConfig(
            log_blowup_factor=1, log_last_layer_degree_bound=0,
            n_queries=6, folds_per_layer=2,
        )
        inputs = {9: make_low_degree(9, 1), 8: make_low_degree(8, 1),
                  7: make_low_degree(7, 1)}
        ok, _ = run_roundtrip(inputs, cfg)
        assert ok


class TestUntrustedLastLayerBound:
    """ADVICE r2 (high): the last-layer degree bound rides the untrusted
    proof config; fri_replay must reject any bound whose last_line_log
    exceeds min(input_logs) - 1, otherwise the smallest inputs are never
    mixed into the fold chain and their committed columns are unbound."""

    def test_replay_rejects_bound_skipping_smallest_input(self):
        cfg = FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=5, n_queries=6)
        # Inputs at circle logs 9 and 6: last_line_log = 6 > min-1 = 5.
        proof = fri.FriProof(
            layer_roots=[np.zeros(8, dtype=np.uint32)] * 2,
            layer_queried_values=[],
            layer_witnesses=[],
            last_layer_coeffs=np.zeros((32, 4), dtype=np.uint32),
        )
        ch = Blake2sChannel()
        assert fri.fri_replay(proof, cfg, ch, [9, 6]) is None

    def test_replay_accepts_maximal_valid_bound(self):
        cfg = FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=4, n_queries=6)
        # last_line_log = 5 == min-1: valid; the honest prover's clamp
        # produces exactly this edge.
        inputs = {9: make_low_degree(9, 1), 6: make_low_degree(6, 1)}
        ok, _ = run_roundtrip(inputs, cfg)
        assert ok

    def test_config_validation_matches_wire_parsers(self):
        with pytest.raises(ValueError):
            FriConfig(folds_per_layer=0)
        with pytest.raises(ValueError):
            FriConfig(folds_per_layer=9)
        with pytest.raises(ValueError):
            FriConfig(log_last_layer_degree_bound=31)
        from luminair_tpu.pcs.config import PcsConfig

        with pytest.raises(ValueError):
            PcsConfig.from_dict(
                {
                    "pow_bits": 1,
                    "fri": {
                        "log_blowup_factor": 1,
                        "log_last_layer_degree_bound": 0,
                        "n_queries": 4,
                        "folds_per_layer": 0,
                    },
                }
            )
