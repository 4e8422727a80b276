"""High-security profile: one full prove/verify at >= 80 conjectured bits.

The default PcsConfig (~20 bits) mirrors the reference's stwo-default
benchmarking posture; this test locks the 80-bit profile end-to-end
(64 queries, 16 PoW bits) so the adversarial configuration stays working.
"""

import numpy as np
import pytest

from luminair_tpu.pcs.config import PcsConfig
from luminair_tpu.prelude import (
    Graph,
    gen_circuit_settings,
    gen_trace,
    prove,
    verify,
)


def test_high_security_profile_end_to_end():
    cfg = PcsConfig.high_security()
    assert cfg.security_bits() >= 80

    cx = Graph()
    rng = np.random.default_rng(9)
    a = cx.tensor((8, 8)).set(rng.normal(size=(8, 8)))
    b = cx.tensor((8, 8)).set(rng.normal(size=(8, 8)))
    (a * b + a).retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)
    proof = prove(pie, settings, cfg)
    assert verify(proof, settings)

    # The 16-bit PoW must actually bind: a wrong nonce is rejected.
    from luminair_tpu.errors import StwoVerifierError

    proof.pcs_proof.pow_nonce += 1
    proof.pcs_proof.fri_proof.pow_nonce = proof.pcs_proof.pow_nonce
    with pytest.raises(StwoVerifierError):
        verify(proof, settings)
