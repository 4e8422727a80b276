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


def test_verifier_rejects_config_downgrade():
    """The PCS parameters ride in the proof, so verify() must let callers
    pin them: a proof at the weak default config is rejected when the
    caller demands the 80-bit profile or an exact config match."""
    import numpy as np
    import pytest

    from luminair_tpu.errors import StwoVerifierError
    from luminair_tpu.pcs.config import FriConfig, PcsConfig
    from luminair_tpu.prelude import (
        Graph,
        gen_circuit_settings,
        gen_trace,
        prove,
        verify,
    )

    cx = Graph()
    rng = np.random.default_rng(41)
    a = cx.tensor((4, 4)).set(rng.uniform(0.3, 1.0, (4, 4)))
    b = cx.tensor((4, 4)).set(rng.uniform(0.3, 1.0, (4, 4)))
    (a * b + a).retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)
    weak = PcsConfig(pow_bits=1, fri=FriConfig(n_queries=6,
                                               log_last_layer_degree_bound=0))
    proof = prove(pie, settings, weak)
    assert verify(proof, settings)  # no policy: accepted
    with pytest.raises(StwoVerifierError):
        verify(proof, settings, min_security_bits=80)
    with pytest.raises(StwoVerifierError):
        verify(proof, settings, expected_config=PcsConfig.high_security())
    assert verify(proof, settings, expected_config=weak, min_security_bits=7)
