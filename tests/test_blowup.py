"""Blowup >= 2 support (VERDICT round-2 item 5).

The reference's PCS (stwo's PcsConfig, crates/prover/src/prover.rs:36)
supports arbitrary blowup; round 2 hard-asserted log_blowup == 1.  Now
constraints are evaluated pointwise on the full commit domain and the
composition is down-committed to its degree bound, so any blowup in 1..4
round-trips through all three verifiers.  These tests pin:

  * prove/verify round trips at blowup 2 and 3 (Python + native C++);
  * tamper rejection at blowup 2 (the security knob actually binds);
  * the two 80-bit profiles (64q x b1 vs 32q x b2) both verify, with the
    b2 proof smaller (half the openings);
  * config validation bounds shared with the native/JS wire parsers.
"""

import numpy as np
import pytest

from luminair_tpu import native, serde
from luminair_tpu.errors import LuminairError
from luminair_tpu.pcs.config import FriConfig, PcsConfig
from luminair_tpu.prelude import (
    Graph,
    gen_circuit_settings,
    gen_trace,
    prove,
    verify,
)

RNG = np.random.default_rng(37)


def _pie(shape=(8, 8)):
    cx = Graph()
    a = cx.tensor(shape).set(RNG.uniform(0.3, 1.2, shape))
    b = cx.tensor(shape).set(RNG.uniform(0.3, 1.2, shape))
    ((a @ b) * b + a).relu().retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    return gen_trace(cx, settings), settings


def _cfg(blowup, queries=6):
    return PcsConfig(
        pow_bits=1,
        fri=FriConfig(log_blowup_factor=blowup, n_queries=queries,
                      log_last_layer_degree_bound=0),
    )


@pytest.fixture(scope="module")
def pie_settings():
    return _pie()


@pytest.mark.parametrize("blowup", [2, 3])
def test_round_trip(pie_settings, blowup):
    pie, settings = pie_settings
    proof = prove(pie, settings, _cfg(blowup))
    assert proof.config.log_blowup == blowup
    assert verify(proof, settings)


def test_native_parity_blowup2(pie_settings):
    pie, settings = pie_settings
    proof = prove(pie, settings, _cfg(2))
    pb = serde.proof_to_flat_bytes(proof)
    sb = serde.settings_to_flat_bytes(settings)
    native.build()
    assert native.verify_flat(pb, sb)
    # Tampered openings must fail in the native verifier too.
    bad = bytearray(pb)
    bad[len(bad) // 2] ^= 0x01
    with pytest.raises(native.NativeVerifierError):
        native.verify_flat(bytes(bad), sb)


def test_tamper_rejected_at_blowup2():
    pie, settings = _pie((4, 4))
    table = next(n for n, t in pie.trace_tables.items() if t.n_rows)
    col = next(iter(pie.trace_tables[table].columns))
    arr = pie.trace_tables[table].columns[col].copy()
    arr[0] = (int(arr[0]) + 1) % ((1 << 31) - 1)
    pie.trace_tables[table].columns[col] = arr
    try:
        proof = prove(pie, settings, _cfg(2, queries=8))
    except (LuminairError, AssertionError):
        return
    with pytest.raises(LuminairError):
        assert verify(proof, settings)


def test_high_security_profiles(pie_settings):
    pie, settings = pie_settings
    b1 = PcsConfig.high_security()
    b2 = PcsConfig.high_security(log_blowup=2)
    assert b1.security_bits() >= 80 and b2.security_bits() >= 80
    assert b2.fri.n_queries == 32
    p1 = prove(pie, settings, b1)
    p2 = prove(pie, settings, b2)
    assert verify(p1, settings) and verify(p2, settings)
    s1, s2 = (len(serde.proof_to_flat_bytes(p)) for p in (p1, p2))
    assert s2 < s1, f"blowup-2 proof should be smaller: {s2} vs {s1}"


def test_config_validation_bounds():
    with pytest.raises(ValueError):
        FriConfig(log_blowup_factor=0)
    with pytest.raises(ValueError):
        FriConfig(log_blowup_factor=5)
