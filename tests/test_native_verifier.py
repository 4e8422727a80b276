"""Native C++ verifier parity tests.

The native verifier (native/verifier.cpp via luminair_tpu/native.py) must
accept exactly the proofs the Python verifier accepts -- including the
preprocessed-tree recommitment (LUT columns recomputed from settings in
C++) -- and reject tampered artifacts.  Mirrors the role of the reference's
standalone Rust verifier (crates/verifiers/rust/src/verifier.rs).
"""

import os
import subprocess

import numpy as np
import pytest

from luminair_tpu.pcs.config import FriConfig, PcsConfig
from luminair_tpu.prelude import *
from luminair_tpu import native, serde

CFG = PcsConfig(
    pow_bits=1,
    fri=FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=6),
)


@pytest.fixture(scope="module")
def all_ops_proof():
    """One proof covering every component type, incl. LUTs + range check."""
    cx = Graph()
    rng = np.random.default_rng(11)
    a = cx.tensor((3, 4)).set(rng.uniform(0.2, 1.0, (3, 4)))
    b = cx.tensor((3, 4)).set(rng.uniform(0.2, 1.0, (3, 4)))
    out = (
        (a * b + a).sin()
        + b.sqrt().exp2()
        + a.log2().recip()
        + (a < b)
        + (a % b)
        + a.square()
    ).sum_reduce(1).max_reduce(0)
    out.retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)
    proof = prove(pie, settings, CFG)
    assert verify(proof, settings)
    return proof, settings


def test_native_accepts_honest_proof(all_ops_proof):
    proof, settings = all_ops_proof
    assert native.verify(proof, settings)


def test_native_rejects_tampered_proof_bytes(all_ops_proof):
    proof, settings = all_ops_proof
    pb = bytearray(serde.proof_to_flat_bytes(proof))
    sb = serde.settings_to_flat_bytes(settings)
    rng = np.random.default_rng(0)
    for _ in range(8):
        bad = bytearray(pb)
        i = int(rng.integers(64, len(bad)))
        bad[i] ^= 1 << int(rng.integers(0, 8))
        with pytest.raises(native.NativeVerifierError):
            native.verify_flat(bytes(bad), sb)


def test_native_rejects_wrong_settings(all_ops_proof):
    """Different LUT ranges -> preprocessed tree recommit root mismatch."""
    proof, settings = all_ops_proof
    import copy

    from luminair_tpu.air.preprocessed import finalize_lookups

    bad = copy.deepcopy(settings)
    bad.lookups.sin.ranges[0].lo -= 7
    bad.lookups.sin.outputs = None  # regenerate a consistent normative table
    finalize_lookups(bad.lookups)
    with pytest.raises(native.NativeVerifierError) as exc:
        native.verify(proof, bad)
    assert exc.value.code in (2, 3)


def test_native_rejects_inconsistent_settings(all_ops_proof):
    """Ranges disagreeing with the output-table length -> parse error."""
    proof, settings = all_ops_proof
    import copy

    bad = copy.deepcopy(settings)
    bad.lookups.sin.ranges[0].lo -= 7  # value_count != len(outputs)
    with pytest.raises(native.NativeVerifierError) as exc:
        native.verify(proof, bad)
    assert exc.value.code == 1


def test_native_rejects_unbalanced_logup(all_ops_proof):
    proof, settings = all_ops_proof
    import copy

    bad = copy.deepcopy(proof)
    name = next(iter(bad.interaction_claim.sums))
    s = np.array(bad.interaction_claim.sums[name], dtype=np.uint32, copy=True)
    s[0] = (int(s[0]) + 1) % ((1 << 31) - 1)
    bad.interaction_claim.sums[name] = s
    with pytest.raises(native.NativeVerifierError) as exc:
        native.verify(bad, settings)
    assert exc.value.code == 4


def test_cli_roundtrip(all_ops_proof, tmp_path):
    proof, settings = all_ops_proof
    pp = tmp_path / "proof.lmv"
    sp = tmp_path / "settings.lms"
    serde.proof_to_flat_file(proof, str(pp))
    serde.settings_to_flat_file(settings, str(sp))
    cli = native.cli_path()
    r = subprocess.run([cli, str(pp), str(sp)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout
    # Tampered file fails with exit code 1.
    blob = bytearray(pp.read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    pp.write_bytes(bytes(blob))
    r = subprocess.run([cli, str(pp), str(sp)], capture_output=True, text=True)
    assert r.returncode == 1


def test_native_matches_python_acceptance_simple():
    """The simple example graph (mul+add) through both verifiers."""
    cx = Graph()
    a = cx.tensor((2, 2)).set([[1.0, 2.0], [3.0, 4.0]])
    b = cx.tensor((2, 2)).set([[10.0, 20.0], [30.0, 40.0]])
    (a * b + a).retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)
    proof = prove(pie, settings, CFG)
    assert verify(proof, settings)
    assert native.verify(proof, settings)


def test_native_rejects_oversized_last_layer_bound(all_ops_proof):
    """ADVICE r2 (high): log_last_layer rides the untrusted proof; a value
    making last_line_log > min(input_logs) - 1 would let forged proofs skip
    mixing the smallest inputs into FRI.  The verifier must reject it
    structurally (ERR_FRI), before any numeric work."""
    proof, settings = all_ops_proof
    pb = bytearray(serde.proof_to_flat_bytes(proof))
    sb = serde.settings_to_flat_bytes(settings)
    import struct

    # Wire offset 16: magic(4) + version(4) + pow_bits(4) + log_blowup(4).
    pb[16:20] = struct.pack("<I", 10)
    with pytest.raises(native.NativeVerifierError) as exc:
        native.verify_flat(bytes(pb), sb)
    assert exc.value.code == 8
    assert "skips smallest" in str(exc.value)


def test_native_rejects_huge_last_layer_bound_at_parse(all_ops_proof):
    """log_last_layer >= 31 is rejected at parse time (shift-UB guard)."""
    proof, settings = all_ops_proof
    pb = bytearray(serde.proof_to_flat_bytes(proof))
    sb = serde.settings_to_flat_bytes(settings)
    import struct

    pb[16:20] = struct.pack("<I", 40)
    with pytest.raises(native.NativeVerifierError) as exc:
        native.verify_flat(bytes(pb), sb)
    assert exc.value.code == 1
