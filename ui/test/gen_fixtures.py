"""Generate web-verifier test fixtures from the Python prover.

Writes proof/settings pairs in the flat wire format (`.lmv` / `.lms`) plus
expected-result metadata, so the node test harness (verify.test.mjs) can
check the JS verifier end-to-end against real proofs.  Run from the repo
root:

    python ui/test/gen_fixtures.py

Fixtures (committed to the repo so CI needs no Python):
  simple.{lmv,lms}    mul+add graph (examples/simple.py shape)
  simple_f1.lmv       same graph proven with folds_per_layer=1 (covers the
                      single-fold FRI path of the wire/verifier)
  simple_b2.lmv       same graph proven at log_blowup_factor=2 (covers the
                      blowup>=2 LDE/FRI path of the wire/verifier)
  all_ops.{lmv,lms}   every component incl. sin/exp2/log2 LUTs + range check
  tampered.lmv        simple.lmv with one flipped trace byte (must fail)
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from luminair_tpu.pcs.config import FriConfig, PcsConfig  # noqa: E402
from luminair_tpu.prelude import *  # noqa: E402,F403
from luminair_tpu import serde  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

CFG = PcsConfig(
    pow_bits=1,
    fri=FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=6),
)


def prove_graph(build):
    cx = Graph()  # noqa: F405
    build(cx)
    cx.compile()
    settings = gen_circuit_settings(cx)  # noqa: F405
    pie = gen_trace(cx, settings)  # noqa: F405
    proof = prove(pie, settings, config=CFG)  # noqa: F405
    assert verify(proof, settings)  # noqa: F405
    return proof, settings, cx


def build_simple(cx):
    a = cx.tensor((2, 2)).set([[1.0, 2.0], [3.0, 4.0]])
    b = cx.tensor((2, 2)).set([[10.0, 20.0], [30.0, 40.0]])
    (a * b + a).retrieve()


def build_all_ops(cx):
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
    )
    out.sum_reduce(1).max_reduce(0).retrieve()


def main():
    os.makedirs(OUT, exist_ok=True)
    manifest = {}
    for name, build in [("simple", build_simple), ("all_ops", build_all_ops)]:
        proof, settings, cx = prove_graph(build)
        with open(os.path.join(OUT, f"{name}.dot"), "w") as f:
            f.write(cx.graph_viz())
        if name == "simple":
            # Single-fold FRI variant: exercises the folds_per_layer=1 path.
            cfg1 = PcsConfig(
                pow_bits=1,
                fri=FriConfig(
                    log_blowup_factor=1, log_last_layer_degree_bound=0,
                    n_queries=6, folds_per_layer=1,
                ),
            )
            cx1 = Graph()  # noqa: F405
            build_simple(cx1)
            cx1.compile()
            st1 = gen_circuit_settings(cx1)  # noqa: F405
            p1 = prove(gen_trace(cx1, st1), st1, config=cfg1)  # noqa: F405
            assert verify(p1, st1)  # noqa: F405
            with open(os.path.join(OUT, "simple_f1.lmv"), "wb") as f:
                f.write(serde.proof_to_flat_bytes(p1))
            manifest["simple_f1"] = {
                "proof": "simple_f1.lmv",
                "settings": "simple.lms",
                "expect": "success",
            }
            # Blowup-2 variant: exercises the log_blowup_factor>=2 path.
            cfg2 = PcsConfig(
                pow_bits=1,
                fri=FriConfig(
                    log_blowup_factor=2, log_last_layer_degree_bound=0,
                    n_queries=3,
                ),
            )
            cx2 = Graph()  # noqa: F405
            build_simple(cx2)
            cx2.compile()
            st2 = gen_circuit_settings(cx2)  # noqa: F405
            p2 = prove(gen_trace(cx2, st2), st2, config=cfg2)  # noqa: F405
            assert verify(p2, st2)  # noqa: F405
            with open(os.path.join(OUT, "simple_b2.lmv"), "wb") as f:
                f.write(serde.proof_to_flat_bytes(p2))
            manifest["simple_b2"] = {
                "proof": "simple_b2.lmv",
                "settings": "simple.lms",
                "expect": "success",
            }
        pbytes = serde.proof_to_flat_bytes(proof)
        sbytes = serde.settings_to_flat_bytes(settings)
        with open(os.path.join(OUT, f"{name}.lmv"), "wb") as f:
            f.write(pbytes)
        with open(os.path.join(OUT, f"{name}.lms"), "wb") as f:
            f.write(sbytes)
        manifest[name] = {
            "proof": f"{name}.lmv",
            "settings": f"{name}.lms",
            "expect": "success",
            "proof_bytes": len(pbytes),
        }
        if name == "simple":
            # Flip one byte deep in the proof body (opened trace values) so
            # parsing still succeeds but a Merkle decommitment must fail.
            tampered = bytearray(pbytes)
            tampered[len(tampered) // 2] ^= 0x01
            with open(os.path.join(OUT, "tampered.lmv"), "wb") as f:
                f.write(bytes(tampered))
            manifest["tampered"] = {
                "proof": "tampered.lmv",
                "settings": "simple.lms",
                "expect": "failure",
            }
    # Wide-range exp2: LUT outputs reach 2^57, where libm/JS-Math last-ulp
    # divergence used to flip fixed-point table entries.  Settings wire v2
    # ships the normative output table, so the JS verifier must accept this
    # without recomputing transcendentals (round-3 VERDICT weak #1 repro).
    def build_wide_exp2(cx):
        a = cx.tensor((2, 2)).set([[-40.0, -3.5], [12.25, 45.0]])
        a.exp2().retrieve()

    proof, settings, _ = prove_graph(build_wide_exp2)
    sbytes = serde.settings_to_flat_bytes(settings)
    assert int.from_bytes(sbytes[4:8], "little") == 2, "expected settings wire v2"
    with open(os.path.join(OUT, "wide_exp2.lmv"), "wb") as f:
        f.write(serde.proof_to_flat_bytes(proof))
    with open(os.path.join(OUT, "wide_exp2.lms"), "wb") as f:
        f.write(sbytes)
    manifest["wide_exp2"] = {
        "proof": "wide_exp2.lmv",
        "settings": "wide_exp2.lms",
        "expect": "success",
    }
    # Same settings with one table entry bent beyond tolerance: verifiers
    # must reject with LUT_TABLE before recommitting anything.
    import copy as _copy

    bad = _copy.deepcopy(settings)
    outs = np.array(bad.lookups.exp2.outputs, copy=True)
    outs[len(outs) // 2] += 1 << 20
    bad.lookups.exp2.outputs = outs
    with open(os.path.join(OUT, "wide_exp2_badlut.lms"), "wb") as f:
        f.write(serde.settings_to_flat_bytes(bad))
    manifest["wide_exp2_badlut"] = {
        "proof": "wide_exp2.lmv",
        "settings": "wide_exp2_badlut.lms",
        "expect": "failure",
    }
    with open(os.path.join(OUT, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"wrote fixtures to {OUT}: {sorted(manifest)}")


if __name__ == "__main__":
    main()
