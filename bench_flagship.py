"""Flagship end-to-end benchmark: the black-scholes PINN proven on the TPU.

The reference's headline example times prove/verify on its 2->64->64->1
PINN (examples/black-schole-nn/src/main.rs:117-137, batch 1).  This bench
proves the same network at LUMINAIR_FLAGSHIP_BATCH inputs (default 1024 --
the TPU-scale shape BASELINE.md's protocol names) end-to-end on one chip:

    device-resident trace generation -> TPU prove -> native C++ verify
    (+ a Python-verifier parity check).

Prints exactly one JSON line, same contract as bench.py.
"""

import json
import os
import sys
import time


def _log(msg):
    print(f"[flagship +{time.perf_counter() - _T0:8.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.perf_counter()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BATCH = int(os.environ.get("LUMINAIR_FLAGSHIP_BATCH", "1024"))


def main():
    from examples.black_scholes_nn import build, load_weights, reference_forward
    from luminair_tpu import native, serde, tracing
    from luminair_tpu.parallel import accel
    from luminair_tpu.prelude import Graph, gen_circuit_settings, gen_trace
    from luminair_tpu.prover import prove
    from luminair_tpu.verifier import verify

    accel.enable(True)
    w = load_weights()
    cx = Graph()
    rng = np.random.default_rng(7)
    xs = np.column_stack(
        [rng.uniform(5.0, 30.0, BATCH), rng.uniform(0.05, 1.0, BATCH)]
    )
    x, out = build(cx, w, batch=BATCH)
    x.set(xs)
    cx.compile()

    t0 = time.perf_counter()
    settings = gen_circuit_settings(cx)
    settings_s = time.perf_counter() - t0
    _log(f"settings done ({settings_s:.1f}s)")

    t0 = time.perf_counter()
    pie = gen_trace(cx, settings)
    trace_s = time.perf_counter() - t0
    cells = sum(
        t.n_rows * len(t.columns) for t in pie.trace_tables.values() if t.n_rows
    )
    _log(f"trace done ({trace_s:.1f}s, {cells} cells)")

    # Warmup (jit compiles, persistently cached), then the timed prove.
    # LUMINAIR_FLAGSHIP_WARMUP=0 skips it -- pointless when the shape is
    # known to heal to the host prover (no compiles to warm).
    if os.environ.get("LUMINAIR_FLAGSHIP_WARMUP", "1") != "0":
        prove(pie, settings)
        _log("warmup prove done")
    t0 = time.perf_counter()
    proof = prove(pie, settings)
    prove_s = time.perf_counter() - t0
    phases = tracing.last_phases("prove")
    _log(f"timed prove done ({prove_s:.1f}s)")

    # Model correctness: fixed-point output close to the float reference.
    got = np.asarray(out.data()).reshape(-1)
    expect = reference_forward(w, xs).reshape(-1)
    max_err = float(np.max(np.abs(got - expect)))
    assert max_err < 0.05, f"fixed-point drift too large: {max_err}"

    # Verification: native C++ is the production verifier; Python asserts
    # cross-implementation parity.
    pb = serde.proof_to_flat_bytes(proof)
    sb = serde.settings_to_flat_bytes(settings)
    native.build()
    t0 = time.perf_counter()
    ok = native.verify_flat(pb, sb)
    verify_native_s = time.perf_counter() - t0
    assert ok, "flagship proof failed native verification"
    _log(f"native verify done ({verify_native_s:.2f}s)")
    if os.environ.get("LUMINAIR_FLAGSHIP_PYVERIFY", "1") != "0":
        t0 = time.perf_counter()
        assert verify(proof, settings), "python/native verifier disagree"
        verify_py_s = time.perf_counter() - t0
    else:
        verify_py_s = None  # null in JSON: skipped (not a timing)

    print(
        json.dumps(
            {
                "metric": f"black-scholes PINN (2-64-64-1, batch {BATCH}) e2e prove, {cells} trace cells, native-verified",
                "value": round(cells / prove_s, 1),
                "unit": "trace-cells/s/chip",
                "vs_baseline": 0.0,
                "detail": {
                    "prove_s": round(prove_s, 3),
                    "gen_trace_s": round(trace_s, 3),
                    "settings_s": round(settings_s, 3),
                    "verify_native_s": round(verify_native_s, 4),
                    "verify_python_s": None if verify_py_s is None else round(verify_py_s, 3),
                    "proof_bytes": len(pb),
                    "model_max_abs_err": round(max_err, 5),
                    "tpu_phases_s": phases,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
