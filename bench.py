"""End-to-end prover benchmark (driver-run, single real TPU chip).

Measures the full STARK pipeline (gen_trace -> prove, verified once) on the
reference's bench-style graph shape (elementwise mul+add, per
crates/graph/benches/ops.rs) scaled up to N x N, and reports

    trace-cells proven per second (TPU-accelerated path)

The TPU path is device-resident end-to-end: trace columns are born in HBM
(graph/device_trace.py) and feed prove() without a host round trip.
Verification is timed on the native C++ verifier (the production path,
matching the reference's benched Rust verifier) with a Python-verifier
parity check.

vs_baseline = speedup over the host numpy prover measured in the same run
(the reference's Rust/criterion baseline cannot run here -- no Rust
toolchain in this image; BASELINE.md documents the self-baseline protocol).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N = int(os.environ.get("LUMINAIR_BENCH_N", "256"))


def build_graph():
    from luminair_tpu.prelude import Graph

    cx = Graph()
    rng = np.random.default_rng(0)
    a = cx.tensor((N, N)).set(rng.normal(size=(N, N)))
    b = cx.tensor((N, N)).set(rng.normal(size=(N, N)))
    (a * b + a).retrieve()
    cx.compile()
    return cx


def build_pie(cx, device: bool):
    from luminair_tpu.prelude import gen_circuit_settings, gen_trace

    settings = gen_circuit_settings(cx, device=device)
    t0 = time.perf_counter()
    pie = gen_trace(cx, settings, device=device)
    trace_s = time.perf_counter() - t0
    cells = sum(
        t.n_rows * len(t.columns) for t in pie.trace_tables.values() if t.n_rows
    )
    return pie, settings, cells, trace_s


def time_prove(pie, settings, repeats: int = 1):
    from luminair_tpu import tracing
    from luminair_tpu.prover import prove

    best = float("inf")
    proof = None
    phases = {}
    for _ in range(repeats):
        t0 = time.perf_counter()
        proof = prove(pie, settings)
        dt = time.perf_counter() - t0
        if dt < best:
            best = dt
            phases = tracing.last_phases("prove")
    return proof, best, phases


def main():
    from luminair_tpu.parallel import accel

    cx = build_graph()

    # Host numpy baseline.  At large N the host prover takes tens of
    # minutes; LUMINAIR_BENCH_HOST=0 skips it (vs_baseline reported as 0).
    accel.enable(False)
    host_pie, settings, cells, host_trace_s = build_pie(cx, device=False)
    if os.environ.get("LUMINAIR_BENCH_HOST", "1") == "1":
        _, host_s, _ = time_prove(host_pie, settings)
    else:
        host_s = 0.0

    # TPU-accelerated path: trace columns born in HBM, one warmup
    # (jit compile), then timed.
    accel.enable(True)
    pie, settings, cells_d, trace_s = build_pie(cx, device=True)
    assert cells_d == cells
    time_prove(pie, settings)
    pie, settings, _, trace_s = build_pie(cx, device=True)  # timed re-gen
    # Best-of-3: the tunneled chip's dispatch latency jitters ~±0.1 s
    # run-to-run (docs/benchmarks.md methodology: best-of-N per stage).
    proof, tpu_s, phases = time_prove(pie, settings, repeats=3)

    # Correctness gate + verification timing: the native C++ verifier is
    # the production verifier (reference benches its Rust verifier); the
    # Python verifier run asserts cross-implementation parity.
    from luminair_tpu import native, serde
    from luminair_tpu.verifier import verify

    pb = serde.proof_to_flat_bytes(proof)
    sb = serde.settings_to_flat_bytes(settings)
    native.build()  # one-time compile, untimed
    t0 = time.perf_counter()
    ok = native.verify_flat(pb, sb)
    verify_native_s = time.perf_counter() - t0
    assert ok, "proof failed native verification"
    t0 = time.perf_counter()
    assert verify(proof, settings), "python/native verifier disagree"
    verify_py_s = time.perf_counter() - t0

    value = cells / tpu_s
    print(
        json.dumps(
            {
                "metric": f"prove throughput, {N}x{N} mul+add graph ({cells} trace cells), verified",
                "value": round(value, 1),
                "unit": "trace-cells/s/chip",
                "vs_baseline": round(host_s / tpu_s, 3),
                "detail": {
                    # vs_baseline is the TPU/host-numpy ratio of THIS repo's
                    # own prover (no Rust toolchain in this image to run the
                    # reference's criterion suite -- BASELINE.md "Status of
                    # the external anchor").
                    "vs_baseline_kind": "self_host_numpy",
                    "tpu_prove_s": round(tpu_s, 3),
                    "host_prove_s": round(host_s, 3),
                    "gen_trace_device_s": round(trace_s, 3),
                    "gen_trace_host_s": round(host_trace_s, 3),
                    "verify_native_s": round(verify_native_s, 4),
                    "verify_python_s": round(verify_py_s, 3),
                    "tpu_phases_s": phases,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
