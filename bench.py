"""End-to-end prover benchmark (driver-run, single real TPU chip).

Measures the full STARK pipeline (gen_trace -> prove, verified once) on the
reference's bench-style graph shape (elementwise mul+add, per
crates/graph/benches/ops.rs) scaled up to N x N, and reports

    trace-cells proven per second (TPU-accelerated path)

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


def build_pie():
    from luminair_tpu.prelude import Graph, gen_circuit_settings, gen_trace

    cx = Graph()
    rng = np.random.default_rng(0)
    a = cx.tensor((N, N)).set(rng.normal(size=(N, N)))
    b = cx.tensor((N, N)).set(rng.normal(size=(N, N)))
    (a * b + a).retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    t0 = time.perf_counter()
    pie = gen_trace(cx, settings)
    trace_s = time.perf_counter() - t0
    cells = sum(
        t.n_rows * len(t.columns) for t in pie.trace_tables.values() if t.n_rows
    )
    return pie, settings, cells, trace_s


def time_prove(pie, settings, accel_on: bool, repeats: int = 1):
    from luminair_tpu import tracing
    from luminair_tpu.parallel import accel
    from luminair_tpu.prover import prove

    accel.enable(accel_on)
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
    pie, settings, cells, trace_s = build_pie()

    # Host numpy baseline.  At large N the host prover takes tens of
    # minutes; LUMINAIR_BENCH_HOST=0 skips it (vs_baseline reported as 0).
    if os.environ.get("LUMINAIR_BENCH_HOST", "1") == "1":
        _, host_s, _ = time_prove(pie, settings, accel_on=False)
    else:
        host_s = 0.0

    # TPU-accelerated path: one warmup (jit compile), then timed.
    time_prove(pie, settings, accel_on=True)
    proof, tpu_s, phases = time_prove(pie, settings, accel_on=True)

    # Correctness gate: the timed proof must verify.
    from luminair_tpu.verifier import verify

    t0 = time.perf_counter()
    verify(proof, settings)
    verify_s = time.perf_counter() - t0

    value = cells / tpu_s
    print(
        json.dumps(
            {
                "metric": f"prove throughput, {N}x{N} mul+add graph ({cells} trace cells), verified",
                "value": round(value, 1),
                "unit": "trace-cells/s/chip",
                "vs_baseline": round(host_s / tpu_s, 3),
                "detail": {
                    "tpu_prove_s": round(tpu_s, 3),
                    "host_prove_s": round(host_s, 3),
                    "gen_trace_s": round(trace_s, 3),
                    "verify_s": round(verify_s, 3),
                    "tpu_phases_s": phases,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
