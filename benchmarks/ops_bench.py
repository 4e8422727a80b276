"""Per-op x per-stage benchmark grid.

Mirrors the reference's criterion matrix (crates/graph/benches/ops.rs:62-884):
operators {Add, Mul, Recip, SumReduce, MaxReduce, Sin, Sqrt, Exp2, LessThan,
Rem} x stages {TraceGeneration, Proving, Verification} at 32x32, emitting one
JSON document in the github-action-benchmark "customSmallerIsBetter" shape so
the same CI dashboard tooling works (.github/workflows/benchmark.yml in the
reference).

Usage:
    python benchmarks/ops_bench.py [--size 32] [--iters 3] [--accel]
                                   [--out results.json]
    python benchmarks/ops_bench.py --sizes 32,64,128,256,512,1024 --accel
                                   [--out sweep.json]

--sizes runs the BASELINE.md size sweep (trace sizes 2^10..2^20: an NxN
op table is N^2 rows) and adds a cells/s throughput entry per point.

Without --accel this runs the host numpy prover (deterministic, works
anywhere); with --accel it enables the TPU device engine and adds one
untimed warmup iteration per stage for jit compilation.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

OPS = [
    "Add",
    "Mul",
    "Recip",
    "Square",
    "SumReduce",
    "MaxReduce",
    "Sin",
    "Sqrt",
    "Exp2",
    "LessThan",
    "Rem",
]

STAGES = ["Trace Generation", "Proving", "Verification"]


def build_graph(op: str, n: int):
    from luminair_tpu.prelude import Graph

    rng = np.random.default_rng(hash(op) % (1 << 31))
    cx = Graph()
    shape = (n, n)
    a = cx.tensor(shape).set(rng.uniform(0.2, 1.0, shape))
    if op in ("Add", "Mul", "LessThan", "Rem"):
        b = cx.tensor(shape).set(rng.uniform(0.2, 1.0, shape))
        out = {"Add": a + b, "Mul": a * b, "LessThan": a < b, "Rem": a % b}[op]
    elif op == "Recip":
        out = a.recip()
    elif op == "Square":
        out = a.square()
    elif op == "SumReduce":
        out = a.sum_reduce(1)
    elif op == "MaxReduce":
        out = a.max_reduce(1)
    elif op == "Sin":
        out = a.sin()
    elif op == "Sqrt":
        out = a.sqrt()
    elif op == "Exp2":
        out = a.exp2()
    else:
        raise ValueError(op)
    out.retrieve()
    cx.compile()
    return cx


def bench_op(op: str, n: int, iters: int, warmup: int):
    from luminair_tpu import native, serde
    from luminair_tpu.prelude import (
        gen_circuit_settings,
        gen_trace,
        prove,
        verify,
    )

    cx = build_graph(op, n)
    settings = gen_circuit_settings(cx)

    def timed(fn):
        best = float("inf")
        result = None
        for i in range(warmup + iters):
            t0 = time.perf_counter()
            result = fn()
            dt = time.perf_counter() - t0
            if i >= warmup:
                best = min(best, dt)
        return result, best

    pie, t_trace = timed(lambda: gen_trace(cx, settings))
    proof, t_prove = timed(lambda: prove(pie, settings))
    cells = sum(
        t.n_rows * len(t.columns) for t in pie.trace_tables.values() if t.n_rows
    )
    # The measured verifier is the NATIVE (C++) one -- the production
    # verification path, matching the reference's benched Rust verifier
    # (crates/graph/benches/ops.rs Verification groups).  Serialization is
    # done once outside the timed region, like the reference's.
    pb = serde.proof_to_flat_bytes(proof)
    sb = serde.settings_to_flat_bytes(settings)
    native.build()  # untimed one-time compile
    ok, t_verify = timed(lambda: native.verify_flat(pb, sb))
    assert ok, f"{op}: proof failed native verification"
    assert verify(proof, settings), f"{op}: python/native verifier disagree"
    return {
        "Trace Generation": t_trace,
        "Proving": t_prove,
        "Verification": t_verify,
        "cells": cells,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--sizes", default=None,
                    help="comma list of N for a size sweep (overrides --size)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--accel", action="store_true", help="enable TPU device engine")
    ap.add_argument("--ops", default=",".join(OPS))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.accel:
        from luminair_tpu.parallel import accel

        accel.enable(True)
    warmup = 1 if args.accel else 0

    sizes = (
        [int(x) for x in args.sizes.split(",")] if args.sizes else [args.size]
    )
    entries = []
    for n in sizes:
        for op in args.ops.split(","):
            times = bench_op(op, n, args.iters, warmup)
            for stage in STAGES:
                entries.append(
                    {
                        "name": f"{op} Operator/{stage} ({n}x{n})",
                        "unit": "ms",
                        "value": round(times[stage] * 1e3, 3),
                    }
                )
                print(f"{entries[-1]['name']:>55}: {entries[-1]['value']:10.3f} ms")
            # BASELINE.md size-sweep metric: cells proven per second.
            entries.append(
                {
                    "name": f"{op} Operator/Proving throughput ({n}x{n})",
                    "unit": "cells/s",
                    "value": round(times["cells"] / times["Proving"], 1),
                }
            )
            print(f"{entries[-1]['name']:>55}: {entries[-1]['value']:14.1f} cells/s")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(entries, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
