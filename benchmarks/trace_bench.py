"""Trace-generation throughput benchmark (SURVEY §7.4, VERDICT item 6).

Measures gen_trace (the vectorized interpreter in graph/trace.py) in
trace-cells/second on the two graph shapes the reference's flagship
workloads stress:

  * black-scholes PINN forward (2 -> 64 -> 64 -> 1, Linear + tanh) at a
    given batch -- matmul-heavy, hundreds of nodes after decomposition
    (reference examples/black-schole-nn/src/main.rs:7-148);
  * a single NxN @ NxN matmul -- the worst-case single-node expansion
    (mul of expanded views + sum_reduce over the contraction axis).

Usage:  python benchmarks/trace_bench.py [--batch 1024] [--matmul-n 256]
Prints one JSON line per workload plus a settings-prepass timing.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def cells_of(pie):
    return sum(t.n_rows * len(t.columns) for t in pie.trace_tables.values() if t.n_rows)


def bench(name, build, iters=3):
    from luminair_tpu.prelude import Graph, gen_circuit_settings, gen_trace

    cx = Graph()
    build(cx)
    cx.compile()
    t0 = time.perf_counter()
    settings = gen_circuit_settings(cx)
    settings_s = time.perf_counter() - t0

    best = float("inf")
    pie = None
    for _ in range(iters):
        t0 = time.perf_counter()
        pie = gen_trace(cx, settings)
        best = min(best, time.perf_counter() - t0)
    cells = cells_of(pie)
    print(
        json.dumps(
            {
                "metric": f"gen_trace throughput, {name}",
                "value": round(cells / best, 1),
                "unit": "trace-cells/s",
                "detail": {
                    "cells": cells,
                    "gen_trace_s": round(best, 4),
                    "settings_prepass_s": round(settings_s, 4),
                    "nodes": len(cx.nodes),
                    "max_log_size": pie.metadata.execution_resources.max_log_size,
                },
            }
        )
    )
    return cells / best


def build_black_scholes(batch):
    def build(cx):
        from luminair_tpu.nn import Linear

        rng = np.random.default_rng(0)
        l1 = Linear(2, 64, True, cx)
        l2 = Linear(64, 64, True, cx)
        l3 = Linear(64, 1, True, cx)
        for lin, (fi, fo) in ((l1, (2, 64)), (l2, (64, 64)), (l3, (64, 1))):
            lin.weight.set(rng.normal(scale=fi ** -0.5, size=(fi, fo)))
            if lin.bias is not None:
                lin.bias.set(np.zeros(fo))
        x = cx.tensor((batch, 2)).set(rng.normal(size=(batch, 2)))
        h = l1(x).tanh()
        h = l2(h).tanh()
        l3(h).retrieve()

    return build


def build_matmul(n):
    def build(cx):
        rng = np.random.default_rng(1)
        a = cx.tensor((n, n)).set(rng.normal(size=(n, n)))
        b = cx.tensor((n, n)).set(rng.normal(size=(n, n)))
        a.matmul(b).retrieve()

    return build


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--matmul-n", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    bench(f"black-scholes PINN batch {args.batch}", build_black_scholes(args.batch), args.iters)
    bench(f"matmul {args.matmul_n}x{args.matmul_n}", build_matmul(args.matmul_n), args.iters)


if __name__ == "__main__":
    main()
