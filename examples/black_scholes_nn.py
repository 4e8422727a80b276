"""Black-Scholes PINN inference with ZK proof: 2 -> 64 -> 64 -> 1 network
(Linear + tanh), the reference's flagship benchmark graph
(examples/black-schole-nn/src/main.rs:7-148).

Weights are trained by model/train_black_scholes.py (JAX/optax -- the
TPU-native counterpart of the reference's PyTorch pipeline in
examples/black-schole-nn/model/) and stored in model/weights.npz; if
absent, a deterministic random initialization is used so the proving
pipeline still runs end-to-end.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from luminair_tpu.prelude import *
from luminair_tpu.nn import Linear

WEIGHTS_PATH = os.path.join(os.path.dirname(__file__), "model", "weights.npz")


def load_weights():
    if os.path.exists(WEIGHTS_PATH):
        z = np.load(WEIGHTS_PATH)
        return {k: z[k] for k in z.files}
    rng = np.random.default_rng(1234)
    sizes = [(2, 64), (64, 64), (64, 1)]
    w = {}
    for i, (fan_in, fan_out) in enumerate(sizes, start=1):
        w[f"w{i}"] = rng.normal(scale=1.0 / np.sqrt(fan_in), size=(fan_in, fan_out))
        w[f"b{i}"] = np.zeros(fan_out)
    return w


def build(cx: Graph, w, batch: int = 1):
    l1 = Linear(2, 64, True, cx)
    l1.weight.set(w["w1"])
    l1.bias.set(w["b1"])
    l2 = Linear(64, 64, True, cx)
    l2.weight.set(w["w2"])
    l2.bias.set(w["b2"])
    l3 = Linear(64, 1, True, cx)
    l3.weight.set(w["w3"])
    l3.bias.set(w["b3"])

    x = cx.tensor((batch, 2))
    out = l3(l2(l1(x).tanh()).tanh()).retrieve()
    return x, out


def reference_forward(w, x):
    h = np.tanh(x @ w["w1"] + w["b1"])
    h = np.tanh(h @ w["w2"] + w["b2"])
    return h @ w["w3"] + w["b3"]


def main():
    w = load_weights()
    cx = Graph()
    x, out = build(cx, w)
    x.set([[15.0, 0.5]])

    cx.compile()
    t0 = time.time()
    settings = gen_circuit_settings(cx)
    print(f"settings in {time.time()-t0:.2f}s")
    t0 = time.time()
    pie = gen_trace(cx, settings)
    print(f"trace in {time.time()-t0:.2f}s "
          f"({sum(t.n_rows for t in pie.trace_tables.values())} rows)")
    t0 = time.time()
    proof = prove(pie, settings)
    print(f"proof in {time.time()-t0:.2f}s")
    t0 = time.time()
    assert verify(proof, settings)
    print(f"verified in {time.time()-t0:.2f}s")

    got = out.data()[0, 0]
    expect = reference_forward(w, np.array([[15.0, 0.5]]))[0, 0]
    print(f"Predicted option price: {got:.6f} (float reference {expect:.6f})")
    assert abs(got - expect) < 0.05, "fixed-point drift too large"


if __name__ == "__main__":
    main()
