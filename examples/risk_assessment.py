"""DeFi risk assessment with ZK proofs: VaR / CVaR / max-loss over sorted
loss scenarios using less_than masks, sum_reduce, and recip.

Port of the reference's examples/risk-assessment
(examples/risk-assessment/src/main.rs:47-100), scenario set included.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from luminair_tpu.prelude import *

# 40+ market scenarios: positive = loss %, negative = profit %, sorted
# worst -> best before entering the circuit (as the reference does).
SCENARIO_LOSSES = sorted(
    [
        48.0, 42.5, 39.8, 35.2, 31.7, 28.4, 26.9, 24.3, 22.8, 21.5,
        19.7, 18.2, 17.6, 16.1, 15.4, 14.8, 13.9, 13.2, 12.7, 11.8,
        11.1, 10.4, 9.8, 9.1, 8.6, 7.9, 7.2, 6.8, 6.1, 5.4,
        4.9, 4.2, 3.8, 3.1, 2.6, 1.9, 1.2, 0.8, 0.2, -0.5,
        -1.2, -2.4, -3.8, -5.1,
    ],
    reverse=True,
)


def main():
    losses_list = SCENARIO_LOSSES
    n = len(losses_list)
    confidence = 0.95
    tail = max(1, min(n, math.ceil((1.0 - confidence) * n)))
    var_index = tail - 1

    cx = Graph()
    losses = cx.tensor((n,)).set(losses_list)
    idx = cx.tensor((n,)).set(list(range(n)))
    tail_t = cx.tensor((n,)).set([float(tail)] * n)
    var_t = cx.tensor((n,)).set([float(var_index)] * n)
    zero_t = cx.tensor((n,)).set([0.0] * n)
    one_t = cx.tensor((n,)).set([1.0] * n)

    # CVaR: expected loss in the tail.
    tail_mask = idx < tail_t
    tail_losses_sum = (losses * tail_mask).sum_reduce(0)
    tail_count = tail_mask.sum_reduce(0)
    cvar = (tail_losses_sum * tail_count.recip()).retrieve()

    # VaR: loss at the tail boundary (one-hot via comparison trick).
    var_onehot = (idx < tail_t) - (idx < var_t)
    var_value = (losses * var_onehot).sum_reduce(0).retrieve()

    # Max loss: one-hot at index 0.
    max_onehot = (idx < one_t) - (idx < zero_t)
    max_loss = (losses * max_onehot).sum_reduce(0).retrieve()

    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)

    t0 = time.time()
    proof = prove(pie, settings)
    dt_prove = time.time() - t0
    t0 = time.time()
    assert verify(proof, settings)
    dt_verify = time.time() - t0

    arr = np.array(losses_list)
    expect_cvar = arr[:tail].mean()
    print(f"VaR_{confidence}:  {var_value.data()[0]:.2f}%  (expected {arr[var_index]:.2f})")
    print(f"CVaR:      {cvar.data()[0]:.2f}%  (expected {expect_cvar:.2f})")
    print(f"Max loss:  {max_loss.data()[0]:.2f}%  (expected {arr[0]:.2f})")
    print(f"prove {dt_prove:.2f}s  verify {dt_verify:.2f}s")
    assert abs(var_value.data()[0] - arr[var_index]) < 0.05
    assert abs(cvar.data()[0] - expect_cvar) < 0.1
    assert abs(max_loss.data()[0] - arr[0]) < 0.05


if __name__ == "__main__":
    main()
