"""Train the Black-Scholes PINN (2 -> 64 -> 64 -> 1, tanh) in JAX/optax and
save weights for the ZK inference example.

TPU-native counterpart of the reference's PyTorch training pipeline
(examples/black-schole-nn/model/*.py): supervises on the closed-form
Black-Scholes call price over a (S, t) grid.

    python examples/model/train_black_scholes.py
"""

import os
import sys

import numpy as np

try:
    import jax
    import jax.numpy as jnp
    import optax
except ImportError:  # pragma: no cover
    print("jax/optax unavailable; cannot train")
    sys.exit(1)

K = 20.0  # strike
R = 0.05  # risk-free rate
SIGMA = 0.45  # volatility
T_MAX = 1.0

OUT = os.path.join(os.path.dirname(__file__), "weights.npz")


def bs_call_price(S, t):
    """Closed-form Black-Scholes call price; t = time to expiry."""
    from scipy.stats import norm  # available via scipy in the image?  fall back below

    tau = np.maximum(t, 1e-6)
    d1 = (np.log(S / K) + (R + 0.5 * SIGMA**2) * tau) / (SIGMA * np.sqrt(tau))
    d2 = d1 - SIGMA * np.sqrt(tau)
    return S * norm.cdf(d1) - K * np.exp(-R * tau) * norm.cdf(d2)


def _norm_cdf(x):
    from math import erf, sqrt

    v = np.vectorize(lambda u: 0.5 * (1.0 + erf(u / sqrt(2.0))))
    return v(x)


def bs_call_price_noscipy(S, t):
    tau = np.maximum(t, 1e-6)
    d1 = (np.log(S / K) + (R + 0.5 * SIGMA**2) * tau) / (SIGMA * np.sqrt(tau))
    d2 = d1 - SIGMA * np.sqrt(tau)
    return S * _norm_cdf(d1) - K * np.exp(-R * tau) * _norm_cdf(d2)


def main():
    rng = np.random.default_rng(7)
    n = 4096
    S = rng.uniform(1.0, 40.0, size=n)
    t = rng.uniform(0.01, T_MAX, size=n)
    try:
        y = bs_call_price(S, t)
    except ImportError:
        y = bs_call_price_noscipy(S, t)
    X = np.stack([S, t], axis=1).astype(np.float32)
    Y = y.reshape(-1, 1).astype(np.float32)

    key = jax.random.PRNGKey(0)
    sizes = [(2, 64), (64, 64), (64, 1)]
    params = {}
    for i, (fi, fo) in enumerate(sizes, start=1):
        key, k = jax.random.split(key)
        params[f"w{i}"] = jax.random.normal(k, (fi, fo)) / jnp.sqrt(fi)
        params[f"b{i}"] = jnp.zeros(fo)

    def forward(p, x):
        h = jnp.tanh(x @ p["w1"] + p["b1"])
        h = jnp.tanh(h @ p["w2"] + p["b2"])
        return h @ p["w3"] + p["b3"]

    def loss(p, x, y):
        return jnp.mean((forward(p, x) - y) ** 2)

    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s, x, y):
        l, g = jax.value_and_grad(loss)(p, x, y)
        upd, s = opt.update(g, s)
        return optax.apply_updates(p, upd), s, l

    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    for i in range(3000):
        params, state, l = step(params, state, Xj, Yj)
        if i % 500 == 0:
            print(f"step {i}: loss {float(l):.5f}")

    np.savez(OUT, **{k: np.asarray(v, dtype=np.float64) for k, v in params.items()})
    print(f"saved {OUT}")


if __name__ == "__main__":
    main()
