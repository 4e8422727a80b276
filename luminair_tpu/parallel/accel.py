"""Device acceleration: run the hot prover kernels under jax.jit.

The numeric kernels (fields/, fft.py, crypto/blake2s.py) are written
backend-agnostically over uint32 arrays; this module wraps them in jitted,
shape-cached entry points and manages host<->device movement.  Enable with
``accel.enable()`` (or LUMINAIR_TPU_ACCEL=1); everything falls back to
numpy when JAX is unavailable.

Offloaded today:
  * batched column LDE (iFFT + strided FFT) per size group;
  * Blake2s Merkle layer hashing (the prover's dominant cost at
    2^18+ rows).

Multi-chip sharding of the same kernels lives in parallel/sharding.py.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Dict, List

import numpy as np

_ENABLED = os.environ.get("LUMINAIR_TPU_ACCEL", "0") == "1"


def enable(flag: bool = True):
    global _ENABLED
    _ENABLED = flag


def enabled() -> bool:
    if not _ENABLED:
        return False
    try:
        import jax  # noqa

        return True
    except ImportError:  # pragma: no cover
        return False


@lru_cache(maxsize=None)
def _jit_lde(log_n: int, log_blowup: int, n_cols: int):
    import jax
    import jax.numpy as jnp

    from .. import circle, fft

    tw_inv = [jnp.asarray(t) for t in circle.ifft_twiddles(log_n)]
    tw_big = [jnp.asarray(t) for t in circle.fft_twiddles(log_n + log_blowup)]

    @jax.jit
    def run(cols):
        coeffs = fft.ifft(cols, tw_inv)
        n = cols.shape[-1]
        big = jnp.zeros(cols.shape[:-1] + (n << log_blowup,), dtype=jnp.uint32)
        big = big.at[..., :: 1 << log_blowup].set(coeffs)
        return coeffs, fft.fft(big, tw_big)

    return run


def lde_columns(cols: np.ndarray, log_blowup: int):
    """(C, N) -> (coeffs (C, N), evals (C, N << log_blowup))."""
    if not enabled():
        from .. import fft

        coeffs = fft.ifft(cols)
        return coeffs, fft.extend_coeffs_and_fft(coeffs, log_blowup)
    import jax.numpy as jnp

    log_n = int(cols.shape[-1]).bit_length() - 1
    run = _jit_lde(log_n, log_blowup, cols.shape[0])
    coeffs, evals = run(jnp.asarray(cols))
    return np.asarray(coeffs), np.asarray(evals)


@lru_cache(maxsize=None)
def _jit_hash(n_nodes: int, n_words: int):
    import jax

    from ..crypto import blake2s

    return jax.jit(blake2s.hash_words)


def hash_layer(words: np.ndarray) -> np.ndarray:
    """Batched Blake2s over (n_nodes, n_words) messages."""
    from ..crypto import blake2s

    if not enabled() or words.shape[0] < (1 << 14):
        return blake2s.hash_words(words)
    import jax.numpy as jnp

    run = _jit_hash(words.shape[0], words.shape[1])
    return np.asarray(run(jnp.asarray(words)))
