"""Vectorized Blake2s-256, bit-identical to ``hashlib.blake2s``.

Used for Merkle-tree node hashing: millions of independent 1-3 block
messages hashed in parallel.  The compression keeps the 4x4 state matrix
as a (4, 4, ...) array and applies the G mixing function to whole rows
(column step, then diagonal step with static rolls) -- the standard SIMD
formulation.  That makes each round 2 vectorized G applications instead of
8 scalar ones: ~4x smaller XLA graphs and row-wide ops that map directly
onto the TPU VPU.  Pure uint32 ARX; the same source runs under numpy
(host) and jax.numpy (jit).

Fiat-Shamir channel hashing stays on ``hashlib`` (tiny, sequential) --
see channel.py.

Replaces stwo's Blake2sMerkleChannel/Blake2sMerkleHasher as consumed by the
reference at crates/prover/src/prover.rs:44-46 (CommitmentSchemeProver over
Blake2s Merkle trees).
"""

from __future__ import annotations

import numpy as np

IV = np.array(
    [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ],
    dtype=np.uint32,
)

SIGMA = np.array(
    [
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
        [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
        [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
        [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
        [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
        [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
        [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
        [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
        [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
        [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
    ],
    dtype=np.int64,
)


def _xp(a):
    if isinstance(a, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def _rotr(x, n: int):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _g_rows(a, b, c, d, x, y):
    """G applied to whole state rows (shape (4, ...) each)."""
    a = a + b + x
    d = _rotr(d ^ a, 16)
    c = c + d
    b = _rotr(b ^ c, 12)
    a = a + b + y
    d = _rotr(d ^ a, 8)
    c = c + d
    b = _rotr(b ^ c, 7)
    return a, b, c, d


def _roll(xp, arr, shift: int):
    if shift % 4 == 0:
        return arr
    return xp.roll(arr, shift, axis=0)


def _compress(xp, h, block, t: int, last: bool):
    """One Blake2s compression.

    h: (8, ...) uint32; block: (16, ...) uint32; t: byte counter.
    Returns new h.
    """
    batch = h.shape[1:]
    a = h[0:4]
    b = h[4:8]
    c = xp.broadcast_to(xp.asarray(IV[0:4], dtype=xp.uint32).reshape((4,) + (1,) * len(batch)), (4,) + batch)
    d_init = IV[4:8].copy()
    d_init[0] ^= np.uint32(t & 0xFFFFFFFF)
    d_init[1] ^= np.uint32((t >> 32) & 0xFFFFFFFF)
    if last:
        d_init[2] ^= np.uint32(0xFFFFFFFF)
    d = xp.broadcast_to(xp.asarray(d_init, dtype=xp.uint32).reshape((4,) + (1,) * len(batch)), (4,) + batch)

    if xp is np:
        for r in range(10):
            s = SIGMA[r]
            # Column step.
            mx = block[s[[0, 2, 4, 6]]]
            my = block[s[[1, 3, 5, 7]]]
            a, b, c, d = _g_rows(a, b, c, d, mx, my)
            # Diagonal step: rotate rows into diagonal alignment.
            b2, c2, d2 = _roll(xp, b, -1), _roll(xp, c, -2), _roll(xp, d, -3)
            mx = block[s[[8, 10, 12, 14]]]
            my = block[s[[9, 11, 13, 15]]]
            a, b2, c2, d2 = _g_rows(a, b2, c2, d2, mx, my)
            b, c, d = _roll(xp, b2, 1), _roll(xp, c2, 2), _roll(xp, d2, 3)
    else:
        # jnp path: scan over rounds with gathered message schedule -- 10x
        # smaller XLA graphs than unrolling (wide unrolled ARX graphs take
        # minutes to compile, and XLA-CPU can effectively hang on them).
        import jax

        sig = xp.asarray(SIGMA, dtype=xp.int32)
        ix = [xp.asarray(v) for v in ([0, 2, 4, 6], [1, 3, 5, 7], [8, 10, 12, 14], [9, 11, 13, 15])]

        def _round(carry, s):
            a, b, c, d = carry
            a, b, c, d = _g_rows(a, b, c, d, block[s[ix[0]]], block[s[ix[1]]])
            b2, c2, d2 = _roll(xp, b, -1), _roll(xp, c, -2), _roll(xp, d, -3)
            a, b2, c2, d2 = _g_rows(a, b2, c2, d2, block[s[ix[2]]], block[s[ix[3]]])
            b, c, d = _roll(xp, b2, 1), _roll(xp, c2, 2), _roll(xp, d2, 3)
            return (a, b, c, d), None

        (a, b, c, d), _ = jax.lax.scan(_round, (a, b, c, d), sig)

    lo = xp.concatenate([a, b], axis=0)
    hi = xp.concatenate([c, d], axis=0)
    return h ^ lo ^ hi


def hash_words(words):
    """Blake2s-256 of messages given as uint32 word arrays.

    words: (..., L) uint32; the message is the little-endian byte
    serialization (length 4*L bytes).  Returns digests (..., 8) uint32,
    identical to hashlib.blake2s(msg_bytes).digest() read as 8 LE words.
    """
    xp = _xp(words)
    L = words.shape[-1]
    batch = words.shape[:-1]
    byte_len = 4 * L
    n_blocks = max(1, -(-L // 16))

    # Small host batches: hashlib's C implementation beats the vectorized
    # numpy path below ~1k messages (the numpy path costs ~2 ms in fixed
    # per-op overhead regardless of batch size).  Bit-identical by
    # definition -- the vectorized path is tested against hashlib.
    if xp is np:
        n_msgs = int(np.prod(batch)) if batch else 1
        if n_msgs <= 1024:
            import hashlib

            flat = np.ascontiguousarray(words.reshape(-1, L).astype("<u4"))
            out = np.empty((n_msgs, 8), dtype=np.uint32)
            for i in range(n_msgs):
                out[i] = np.frombuffer(
                    hashlib.blake2s(flat[i].tobytes()).digest(), dtype="<u4"
                )
            return out.reshape(batch + (8,))

    # Move word axis first: (L, ...).
    w = xp.moveaxis(words, -1, 0)
    return xp.moveaxis(hash_words_major(w), 0, -1)


def hash_words_major(w):
    """Blake2s-256 with WORD-MAJOR input/output: w is (L, ...) uint32,
    digests return as (8, ...).

    On TPU this is the layout the compression function already works in
    (word rows over a dense batch minor axis).  Row-major (..., L) inputs
    with small L tile-pad catastrophically as XLA temps -- a (n, 1)
    column reshape costs 128x its size -- so hot callers (the Merkle leaf
    builder) assemble (L, n) directly and skip hash_words' moveaxis."""
    xp = _xp(w)
    L = w.shape[0]
    batch = w.shape[1:]
    byte_len = 4 * L
    n_blocks = max(1, -(-L // 16))

    h0 = IV.copy()
    h0[0] ^= np.uint32(0x01010000 ^ 32)
    h = xp.broadcast_to(
        xp.asarray(h0, dtype=xp.uint32).reshape((8,) + (1,) * len(batch)), (8,) + batch
    )
    for blk in range(n_blocks):
        start = blk * 16
        take = min(16, L - start)
        block = w[start : start + take]
        if take < 16:
            block = xp.concatenate(
                [block, xp.zeros((16 - take,) + batch, dtype=xp.uint32)], axis=0
            )
        last = blk == n_blocks - 1
        t = byte_len if last else (blk + 1) * 64
        h = _compress(xp, h, block, t, last)
    return h


def digest_to_bytes(digest_words: np.ndarray) -> bytes:
    """(8,) uint32 -> 32 raw bytes (LE words)."""
    return np.asarray(digest_words, dtype="<u4").tobytes()


def bytes_to_words(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype="<u4").copy()
