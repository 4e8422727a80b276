"""Blake2s Fiat-Shamir channel.

Host-side (hashlib) -- channel traffic is O(#columns + #queries) scalars, so
it never touches the accelerator.  The transcript schedule is this
framework's own spec (documented in docs/PROTOCOL.md); it mirrors the role
of stwo's ``Blake2sChannel`` in the reference prover/verifier
(crates/prover/src/prover.rs:44, crates/verifiers/rust/src/verifier.rs:61-106):
every commitment, claim, and sampled value is mixed before the next draw.

State = 32-byte digest + per-digest draw counter.
  mix(data):   digest = blake2s(digest || data); counter = 0
  draw block:  blake2s(digest || LE64(counter)); counter += 1
Field elements are drawn by rejection-sampling LE32 words w < 2*P
(then reduced mod P), matching stwo's uniformity discipline.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..fields import m31

_P = int(m31.P)


class Blake2sChannel:
    def __init__(self):
        self.digest = b"\x00" * 32
        self._counter = 0

    # -- mixing -----------------------------------------------------------

    def mix_bytes(self, data: bytes):
        self.digest = hashlib.blake2s(self.digest + data).digest()
        self._counter = 0

    def mix_u32s(self, values):
        arr = np.asarray(values, dtype="<u4")
        self.mix_bytes(arr.tobytes())

    def mix_u64(self, value: int):
        self.mix_bytes(int(value).to_bytes(8, "little"))

    def mix_root(self, root_words):
        """Mix a Merkle root given as (8,) uint32 words."""
        self.mix_bytes(np.asarray(root_words, dtype="<u4").tobytes())

    def mix_felts(self, felts):
        """Mix QM31 felts: (..., 4) uint32 array."""
        arr = np.asarray(felts, dtype="<u4").reshape(-1)
        self.mix_bytes(arr.tobytes())

    # -- drawing ----------------------------------------------------------

    def _draw_block(self) -> bytes:
        out = hashlib.blake2s(
            self.digest + self._counter.to_bytes(8, "little")
        ).digest()
        self._counter += 1
        return out

    def draw_base_felts(self, n: int) -> np.ndarray:
        """n uniform M31 elements, rejection-sampled."""
        out = []
        while len(out) < n:
            words = np.frombuffer(self._draw_block(), dtype="<u4")
            for w in words:
                w = int(w)
                if w < 2 * _P:  # reject 0xFFFFFFFE / 0xFFFFFFFF
                    out.append(w % _P)
                    if len(out) == n:
                        break
        return np.array(out, dtype=np.uint32)

    def draw_felt(self) -> np.ndarray:
        """One uniform QM31 element, shape (4,) uint32."""
        return self.draw_base_felts(4)

    def draw_felts(self, n: int) -> np.ndarray:
        return self.draw_base_felts(4 * n).reshape(n, 4)

    def draw_queries(self, n: int, log_domain_size: int) -> np.ndarray:
        """n query positions in [0, 2^log_domain_size), sorted & deduped
        (both sides derive the same sorted-unique set)."""
        mask = (1 << log_domain_size) - 1
        picked = []
        while len(picked) < n:
            words = np.frombuffer(self._draw_block(), dtype="<u4")
            for w in words:
                picked.append(int(w) & mask)
                if len(picked) == n:
                    break
        return np.unique(np.array(picked, dtype=np.int64))

    # -- proof of work ----------------------------------------------------

    def check_pow_nonce(self, bits: int, nonce: int) -> bool:
        h = hashlib.blake2s(self.digest + int(nonce).to_bytes(8, "little")).digest()
        v = int.from_bytes(h[:8], "little")
        return bits == 0 or (v & ((1 << bits) - 1)) == 0

    def grind_pow(self, bits: int) -> int:
        """Smallest nonce whose PoW hash has `bits` low zero bits.

        Expected work is 2^bits hashes; above ~2^8 the batched numpy
        blake2s (crypto/blake2s.py hash_words) grinds chunks of candidates
        at once instead of one hashlib call per nonce -- same first-hit
        nonce, so the transcript is unchanged.  At the 80-bit profile's 16
        PoW bits this is one ~64k-row batch instead of ~65k Python-loop
        hashlib round trips on the critical path."""
        if bits <= 8:
            nonce = 0
            while not self.check_pow_nonce(bits, nonce):
                nonce += 1
            return nonce

        from . import blake2s

        base = np.frombuffer(self.digest, dtype="<u4")
        mask = (1 << bits) - 1
        chunk = max(2048, min(1 << 18, 1 << bits))
        start = 0
        while True:
            nonces = np.arange(start, start + chunk, dtype=np.uint64)
            msgs = np.empty((chunk, 10), dtype=np.uint32)
            msgs[:, :8] = base
            msgs[:, 8] = (nonces & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            msgs[:, 9] = (nonces >> np.uint64(32)).astype(np.uint32)
            out = blake2s.hash_words(msgs)
            if bits <= 32:
                hit = (out[:, 0] & np.uint32(mask)) == 0
            else:
                v = out[:, 0].astype(np.uint64) | (
                    out[:, 1].astype(np.uint64) << np.uint64(32)
                )
                hit = (v & np.uint64(mask)) == 0
            idx = np.nonzero(hit)[0]
            if idx.size:
                return int(start + idx[0])
            start += chunk
