"""Crypto layer: vectorized blake2s vs hashlib, Merkle commit/decommit,
channel determinism."""

import hashlib

import numpy as np

from luminair_tpu.crypto import blake2s, channel, merkle

RNG = np.random.default_rng(7)


class TestBlake2s:
    def _check(self, words):
        got = blake2s.hash_words(words)
        flat = words.reshape(-1, words.shape[-1])
        gflat = got.reshape(-1, 8)
        for i in range(flat.shape[0]):
            expect = hashlib.blake2s(flat[i].astype("<u4").tobytes()).digest()
            assert blake2s.digest_to_bytes(gflat[i]) == expect

    def test_single_block(self):
        self._check(RNG.integers(0, 2**32, size=(5, 16), dtype=np.uint32))

    def test_sub_block(self):
        self._check(RNG.integers(0, 2**32, size=(3, 8), dtype=np.uint32))
        self._check(RNG.integers(0, 2**32, size=(3, 1), dtype=np.uint32))

    def test_multi_block(self):
        self._check(RNG.integers(0, 2**32, size=(2, 17), dtype=np.uint32))
        self._check(RNG.integers(0, 2**32, size=(2, 32), dtype=np.uint32))
        self._check(RNG.integers(0, 2**32, size=(2, 40), dtype=np.uint32))

    def test_batch_shapes(self):
        w = RNG.integers(0, 2**32, size=(4, 3, 18), dtype=np.uint32)
        self._check(w)

    def test_jax_matches(self):
        import jax
        import jax.numpy as jnp

        w = RNG.integers(0, 2**32, size=(6, 20), dtype=np.uint32)
        got = np.asarray(jax.jit(blake2s.hash_words)(jnp.asarray(w)))
        assert np.all(got == blake2s.hash_words(w))


class TestChannel:
    def test_deterministic(self):
        a, b = channel.Blake2sChannel(), channel.Blake2sChannel()
        a.mix_u64(7)
        b.mix_u64(7)
        assert np.all(a.draw_felt() == b.draw_felt())
        assert a.digest == b.digest

    def test_draw_changes_with_mix(self):
        a, b = channel.Blake2sChannel(), channel.Blake2sChannel()
        a.mix_u64(7)
        b.mix_u64(8)
        assert not np.all(a.draw_felt() == b.draw_felt())

    def test_sequential_draws_differ(self):
        c = channel.Blake2sChannel()
        c.mix_u64(1)
        f1, f2 = c.draw_felt(), c.draw_felt()
        assert not np.all(f1 == f2)

    def test_felts_in_field(self):
        c = channel.Blake2sChannel()
        c.mix_bytes(b"seed")
        f = c.draw_felts(100)
        assert np.all(f < np.uint32(2**31 - 1))

    def test_pow(self):
        c = channel.Blake2sChannel()
        c.mix_bytes(b"pow test")
        nonce = c.grind_pow(8)
        assert c.check_pow_nonce(8, nonce)
        assert not c.check_pow_nonce(20, nonce) or True  # may coincide

    def test_queries_sorted_unique(self):
        c = channel.Blake2sChannel()
        c.mix_bytes(b"q")
        q = c.draw_queries(20, 10)
        assert np.all(q[:-1] < q[1:])
        assert np.all(q < 1024)


def _rand_col(log):
    return RNG.integers(0, 2**31 - 1, size=1 << log, dtype=np.uint32)


class TestMerkle:
    def test_commit_verify_single_size(self):
        cols = [_rand_col(6) for _ in range(3)]
        tree = merkle.MerkleTree(cols)
        queries = {6: [1, 5, 17, 63]}
        wit = tree.decommit(queries)
        vals = tree.queried_values(queries)
        ok = merkle.verify_decommitment(tree.root, [6, 6, 6], queries, vals, wit)
        assert ok

    def test_commit_verify_mixed_sizes(self):
        cols = [_rand_col(6), _rand_col(4), _rand_col(6), _rand_col(2)]
        tree = merkle.MerkleTree(cols)
        base = [3, 9, 33]
        queries = {6: base, 4: [p >> 2 for p in base], 2: [p >> 4 for p in base]}
        wit = tree.decommit(queries)
        vals = tree.queried_values(queries)
        ok = merkle.verify_decommitment(tree.root, [6, 4, 6, 2], queries, vals, wit)
        assert ok

    def test_tampered_value_fails(self):
        cols = [_rand_col(5)]
        tree = merkle.MerkleTree(cols)
        queries = {5: [2, 8]}
        wit = tree.decommit(queries)
        vals = tree.queried_values(queries)
        vals[0] = vals[0].copy()
        vals[0][0] ^= 1
        assert not merkle.verify_decommitment(tree.root, [5], queries, vals, wit)

    def test_tampered_witness_fails(self):
        cols = [_rand_col(5), _rand_col(3)]
        tree = merkle.MerkleTree(cols)
        queries = {5: [2], 3: [0]}
        wit = tree.decommit(queries)
        vals = tree.queried_values(queries)
        wit = [w.copy() for w in wit]
        wit[0][0] ^= 1
        assert not merkle.verify_decommitment(tree.root, [5, 3], queries, vals, wit)

    def test_root_differs_on_column_change(self):
        cols = [_rand_col(5)]
        t1 = merkle.MerkleTree(cols)
        cols2 = [cols[0].copy()]
        cols2[0][11] ^= 1
        t2 = merkle.MerkleTree(cols2)
        assert not np.all(t1.root == t2.root)


def test_grind_pow_vectorized_matches_scalar():
    """grind_pow's batched numpy path (bits > 8) must return the SAME
    first-hit nonce as the scalar hashlib loop -- the nonce is mixed into
    the transcript, so any difference would change every later draw."""
    from luminair_tpu.crypto.channel import Blake2sChannel

    for seed, bits in [(1, 9), (7, 12), (99, 14)]:
        ch = Blake2sChannel()
        ch.mix_u64(seed)
        fast = ch.grind_pow(bits)
        ref = 0
        while not ch.check_pow_nonce(bits, ref):
            ref += 1
        assert fast == ref
        assert ch.check_pow_nonce(bits, fast)
