"""Mixed-size column Merkle commitments (Blake2s), vectorized.

One tree commits many columns of different power-of-two lengths (the per-
component trace columns all live in one tree, exactly like stwo's
``CommitmentSchemeProver`` tree in the reference prover).  Structure:

  layer L (bottom, L = max column log): node[i] = H(cols_at_L[.., i])
  layer l < L:  node[i] = H(child0 || child1 || cols_at_l[.., i])
  root = layer 0, single digest (8 uint32 words).

Layer hashing is one batched ``blake2s.hash_words`` call over 2^l nodes --
the whole tree build is ~2 vector ops per layer, which is the TPU-friendly
formulation of the reference's rayon-parallel Merkle leaf hashing.

Decommitment invariant: query positions for every column log are the
projections (right-shifts) of one global bottom-layer query set, so the
witness is sibling hashes only, in deterministic (layer desc, position asc)
order.  The PCS (pcs/) guarantees this invariant.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from . import blake2s


class MerkleTree:
    def __init__(self, columns):
        """columns: list of uint32 arrays with power-of-two lengths."""
        assert columns, "empty tree"
        self.columns = [np.asarray(c, dtype=np.uint32) for c in columns]
        self.cols_by_log = defaultdict(list)
        for c in self.columns:
            log = int(len(c)).bit_length() - 1
            assert 1 << log == len(c)
            self.cols_by_log[log].append(c)
        self.max_log = max(self.cols_by_log)
        self.layers = {}  # log -> (2^log, 8) digest array
        self._build()

    def _build(self):
        prev = None
        for log in range(self.max_log, -1, -1):
            n = 1 << log
            parts = []
            if prev is not None:
                parts.append(prev.reshape(n, 16))
            for c in self.cols_by_log.get(log, []):
                parts.append(c.reshape(n, 1))
            words = np.concatenate(parts, axis=1)
            prev = blake2s.hash_words(words)
            self.layers[log] = prev

    @property
    def root(self) -> np.ndarray:
        return self.layers[0][0]

    def decommit(self, queries_per_log: dict):
        """queries_per_log: {column_log: sorted positions}; positions for
        smaller logs must be projections of the largest.  Returns the list
        of sibling digests (each (8,) uint32) in deterministic order."""
        witness = []
        bottom = self.max_log
        s = sorted(set(int(p) for p in queries_per_log.get(bottom, [])))
        # Sanity: every queried layer must be a projection of the bottom set.
        for log, pos in queries_per_log.items():
            shift = bottom - log
            assert set(int(p) for p in pos) <= {p >> shift for p in s} or not s, (
                "query positions must be projections of the bottom query set"
            )
        for log in range(bottom, 0, -1):
            parents = sorted({p >> 1 for p in s})
            known = set(s)
            layer = self.layers[log]
            for par in parents:
                for child in (2 * par, 2 * par + 1):
                    if child not in known:
                        witness.append(layer[child])
            s = parents
        return witness

    def queried_values(self, queries_per_log: dict):
        """Column values at the queried positions, column order == insertion
        order within each log, logs descending (bottom first)."""
        out = []
        for log in sorted(self.cols_by_log, reverse=True):
            pos = np.asarray(
                sorted(set(int(p) for p in queries_per_log.get(log, []))), dtype=np.int64
            )
            for c in self.cols_by_log[log]:
                out.append(c[pos])
        return out


def verify_decommitment(
    root, column_logs, queries_per_log: dict, queried_values, witness
) -> bool:
    """Recompute the root from queried column values + sibling witness.

    column_logs: list of logs in the tree's column insertion order (defines
    the layer layout identically to the prover).
    queried_values: list of value arrays in the same order as
    MerkleTree.queried_values.
    """
    cols_count = defaultdict(int)
    for log in column_logs:
        cols_count[log] += 1
    bottom = max(cols_count)

    # Split queried_values back into per-log groups.
    values_iter = iter(queried_values)
    values_by_log = {}
    for log in sorted(cols_count, reverse=True):
        values_by_log[log] = [np.asarray(next(values_iter), dtype=np.uint32) for _ in range(cols_count[log])]

    witness_iter = iter(witness)
    s = sorted(set(int(p) for p in queries_per_log.get(bottom, [])))
    node_hashes = {}
    # Bottom layer.
    if s:
        vals = values_by_log.get(bottom, [])
        words = np.stack([v for v in vals], axis=1) if vals else np.zeros((len(s), 0), np.uint32)
        digs = blake2s.hash_words(words)
        node_hashes = {p: digs[i] for i, p in enumerate(s)}
    for log in range(bottom, 0, -1):
        parents = sorted({p >> 1 for p in s})
        known = set(s)
        parent_hashes = {}
        new_log = log - 1
        pos_at_new = sorted(set(int(p) for p in queries_per_log.get(new_log, [])))
        if pos_at_new and set(pos_at_new) != set(parents):
            return False  # projection invariant violated
        vals_at_new = values_by_log.get(new_log, [])
        for idx, par in enumerate(parents):
            parts = []
            for child in (2 * par, 2 * par + 1):
                if child in known:
                    parts.append(np.asarray(node_hashes[child]))
                else:
                    try:
                        parts.append(np.asarray(next(witness_iter)))
                    except StopIteration:
                        return False
            for v in vals_at_new:
                parts.append(np.asarray([v[idx]], dtype=np.uint32))
            words = np.concatenate(parts)
            parent_hashes[par] = blake2s.hash_words(words)
        node_hashes = parent_hashes
        s = parents
    if list(node_hashes) != [0]:
        return False
    return bool(np.all(node_hashes[0] == np.asarray(root)))
