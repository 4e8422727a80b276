"""Mixed-size column Merkle commitments (Blake2s), vectorized.

One tree commits many columns of different power-of-two lengths (the per-
component trace columns all live in one tree, exactly like stwo's
``CommitmentSchemeProver`` tree in the reference prover).  Structure:

  layer L (bottom, L = max column log): node[i] = H(cols_at_L[.., i])
  layer l < L:  node[i] = H(child0 || child1 || cols_at_l[.., i])
  root = layer 0, single digest (8 uint32 words).

Layer hashing is one batched ``blake2s.hash_words`` call over 2^l nodes --
the whole tree build is ~2 vector ops per layer.  When the engine is
enabled (parallel/accel.py) and the inputs are device arrays, the ENTIRE
tree builds in one jit call and the layers stay device-resident: only the
root (32 bytes) and the queried openings (batched gathers) are ever
downloaded -- the tunneled-TPU download path is ~18 MB/s, so layer
round-trips would dominate the prover otherwise.

Decommitment supports an arbitrary query set per layer (the circle-FRI fold
chain in natural row order needs positions that are *not* projections of
the bottom queries).  Both sides deterministically derive, per layer, the
set of nodes the verifier recomputes:

  computed[bottom] = queries[bottom]
  computed[l]      = parents(computed[l+1])  |  queries[l]

The witness is the child digests the verifier lacks, in (layer desc,
position asc, child asc) order; opened column values are provided at every
computed position of their layer.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from . import blake2s


def computed_positions(column_logs, queries_per_log):
    """Per-layer recomputed-node positions, {log: sorted list}."""
    bottom = max(column_logs)
    out = {}
    s = sorted({int(p) for p in queries_per_log.get(bottom, [])})
    out[bottom] = s
    for log in range(bottom - 1, -1, -1):
        s = sorted({p >> 1 for p in s} | {int(p) for p in queries_per_log.get(log, [])})
        out[log] = s
    return out


def _is_device(a) -> bool:
    return not isinstance(a, np.ndarray)


class MerkleTree:
    def __init__(self, columns, force_device: bool = False):
        """columns: list of uint32 arrays with power-of-two lengths (host
        numpy or device arrays -- device inputs build and stay on device).

        force_device: build on device regardless of the offload-row
        threshold (used by the FRI fold chain, whose layers are already
        device-resident -- downloading them to hash on host costs more
        than the dispatch)."""
        assert columns, "empty tree"
        self._force_device = force_device
        self._root = None
        self.columns = list(columns)
        self.cols_by_log = defaultdict(list)
        for c in self.columns:
            log = int(c.shape[0]).bit_length() - 1
            assert 1 << log == c.shape[0]
            self.cols_by_log[log].append(c)
        self.max_log = max(self.cols_by_log)
        self.layers = {}  # log -> (2^log, 8) digest array
        self._build()

    @classmethod
    def from_layers_2d(cls, layers, evals2d):
        """Wrap an already-built single-log 4-column tree (layers hashed
        inside a fused jit program, e.g. the device FRI commit chain)
        without rebuilding, its values living in ONE (N, 4) device array.
        Splitting into per-column slices would cost 4 eager device
        dispatches per layer (~0.2 s across a chain on the tunneled chip);
        instead the opening gather reads the 2-D array directly and the
        split happens on host after the download."""
        self = cls.__new__(cls)
        self._force_device = True
        self._root = None
        self.columns = None
        self._evals2d = evals2d
        log = int(evals2d.shape[0]).bit_length() - 1
        assert 1 << log == evals2d.shape[0] and evals2d.shape[1] == 4
        self.cols_by_log = defaultdict(list)
        self.max_log = log
        self.layers = dict(layers)
        return self

    def _build(self):
        from ..parallel import accel

        if accel.enabled() and any(_is_device(c) for c in self.columns):
            if self._force_device or accel.offload_rows(1 << self.max_log):
                self.layers = accel.merkle_layers(dict(self.cols_by_log))
                return
            # Small tree with device inputs: pull to host (cheap) and build
            # with numpy -- avoids per-shape eager compiles on device.
            self.columns = [np.asarray(c, dtype=np.uint32) for c in self.columns]
            self.cols_by_log = defaultdict(list)
            for c in self.columns:
                self.cols_by_log[int(c.shape[0]).bit_length() - 1].append(c)
        prev = None
        for log in range(self.max_log, -1, -1):
            n = 1 << log
            parts = []
            if prev is not None:
                parts.append(prev.reshape(n, 16))
            for c in self.cols_by_log.get(log, []):
                parts.append(np.asarray(c, dtype=np.uint32).reshape(n, 1))
            words = np.concatenate(parts, axis=1)
            prev = blake2s.hash_words(words)
            self.layers[log] = prev

    @property
    def root(self) -> np.ndarray:
        # Cached: the first access blocks on the device queue (a sync point
        # costs a full tunnel RTT); later accesses are free.
        if self._root is None:
            self._root = np.asarray(self.layers[0][0])
        return self._root

    def decommit_plan(self, queries_per_log: dict):
        """Plan the witness gathers: returns (device_specs, assemble) where
        assemble(gathered_results) -> witness digest list.  Device gathers
        are deferred so callers can fuse MANY trees into one
        ``accel.gather_many`` dispatch (one download for the whole opening
        phase instead of one per layer per tree)."""
        bottom = self.max_log
        comp = computed_positions([bottom] + [0], queries_per_log)
        s = set(comp[bottom])
        order = []  # ("spec", result_index) | ("host", gathered array)
        specs = []
        for log in range(bottom, 0, -1):
            layer = self.layers[log]
            nxt = comp[log - 1]
            idx = [
                child
                for par in nxt
                for child in (2 * par, 2 * par + 1)
                if child not in s
            ]
            if idx:
                if _is_device(layer):
                    order.append(("spec", len(specs)))
                    specs.append((layer, idx, 0))
                else:
                    order.append(("host", layer[np.asarray(idx, dtype=np.int64)]))
            s = set(nxt)

        def assemble(results):
            witness = []
            for kind, v in order:
                witness.extend(results[v] if kind == "spec" else v)
            return witness

        return specs, assemble

    def decommit(self, queries_per_log: dict):
        """Sibling digests needed to recompute the root from the queried
        positions, in deterministic order."""
        from ..parallel import accel

        specs, assemble = self.decommit_plan(queries_per_log)
        return assemble(accel.gather_many(specs))

    def queried_values_plan(self, queries_per_log: dict):
        """Plan the opened-value gathers (same deferred-spec contract as
        decommit_plan); column order == insertion order within each log,
        logs descending."""
        comp = computed_positions([self.max_log] + [0], queries_per_log)
        if getattr(self, "_evals2d", None) is not None:
            pos = comp[self.max_log]
            specs = [(self._evals2d, pos, 0)]

            def assemble2d(results):
                block = np.asarray(results[0], dtype=np.uint32)
                return [np.ascontiguousarray(block[:, j]) for j in range(4)]

            return specs, assemble2d
        order = []
        specs = []
        for log in sorted(self.cols_by_log, reverse=True):
            pos = comp[log]
            for c in self.cols_by_log[log]:
                if _is_device(c):
                    order.append(("spec", len(specs)))
                    specs.append((c, pos, 0))
                else:
                    order.append(
                        ("host", np.asarray(c)[np.asarray(pos, dtype=np.int64)])
                    )

        def assemble(results):
            return [results[v] if kind == "spec" else v for kind, v in order]

        return specs, assemble

    def queried_values(self, queries_per_log: dict):
        """Column values at every computed position of their layer."""
        from ..parallel import accel

        specs, assemble = self.queried_values_plan(queries_per_log)
        return assemble(accel.gather_many(specs))


def verify_decommitment(
    root, column_logs, queries_per_log: dict, queried_values, witness
) -> bool:
    """Recompute the root from queried column values + sibling witness."""
    cols_count = defaultdict(int)
    for log in column_logs:
        cols_count[log] += 1
    bottom = max(cols_count)
    comp = computed_positions([bottom] + [0], queries_per_log)

    values_iter = iter(queried_values)
    values_by_log = {}
    try:
        for log in sorted(cols_count, reverse=True):
            values_by_log[log] = [
                np.asarray(next(values_iter), dtype=np.uint32)
                for _ in range(cols_count[log])
            ]
    except StopIteration:
        return False
    for log, vals in values_by_log.items():
        for v in vals:
            if len(v) != len(comp[log]):
                return False

    witness_iter = iter(witness)
    # Bottom layer.
    s = comp[bottom]
    node_hashes = {}
    if s:
        vals = values_by_log.get(bottom, [])
        if not vals:
            return False
        words = np.stack(vals, axis=1)
        digs = blake2s.hash_words(words)
        node_hashes = {p: digs[i] for i, p in enumerate(s)}
    for log in range(bottom, 0, -1):
        known = set(s)
        nxt = comp[log - 1]
        vals_at_new = values_by_log.get(log - 1, [])
        # Assemble all parent messages, hash the layer in one batch.
        words = np.zeros((len(nxt), 16 + len(vals_at_new)), dtype=np.uint32)
        for idx, par in enumerate(nxt):
            for ci, child in enumerate((2 * par, 2 * par + 1)):
                if child in known:
                    words[idx, ci * 8 : ci * 8 + 8] = node_hashes[child]
                else:
                    try:
                        words[idx, ci * 8 : ci * 8 + 8] = np.asarray(next(witness_iter))
                    except StopIteration:
                        return False
            for vi, v in enumerate(vals_at_new):
                words[idx, 16 + vi] = v[idx]
        digs = blake2s.hash_words(words)
        node_hashes = {par: digs[i] for i, par in enumerate(nxt)}
        s = nxt
    if list(node_hashes) != [0]:
        return False
    if next(witness_iter, None) is not None:
        return False  # trailing witness data
    return bool(np.all(node_hashes[0] == np.asarray(root)))
