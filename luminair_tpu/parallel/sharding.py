"""Multi-chip sharding for the FULL prove() pipeline (jax.sharding.Mesh).

The reference prover is single-process rayon/SIMD (SURVEY §2.8); its scale
axis is trace *rows*.  Here the ENTIRE 4-phase pipeline runs SPMD over a
1-D ``('chips',)`` mesh -- install it with :func:`prove_mesh` and call the
ordinary ``prove()``; every jitted kernel in parallel/accel.py then carries
explicit sharding constraints:

  * **FFT/LDE (iFFT + strided FFT)** — COLUMN-parallel: a commitment tree
    holds O(10-100) independent columns, so each chip transforms its own
    column slice over full rows with zero communication (the circle-FFT
    butterflies stay chip-local).  Outputs re-shard to rows on the way out:
    ONE XLA all-to-all per tree, riding ICI.
  * **Merkle leaf + layer hashing** — ROW-parallel: leaves are independent
    Blake2s messages over the row-sharded columns.  Layer halving stays
    shard-local until a chip would hold < 2 nodes; the top log(n_dev)
    levels are tiny and unconstrained.
  * **LogUp interaction columns** — row-parallel batched QM31 inverse; the
    within-column prefix sum is a ``jax.lax.associative_scan`` whose carry
    exchange XLA lowers to a log-depth collective.
  * **Constraint evaluation / DEEP quotients** — row-pointwise on the
    row-sharded evals, zero resharding.  At blowup 1 the largest
    components' quotient evals sum directly into the composition
    evaluations (no interpolation), so no cross-shard FFT exists anywhere
    on the max-size path.
  * **FRI folds** — row-parallel; the (i, L-1-i) pairing is a reversal of
    the sharded axis (XLA collective-permute), and layers below the
    offload threshold finish on the host as before.

Because every kernel is exact field arithmetic and reductions are
fixed-shape trees, the sharded proof is BIT-IDENTICAL to the host-numpy
proof -- asserted by tests/test_sharding.py and __graft_entry__.py's
dryrun.

The legacy ``prover_step``/``make_mesh`` 2-D demo kernels below predate the
full-pipeline sharding and remain as focused collective tests.

Reference equivalents: the reference parallelizes each phase in one address
space via rayon + SIMD (crates/prover/src/prover.rs:36-312,
crates/air/src/components/*/witness.rs); the mesh replaces that with
XLA-partitioned kernels + ICI collectives.
"""

from __future__ import annotations

import contextlib
from functools import lru_cache, partial
from typing import Optional, Tuple

import numpy as np

from . import accel


def make_chip_mesh(n_devices: Optional[int] = None):
    """A 1-D ('chips',) mesh over the first n_devices devices -- the mesh
    shape the sharded prove() pipeline expects."""
    import jax

    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert n_devices <= len(devs), f"need {n_devices} devices, have {len(devs)}"
    return jax.sharding.Mesh(np.asarray(devs[:n_devices]), ("chips",))


def make_host_chip_mesh(n_hosts: int, n_chips: int):
    """A 2-D ('hosts', 'chips') mesh: n_hosts host groups of n_chips chips.

    Multi-host (DCN) scale-out for the same sharded prove() pipeline
    (SURVEY §7.8: 1 chip / 1 host / N hosts).  Trace rows shard over the
    FLATTENED (hosts, chips) product with hosts outermost: every
    row-pointwise phase (Merkle hashing, constraint evaluation, DEEP
    quotients, FRI folds) is communication-free across hosts, and the only
    DCN-crossing traffic is each tree's one cols->rows all-to-all (which
    XLA decomposes into the intra-host ICI transpose plus contiguous
    inter-host block exchange) and the log-depth claimed-sum reductions
    (one QM31 -- 16 bytes -- per host per component).

    Chips are assigned host-major (devices [h*n_chips, (h+1)*n_chips) form
    host group h), matching how real multi-host TPU slices enumerate
    ``jax.devices()``."""
    import jax

    devs = jax.devices()
    need = n_hosts * n_chips
    assert need <= len(devs), f"need {need} devices, have {len(devs)}"
    grid = np.asarray(devs[:need]).reshape(n_hosts, n_chips)
    return jax.sharding.Mesh(grid, ("hosts", "chips"))


@contextlib.contextmanager
def prove_mesh(mesh, offload_min_rows: Optional[int] = None):
    """Run the enclosed prove()/verify() calls SPMD over `mesh`.

        with sharding.prove_mesh(sharding.make_chip_mesh(8)):
            proof = prove(pie, settings)

    Enables the device engine, installs the mesh into every accel kernel,
    and (optionally) lowers the host/device offload threshold so small
    test traces still exercise the sharded path."""
    prev_enabled = accel.enabled()
    prev_min = accel.OFFLOAD_MIN_ROWS
    accel.enable(True)
    accel.use_mesh(mesh)
    if offload_min_rows is not None:
        accel.OFFLOAD_MIN_ROWS = offload_min_rows
    try:
        yield mesh
    finally:
        accel.use_mesh(None)
        accel.OFFLOAD_MIN_ROWS = prev_min
        accel.enable(prev_enabled)


def _jax():
    import jax

    return jax


def make_mesh(n_devices: Optional[int] = None, shape: Optional[Tuple[int, int]] = None):
    """A 2-D ('rows', 'cols') mesh over the first n_devices devices.

    Default factorization puts most parallelism on 'rows' (trace length is
    the long axis) and a small factor on 'cols'.
    """
    jax = _jax()
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert n_devices <= len(devs), f"need {n_devices} devices, have {len(devs)}"
    if shape is None:
        c = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
        shape = (n_devices // c, c)
    r, c = shape
    assert r * c == n_devices
    mesh_devs = np.asarray(devs[:n_devices]).reshape(r, c)
    return jax.sharding.Mesh(mesh_devs, ("rows", "cols"))


def _sh(mesh, *spec):
    jax = _jax()
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(*spec))


# ---------------------------------------------------------------------------
# Kernel bodies (traced under jit; shardings injected via constraints)
# ---------------------------------------------------------------------------


def _lde_body(cols, tw_inv, tw_big, log_blowup, mesh):
    """(C, N) trace columns -> (C, N << log_blowup) LDE evaluations."""
    import jax
    import jax.numpy as jnp

    from .. import fft

    cols = jax.lax.with_sharding_constraint(cols, _sh(mesh, "cols", None))
    coeffs = fft.ifft(cols, tw_inv)
    n = cols.shape[-1]
    ext = jnp.zeros(cols.shape[:-1] + (n << log_blowup,), dtype=jnp.uint32)
    ext = ext.at[..., :: 1 << log_blowup].set(coeffs)
    evals = fft.fft(ext, tw_big)
    return jax.lax.with_sharding_constraint(evals, _sh(mesh, "cols", None))


def _merkle_body(evals, mesh):
    """Uniform-column Merkle tree (same structure as crypto.merkle.MerkleTree
    for a single-log column set): bottom layer hashes the C column values at
    each position, upper layers hash the 2 child digests.  Returns the root
    digest (8,) uint32."""
    import jax

    from ..crypto import blake2s

    leaves = jax.lax.with_sharding_constraint(evals.T, _sh(mesh, "rows", None))
    layer = blake2s.hash_words(leaves)  # (M, 8)
    while layer.shape[0] > 1:
        layer = blake2s.hash_words(layer.reshape(-1, 16))
    return layer[0]


def _logup_sum_body(values, mult_m31, z, alpha, mesh):
    """Row-sharded LogUp claimed sum: sum_i mult_i / (z - sum_k alpha^k v_ki).

    values: (K, N) m31 columns entering the relation; mult_m31: (N,) m31
    (signed multiplicities already embedded); z, alpha: (4,) QM31.
    Returns the (4,) QM31 total — the per-component claimed_sum that the
    global LogUp check sums to zero (air/framework.py finalize_logup).
    """
    import jax
    import jax.numpy as jnp

    from ..fields import m31, qm31

    values = jax.lax.with_sharding_constraint(values, _sh(mesh, None, "rows"))
    mult_m31 = jax.lax.with_sharding_constraint(mult_m31, _sh(mesh, "rows"))

    # combine = z - sum_k alpha^k * v_k   (QM31 rows (N, 4))
    n = values.shape[-1]
    acc = jnp.broadcast_to(z.astype(jnp.uint32), (n, 4))
    apow = qm31.one((), jnp)
    for k in range(values.shape[0]):
        term = qm31.mul_m31(jnp.broadcast_to(apow, (n, 4)), values[k])
        acc = qm31.sub(acc, term)
        apow = qm31.mul(apow, alpha.astype(jnp.uint32))
    inv_d = qm31.inv(acc)  # batched QM31 inverse (Fermat chain, row-sharded)
    frac = qm31.mul_m31(inv_d, mult_m31)
    # All-reduce across row shards (XLA lowers to psum over ICI).
    total = frac
    while total.shape[0] > 1:
        half = total.shape[0] // 2
        total = qm31.add(total[:half], total[half : 2 * half])
    return total[0]


# ---------------------------------------------------------------------------
# Jitted entry points
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _compiled_prover_step(mesh_key, log_n, log_blowup, n_cols, n_rel_cols):
    import jax
    import jax.numpy as jnp

    from .. import circle

    mesh = mesh_key.mesh
    tw_inv = [jnp.asarray(t) for t in circle.ifft_twiddles(log_n)]
    tw_big = [jnp.asarray(t) for t in circle.fft_twiddles(log_n + log_blowup)]

    @jax.jit
    def step(cols, mult_m31, z, alpha):
        evals = _lde_body(cols, tw_inv, tw_big, log_blowup, mesh)
        root = _merkle_body(evals, mesh)
        claimed = _logup_sum_body(cols[:n_rel_cols], mult_m31, z, alpha, mesh)
        return evals, root, claimed

    return step


class _MeshKey:
    """Hashable wrapper so jitted steps cache per mesh."""

    def __init__(self, mesh):
        self.mesh = mesh
        self._k = (tuple(d.id for d in mesh.devices.flat), mesh.devices.shape)

    def __hash__(self):
        return hash(self._k)

    def __eq__(self, other):
        return isinstance(other, _MeshKey) and self._k == other._k


def prover_step(mesh, cols: np.ndarray, mult_m31: np.ndarray, z: np.ndarray,
                alpha: np.ndarray, log_blowup: int = 1, n_rel_cols: int = 2):
    """One sharded prover step over the mesh.

    cols: (C, N) uint32 trace columns (N a power of two).
    Returns (lde_evals (C, N<<blowup), merkle_root (8,), claimed_sum (4,)),
    all as host numpy — bit-identical to the host (numpy) pipeline.
    """
    import jax.numpy as jnp

    log_n = int(cols.shape[-1]).bit_length() - 1
    assert 1 << log_n == cols.shape[-1]
    step = _compiled_prover_step(_MeshKey(mesh), log_n, log_blowup,
                                 cols.shape[0], n_rel_cols)
    evals, root, claimed = step(
        jnp.asarray(cols), jnp.asarray(mult_m31), jnp.asarray(z), jnp.asarray(alpha)
    )
    return np.asarray(evals), np.asarray(root), np.asarray(claimed)


def host_reference_step(cols, mult_m31, z, alpha, log_blowup=1, n_rel_cols=2):
    """The same step on host numpy (for differential tests)."""
    from .. import fft
    from ..crypto.merkle import MerkleTree
    from ..fields import qm31

    coeffs = fft.ifft(cols)
    evals = fft.extend_coeffs_and_fft(coeffs, log_blowup)
    tree = MerkleTree([np.ascontiguousarray(c) for c in evals])
    values = cols[:n_rel_cols]
    n = values.shape[-1]
    acc = np.broadcast_to(np.asarray(z, dtype=np.uint32), (n, 4)).copy()
    apow = qm31.one()
    for k in range(values.shape[0]):
        acc = qm31.sub(acc, qm31.mul_m31(np.broadcast_to(apow, (n, 4)), values[k]))
        apow = qm31.mul(apow, np.asarray(alpha, dtype=np.uint32))
    frac = qm31.mul_m31(qm31.inv(acc), mult_m31)
    total = frac
    while total.shape[0] > 1:
        half = total.shape[0] // 2
        total = qm31.add(total[:half], total[half : 2 * half])
    return evals, tree.root, total[0]
