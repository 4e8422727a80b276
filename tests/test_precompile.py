"""Precompile-plan coverage: the declarative program plan
(parallel/precompile.py) must cover every jit factory call -- and every
jit argument SHAPE -- that an actual device-path prove() dispatches.

A missed program is not a correctness bug (it just compiles at first use,
the pre-round-4 behavior), but it silently re-opens the cold-start wall
this module exists to kill, so drift is pinned here.  The check records
real factory invocations during a tiny CPU device-path prove and diffs
them against plan() output WITHOUT compiling anything extra.
"""

import numpy as np
import pytest

from luminair_tpu import serde
from luminair_tpu.parallel import accel, precompile
from luminair_tpu.pcs.config import FriConfig, PcsConfig
from luminair_tpu.prelude import *
from luminair_tpu.prover import prove

CFG = PcsConfig(
    pow_bits=2,
    fri=FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=8),
)

# Factories whose programs the plan promises to cover.  (Decommit gathers
# and PoW grinding are excluded by design: their shapes depend on query
# dedup counts and they were <10% of the measured compile wall.)
PLANNED_FACTORIES = {
    "_jit_lde",
    "_jit_merkle_tree",
    "_jit_witness",
    "_jit_domain",
    "_jit_ifft_t",
    "_jit_fft",
    "_jit_eval_at_point",
    "_jit_quotient_group",
    "_jit_fold_circle",
    "_jit_fri_layer",
    "_jit_draw_felt",
}


def _shape_spec(tree):
    """Pytree of arrays/avals -> hashable (shape, dtype) spec tree."""
    import jax

    return jax.tree_util.tree_map(
        lambda a: (tuple(a.shape), str(np.dtype(a.dtype))), tree
    )


class _Recorder:
    def __init__(self):
        self.calls = set()  # (factory, key, arg_spec)

    def install(self, monkeypatch):
        for name in PLANNED_FACTORIES:
            orig = getattr(accel, name)

            def factory(*key, _orig=orig, _name=name):
                fn = _orig(*key)

                def proxy(*args, _fn=fn, _key=key, _fname=_name):
                    self.calls.add(
                        (_fname, _key, _freeze(_shape_spec(list(args))))
                    )
                    return _fn(*args)

                return proxy

            if hasattr(orig, "cache_info"):
                factory.cache_info = orig.cache_info
                factory.cache_clear = orig.cache_clear
            monkeypatch.setattr(accel, name, factory)


def _freeze(obj):
    if isinstance(obj, list):
        return ("L",) + tuple(_freeze(v) for v in obj)
    if isinstance(obj, tuple):
        return ("T",) + tuple(_freeze(v) for v in obj)
    if isinstance(obj, dict):
        return ("D",) + tuple((k, _freeze(v)) for k, v in sorted(obj.items()))
    return obj


def test_plan_covers_actual_prove(monkeypatch):
    """Every (factory, key, arg shapes) a device prove dispatches must be
    enumerated by precompile.plan()."""
    monkeypatch.setattr(accel, "OFFLOAD_MIN_ROWS", 1)
    monkeypatch.setenv("LUMINAIR_PRECOMPILE", "0")  # record, don't warm
    accel.enable(True)
    try:
        cx = Graph()
        rng = np.random.default_rng(5)
        a = cx.tensor((8, 8)).set(rng.normal(size=(8, 8)))
        b = cx.tensor((8, 8)).set(rng.normal(size=(8, 8)))
        (a * b + a).retrieve()
        cx.compile()
        settings = gen_circuit_settings(cx)
        pie = gen_trace(cx, settings)

        rec = _Recorder()
        rec.install(monkeypatch)
        proof = prove(pie, settings, CFG)
        assert verify(proof, settings)
    finally:
        accel.enable(False)

    from luminair_tpu.air.claim import LuminairClaim
    from luminair_tpu.air.layout import AirLayout

    tables = {n: t for n, t in pie.trace_tables.items() if t.n_rows > 0}
    claim = LuminairClaim({n: t.log_size for n, t in tables.items()})
    layout = AirLayout(claim, settings)
    jobs = precompile.plan(layout, claim, CFG)
    planned = {
        (j.factory, j.key, _freeze(_shape_spec(list(j.args)))) for j in jobs
    }

    missed = rec.calls - planned
    assert not missed, (
        "programs dispatched by prove() but absent from the precompile plan "
        "(each re-opens the serial compile wall):\n"
        + "\n".join(f"  {m[0]} key={m[1]}\n    args={m[2]}" for m in sorted(missed, key=str))
    )


def test_warm_is_idempotent_and_gated(monkeypatch):
    """warm() respects LUMINAIR_PRECOMPILE=0 and never double-compiles a
    shape profile."""
    monkeypatch.setenv("LUMINAIR_PRECOMPILE", "0")
    assert precompile.warm(None, None, None) == 0  # gated: args untouched


@pytest.mark.slow
def test_plan_covers_wide_graph_prove(monkeypatch):
    """Coverage on the all-component graph (LUTs, range check, reductions,
    strided sizes).  Slow: XLA-CPU compiles of these kernels take minutes;
    the muladd test above is the fast gate."""
    monkeypatch.setattr(accel, "OFFLOAD_MIN_ROWS", 1)
    monkeypatch.setenv("LUMINAIR_PRECOMPILE", "0")
    accel.enable(True)
    try:
        cx = Graph()
        rng = np.random.default_rng(7)
        a = cx.tensor((4, 8)).set(rng.uniform(0.1, 2.0, size=(4, 8)))
        b = cx.tensor((4, 8)).set(rng.uniform(0.1, 2.0, size=(4, 8)))
        (a.sin() + b.sqrt().exp2()).retrieve()
        (a < b).retrieve()
        (a * b).sum_reduce(1).retrieve()
        a.recip().retrieve()
        cx.compile()
        settings = gen_circuit_settings(cx)
        pie = gen_trace(cx, settings)

        rec = _Recorder()
        rec.install(monkeypatch)
        proof = prove(pie, settings, CFG)
        assert verify(proof, settings)
    finally:
        accel.enable(False)

    from luminair_tpu.air.claim import LuminairClaim
    from luminair_tpu.air.layout import AirLayout

    tables = {n: t for n, t in pie.trace_tables.items() if t.n_rows > 0}
    claim = LuminairClaim({n: t.log_size for n, t in tables.items()})
    layout = AirLayout(claim, settings)
    jobs = precompile.plan(layout, claim, CFG)
    planned = {
        (j.factory, j.key, _freeze(_shape_spec(list(j.args)))) for j in jobs
    }
    missed = rec.calls - planned
    assert not missed, "\n".join(f"{m[0]} key={m[1]}" for m in sorted(missed, key=str))
