"""Broadcast/expansion LogUp-multiplicity stress suite.

Mirrors the reference's 16-scenario matrix (crates/graph/src/tests/
expansions.rs:65-368): fake dims, multi-consumer different expansions,
expansion->reduction chains.  Every scenario runs the FULL pipeline
(compile -> settings -> trace -> prove -> verify) and compares against a
numpy float oracle — an unbalanced LogUp multiplicity fails `verify`, so
these are soundness tests as much as numeric ones.
"""

import numpy as np
import pytest

from luminair_tpu.pcs.config import FriConfig, PcsConfig
from luminair_tpu.prelude import *

CFG = PcsConfig(
    pow_bits=1,
    fri=FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=6),
)


def run_scenario(build, seed, tol=5e-3):
    """build(cx, rng) -> (output GraphTensor, numpy expected)."""
    cx = Graph()
    rng = np.random.default_rng(seed)
    out, expect = build(cx, rng)
    out.retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)
    proof = prove(pie, settings, CFG)
    assert verify(proof, settings)
    got = np.asarray(out.data(), dtype=np.float64).reshape(-1)
    expect = np.asarray(expect, dtype=np.float64).reshape(-1)
    assert got.shape == expect.shape
    assert np.allclose(got, expect, atol=tol, rtol=tol), f"{got} vs {expect}"


def rand(rng, shape):
    return rng.uniform(-1.0, 1.0, shape)


def test_single_dimension_expansion():
    def build(cx, rng):
        av, bv = rand(rng, (2, 3)), rand(rng, (2, 1))
        a = cx.tensor((2, 3)).set(av)
        b = cx.tensor((2, 1)).set(bv)
        return a * b.expand(1, 3), av * bv

    run_scenario(build, 42)


def test_multiple_dimension_expansion():
    def build(cx, rng):
        av, bv = rand(rng, (3, 4, 2)), rand(rng, (1, 1, 2))
        a = cx.tensor((3, 4, 2)).set(av)
        b = cx.tensor((1, 1, 2)).set(bv)
        return a + b.expand(0, 3).expand(1, 4), av + bv

    run_scenario(build, 43)


def test_scalar_broadcasting():
    def build(cx, rng):
        av = rand(rng, (3, 4))
        a = cx.tensor((3, 4)).set(av)
        s = cx.tensor((1, 1)).set([[2.5]])
        return a * s.expand_to((3, 4)), av * 2.5

    run_scenario(build, 44)


def test_chained_expansions():
    def build(cx, rng):
        av, bv, cv = rand(rng, (2, 3)), rand(rng, (1, 3)), rand(rng, (2, 1))
        a = cx.tensor((2, 3)).set(av)
        b = cx.tensor((1, 3)).set(bv)
        c = cx.tensor((2, 1)).set(cv)
        inter = a + b.expand(0, 2)
        return inter * c.expand(1, 3), (av + bv) * cv

    run_scenario(build, 45)


def test_multiple_consumers_different_expansions():
    """One producer feeding two consumers with DIFFERENT fake-dim factors —
    the expansion-adjusted consumer count (reference graph.rs:220-243) must
    weight each edge by its own expansion product for LogUp to balance."""

    def build(cx, rng):
        basev = rand(rng, (2, 2))
        av, bv = rand(rng, (2, 2, 3)), rand(rng, (2, 2, 4))
        base = cx.tensor((2, 2)).set(basev)
        a = cx.tensor((2, 2, 3)).set(av)
        b = cx.tensor((2, 2, 4)).set(bv)
        r1 = (base.expand(2, 3) * a).sum_reduce(2)
        r2 = (base.expand(2, 4) + b).sum_reduce(2)
        expect = (basev[:, :, None] * av).sum(2) + (basev[:, :, None] + bv).sum(2)
        return r1 + r2, expect

    run_scenario(build, 46, tol=1e-2)


def test_mixed_real_fake_dimensions():
    def build(cx, rng):
        av, bv = rand(rng, (3, 2, 4)), rand(rng, (3, 1, 4))
        a = cx.tensor((3, 2, 4)).set(av)
        b = cx.tensor((3, 1, 4)).set(bv)
        return a * b.expand(1, 2), av * bv

    run_scenario(build, 47)


def test_row_vector_broadcasting():
    def build(cx, rng):
        mv, rv = rand(rng, (4, 5)), rand(rng, (1, 5))
        m = cx.tensor((4, 5)).set(mv)
        r = cx.tensor((1, 5)).set(rv)
        return m + r.expand(0, 4), mv + rv

    run_scenario(build, 48)


def test_column_vector_broadcasting():
    def build(cx, rng):
        mv, cv = rand(rng, (4, 5)), rand(rng, (4, 1))
        m = cx.tensor((4, 5)).set(mv)
        c = cx.tensor((4, 1)).set(cv)
        return m * c.expand(1, 5), mv * cv

    run_scenario(build, 49)


def test_complex_expansion_chain():
    def build(cx, rng):
        av, bv, cv = rand(rng, (2, 3)), rand(rng, (1, 3)), rand(rng, (2, 1))
        ev = rand(rng, (2, 3, 4))
        a = cx.tensor((2, 3)).set(av)
        b = cx.tensor((1, 3)).set(bv)
        c = cx.tensor((2, 1)).set(cv)
        d = cx.tensor((1, 1)).set([[1.5]])
        e = cx.tensor((2, 3, 4)).set(ev)
        step3 = (a + b.expand(0, 2)) * c.expand(1, 3) + d.expand_to((2, 3))
        out = step3.expand(2, 4) * e
        expect = (((av + bv) * cv + 1.5)[:, :, None]) * ev
        return out, expect

    run_scenario(build, 50, tol=1e-2)


def test_nested_operations_with_expansions():
    """x consumed by two different binary ops: multi-consumer of a REAL
    tensor mixed with expanded partners."""

    def build(cx, rng):
        xv, yv, zv = rand(rng, (3, 2)), rand(rng, (1, 2)), rand(rng, (3, 1))
        x = cx.tensor((3, 2)).set(xv)
        y = cx.tensor((1, 2)).set(yv)
        z = cx.tensor((3, 1)).set(zv)
        out = (x + y.expand(0, 3)) * (x + z.expand(1, 2))
        return out, (xv + yv) * (xv + zv)

    run_scenario(build, 51)


def test_reduction_after_expansion():
    def build(cx, rng):
        basev, wv = rand(rng, (2, 3)), rand(rng, (1, 3))
        base = cx.tensor((2, 3)).set(basev)
        w = cx.tensor((1, 3)).set(wv)
        out = (base * w.expand(0, 2)).sum_reduce(1)
        return out, (basev * wv).sum(1)

    run_scenario(build, 52)


def test_large_expansion_factors():
    def build(cx, rng):
        lv = rand(rng, (8, 16))
        small = cx.tensor((1, 1)).set([[3.14]])
        large = cx.tensor((8, 16)).set(lv)
        return large + small.expand_to((8, 16)), lv + 3.14

    run_scenario(build, 53)


def test_expansion_with_unary_operations():
    def build(cx, rng):
        basev, ov = rand(rng, (2, 2)), rand(rng, (2, 2, 3))
        base = cx.tensor((2, 2)).set(basev)
        other = cx.tensor((2, 2, 3)).set(ov)
        out = base.sin().expand(2, 3) * other
        return out, np.sin(basev)[:, :, None] * ov

    run_scenario(build, 54)


def test_zero_expansion_edge_case():
    def build(cx, rng):
        av, bv = rand(rng, (1, 4)), rand(rng, (3, 4))
        a = cx.tensor((1, 4)).set(av)
        b = cx.tensor((3, 4)).set(bv)
        return a.expand(0, 3) + b, av + bv

    run_scenario(build, 56)


def test_identity_expansion_edge_case():
    def build(cx, rng):
        av, ov = rand(rng, (3, 3)), rand(rng, (3, 3, 1))
        a = cx.tensor((3, 3)).set(av)
        other = cx.tensor((3, 3, 1)).set(ov)
        return a.expand(2, 1) + other, av[:, :, None] + ov

    run_scenario(build, 57)


def test_comprehensive_integration():
    """Four layers: expansions -> elementwise chain -> sin -> expand ->
    filter -> reduce -> final bias."""

    def build(cx, rng):
        i1v, i2v, i3v = rand(rng, (2, 3)), rand(rng, (1, 3)), rand(rng, (2, 1))
        fv = rand(rng, (2, 3, 4))
        i1 = cx.tensor((2, 3)).set(i1v)
        i2 = cx.tensor((1, 3)).set(i2v)
        i3 = cx.tensor((2, 1)).set(i3v)
        bias = cx.tensor((1, 1)).set([[0.1]])
        filt = cx.tensor((2, 3, 4)).set(fv)
        fbias = cx.tensor((1, 1)).set([[-0.05]])

        inter3 = (i1 + i2.expand(0, 2)) * i3.expand(1, 3) + bias.expand_to((2, 3))
        filtered = inter3.sin().expand(2, 4) * filt
        out = filtered.sum_reduce(2) + fbias.expand_to((2, 3))

        expect = (np.sin((i1v + i2v) * i3v + 0.1)[:, :, None] * fv).sum(2) - 0.05
        return out, expect

    run_scenario(build, 100, tol=2e-2)
