"""Per-component adversarial coverage: one witness-column mutation per op
component, LUT-multiplicity tampering, and contiguous slice/expand edge
cases (VERDICT round-1 item 10; extends the add-only probes in
test_e2e_stark.py).

Every mutation class must be rejected -- by the LogUp balance check, the
composition identity, or a Merkle/FRI check -- never silently accepted.
Mirrors the reference's test philosophy that "the cheap verifier IS the
check" (crates/graph/src/tests/, SURVEY §4).
"""

import numpy as np
import pytest

from luminair_tpu.errors import LuminairError
from luminair_tpu.pcs.config import FriConfig, PcsConfig
from luminair_tpu.prelude import (
    Graph,
    gen_circuit_settings,
    gen_trace,
    prove,
    verify,
)

CFG = PcsConfig(
    pow_bits=1,
    fri=FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=8),
)

RNG = np.random.default_rng(23)


def build_pie(build):
    cx = Graph()
    build(cx)
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)
    return pie, settings


def mutate(pie, table, column, row=1, delta=1):
    t = pie.trace_tables[table]
    col = t.columns[column].copy()
    col[row] = (int(col[row]) + delta) % ((1 << 31) - 1)
    t.columns[column] = col


def assert_rejected(pie, settings):
    try:
        proof = prove(pie, settings, CFG)
    except (LuminairError, AssertionError):
        return  # prover refused the inconsistent witness: also a rejection
    with pytest.raises(LuminairError):
        ok = verify(proof, settings)
        assert ok, "verify returned falsy without raising"  # pragma: no cover


def binary_graph(op):
    def build(cx):
        a = cx.tensor((4, 4)).set(RNG.uniform(0.3, 1.2, (4, 4)))
        b = cx.tensor((4, 4)).set(RNG.uniform(0.3, 1.2, (4, 4)))
        {
            "add": lambda: a + b,
            "mul": lambda: a * b,
            "rem": lambda: a % b,
            "less_than": lambda: a < b,
        }[op]().retrieve()

    return build


def unary_graph(op):
    def build(cx):
        a = cx.tensor((4, 4)).set(RNG.uniform(0.3, 1.2, (4, 4)))
        getattr(a, op)().retrieve()

    return build


class TestPerComponentMutations:
    """One load-bearing witness column flipped per component."""

    @pytest.mark.parametrize(
        "op,column",
        [
            ("add", "out"),  # breaks eval_fixed_add + LogUp yield
            ("mul", "rem"),  # breaks ONLY the rescale remainder constraint
            ("rem", "quotient"),  # breaks only the div identity
            ("less_than", "borrow"),  # booleanity + borrow identity
            ("less_than", "limb0"),  # limb decomposition + range check
        ],
    )
    def test_binary_component_mutation_rejected(self, op, column):
        pie, settings = build_pie(binary_graph(op))
        mutate(pie, op, column)
        assert_rejected(pie, settings)

    @pytest.mark.parametrize(
        "op,column",
        [
            ("recip", "rem"),
            ("sqrt", "rem"),
            ("sin", "out"),  # LUT relation: (input, out) not in table
            ("exp2", "out"),
            ("log2", "out"),
        ],
    )
    def test_unary_component_mutation_rejected(self, op, column):
        pie, settings = build_pie(unary_graph(op))
        mutate(pie, op, column)
        assert_rejected(pie, settings)

    @pytest.mark.parametrize(
        "op,column",
        [
            ("sum_reduce", "acc"),  # transition next_acc = acc + input
            ("max_reduce", "is_max"),  # is_max gating constraints
        ],
    )
    def test_reduce_mutation_rejected(self, op, column):
        def build(cx):
            a = cx.tensor((4, 8)).set(RNG.uniform(0.1, 1.0, (4, 8)))
            getattr(a, op)(1).retrieve()

        pie, settings = build_pie(build)
        mutate(pie, op, column)
        assert_rejected(pie, settings)

    def test_inputs_value_mutation_rejected(self):
        pie, settings = build_pie(binary_graph("add"))
        mutate(pie, "inputs", "val")
        assert_rejected(pie, settings)

    def test_contiguous_out_mutation_rejected(self):
        def build(cx):
            a = cx.tensor((4, 4)).set(RNG.uniform(0.1, 1.0, (4, 4)))
            (a.slice_dim(1, 0, 2).contiguous() * 1.0).retrieve()

        pie, settings = build_pie(build)
        assert "contiguous" in pie.trace_tables
        mutate(pie, "contiguous", "out")
        assert_rejected(pie, settings)


class TestLutMultiplicityTampering:
    def test_sin_lut_multiplicity_rejected(self):
        pie, settings = build_pie(unary_graph("sin"))
        t = pie.trace_tables["sin_lookup"]
        col = t.columns["multiplicity"].copy()
        nz = np.nonzero(col)[0]
        col[nz[0]] += 1  # claim one extra lookup that never happened
        t.columns["multiplicity"] = col
        assert_rejected(pie, settings)

    def test_sin_lut_multiplicity_moved_rejected(self):
        """Keeping the total but moving a count to a different LUT entry
        must still fail (the relation binds (input, out) pairs)."""
        pie, settings = build_pie(unary_graph("sin"))
        t = pie.trace_tables["sin_lookup"]
        col = t.columns["multiplicity"].copy()
        nz = np.nonzero(col)[0]
        other = (nz[0] + 1) % len(col)
        if other in nz and len(nz) > 1:
            other = (nz[-1] + 1) % len(col)
        col[nz[0]] -= 1
        col[other] += 1
        t.columns["multiplicity"] = col
        assert_rejected(pie, settings)

    def test_range_check_multiplicity_rejected(self):
        pie, settings = build_pie(binary_graph("less_than"))
        t = pie.trace_tables["range_check_lookup"]
        col = t.columns["multiplicity"].copy()
        col[3] += 1
        t.columns["multiplicity"] = col
        assert_rejected(pie, settings)


class TestContiguousEdgeCases:
    """Honest-path coverage of n_out != n_in reindexings (the rows beyond
    the shorter side carry zero multiplicities -- graph/trace.py)."""

    def test_slice_shrink_roundtrip(self):
        # n_out < n_in: slice 4x4 -> 4x1
        cx = Graph()
        vals = RNG.uniform(0.1, 1.0, (4, 4))
        a = cx.tensor((4, 4)).set(vals)
        out = (a.slice_dim(1, 0, 1).contiguous() * 2.0).retrieve()
        cx.compile()
        settings = gen_circuit_settings(cx)
        pie = gen_trace(cx, settings)
        proof = prove(pie, settings, CFG)
        assert verify(proof, settings)
        got = np.asarray(out.data()).reshape(4)
        np.testing.assert_allclose(got, vals[:, 0] * 2.0, atol=2e-3)

    def test_expand_grow_roundtrip(self):
        # n_out > n_in: broadcast a (4,1) slice up to (4,4) and materialize
        cx = Graph()
        a = cx.tensor((4, 1)).set(RNG.uniform(0.1, 1.0, (4, 1)))
        t = a.expand(1, 4).contiguous()
        (t + 0.5).retrieve()
        cx.compile()
        settings = gen_circuit_settings(cx)
        pie = gen_trace(cx, settings)
        assert "contiguous" in pie.trace_tables
        n_rows = pie.trace_tables["contiguous"].n_rows
        assert n_rows >= 16  # 16 materialized rows (4 in, 16 out)
        proof = prove(pie, settings, CFG)
        assert verify(proof, settings)
