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


class TestReduceChainForgery:
    """Forged running-reduction chains the REFERENCE constraint system
    accepts (its acc/max_val columns are free witness columns,
    max_reduce/component.rs:66-81, sum_reduce/component.rs:69-70) must be
    rejected here: the next-row continuity masks + the 8/8/8/6-bit >=
    range proof pin out = max/sum of the actual inputs."""

    @staticmethod
    def _forge_max(pie, settings, claimed_run):
        """Rewrite the max_reduce table for a single-segment reduce so it
        claims `claimed_run` as the running max chain, with every per-row
        witness column an attacker controls made self-consistent (is_max,
        next_max_val, out, best-effort ge limbs, range-check mults)."""
        t = pie.trace_tables["max_reduce"]
        inp = t.columns["input"].astype(np.int64)
        n = len(inp)
        run = np.asarray(claimed_run, dtype=np.int64)
        max_val = np.concatenate([run[:1] * 0 + inp[0], run[:-1]])
        is_max = (run != max_val).astype(np.uint32)
        loser = np.where(is_max.astype(bool), max_val, inp)
        d = (run - loser) % ((1 << 31) - 1)  # attacker embeds mod P
        limbs = [
            (d & 0xFF).astype(np.uint32),
            ((d >> 8) & 0xFF).astype(np.uint32),
            ((d >> 16) & 0xFF).astype(np.uint32),
            np.minimum((d >> 24) & 0xFF, 0x3F).astype(np.uint32),
        ]
        # Keep the range-check LogUp balanced for the claimed limbs.
        rc = pie.trace_tables["range_check_lookup"].columns["multiplicity"].copy()
        for old_name, new in zip(
            ("ge_limb0", "ge_limb1", "ge_limb2"), limbs[:3]
        ):
            rc -= np.bincount(t.columns[old_name], minlength=len(rc)).astype(rc.dtype)
            rc += np.bincount(new, minlength=len(rc)).astype(rc.dtype)
        rc -= np.bincount(t.columns["ge_limb3"] * 4, minlength=len(rc)).astype(rc.dtype)
        rc += np.bincount(limbs[3] * 4, minlength=len(rc)).astype(rc.dtype)
        pie.trace_tables["range_check_lookup"].columns["multiplicity"] = rc
        t.columns["max_val"] = (max_val % ((1 << 31) - 1)).astype(np.uint32)
        t.columns["next_max_val"] = (run % ((1 << 31) - 1)).astype(np.uint32)
        t.columns["is_max"] = is_max
        for name, v in zip(("ge_limb0", "ge_limb1", "ge_limb2", "ge_limb3"), limbs):
            t.columns[name] = v
        out = t.columns["out"].copy()
        out[n - 1] = run[-1] % ((1 << 31) - 1)
        t.columns["out"] = out

    def test_forged_smaller_max_rejected(self):
        """Skip the true max at its own row (claim is_max = 0 there)."""
        cx = Graph()
        cx.tensor((1, 4)).set(np.array([[0.1, 0.9, 0.3, 0.2]])).max_reduce(1).retrieve()
        cx.compile()
        settings = gen_circuit_settings(cx)
        pie = gen_trace(cx, settings)
        inp = pie.trace_tables["max_reduce"].columns["input"].astype(np.int64)
        # claimed chain ignores inp[1] (the true max): 0.1, 0.1, 0.3, 0.3
        claimed = np.array([inp[0], inp[0], inp[2], inp[2]])
        self._forge_max(pie, settings, claimed)
        assert_rejected(pie, settings)

    def test_max_chain_reset_rejected(self):
        """Carry the true max for a while, then silently drop it."""
        cx = Graph()
        cx.tensor((1, 4)).set(np.array([[0.1, 0.9, 0.3, 0.2]])).max_reduce(1).retrieve()
        cx.compile()
        settings = gen_circuit_settings(cx)
        pie = gen_trace(cx, settings)
        inp = pie.trace_tables["max_reduce"].columns["input"].astype(np.int64)
        # honest until row 1, then the chain "restarts" at inp[2]
        claimed = np.array([inp[0], inp[1], inp[2], inp[2]])
        self._forge_max(pie, settings, claimed)
        assert_rejected(pie, settings)

    def test_forged_sum_acc_reset_rejected(self):
        """Reset the accumulator mid-segment to claim a smaller sum."""
        cx = Graph()
        cx.tensor((1, 4)).set(np.array([[0.1, 0.2, 0.3, 0.4]])).sum_reduce(1).retrieve()
        cx.compile()
        settings = gen_circuit_settings(cx)
        pie = gen_trace(cx, settings)
        t = pie.trace_tables["sum_reduce"]
        inp = t.columns["input"].astype(np.int64)
        # attacker: acc restarts at 0 on row 2; claims sum = inp[2] + inp[3]
        acc = np.array([0, inp[0], 0, inp[2]])
        nxt = acc + inp
        t.columns["acc"] = (acc % ((1 << 31) - 1)).astype(np.uint32)
        t.columns["next_acc"] = (nxt % ((1 << 31) - 1)).astype(np.uint32)
        out = t.columns["out"].copy()
        out[3] = nxt[3] % ((1 << 31) - 1)
        t.columns["out"] = out
        assert_rejected(pie, settings)

    def test_honest_reduce_still_accepted(self):
        cx = Graph()
        a = cx.tensor((3, 5)).set(RNG.uniform(-0.8, 0.9, (3, 5)))
        (a.max_reduce(1) + a.sum_reduce(1)).retrieve()
        cx.compile()
        settings = gen_circuit_settings(cx)
        pie = gen_trace(cx, settings)
        proof = prove(pie, settings, CFG)
        assert verify(proof, settings)
