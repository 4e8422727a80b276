"""Common-subexpression elimination in Graph.compile().

Reference parity: luminal's GenericCompiler runs before StwoCompiler
(/root/reference/examples/simple/src/main.rs:23), so duplicate
subexpressions never produce duplicate trace tables.
"""

import numpy as np

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
    fri=FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=6),
)


def _sin_rows(pie):
    return pie.trace_tables["sin"].n_rows if "sin" in pie.trace_tables else 0


def test_duplicate_subexpression_merged():
    """The same sin(a) built twice must produce ONE sin table block, and the
    proof must still verify (LogUp multiplicities double on the merged
    node's yield)."""
    cx = Graph()
    a = cx.tensor((2, 4)).set(np.linspace(0.1, 1.2, 8).reshape(2, 4))
    s1 = a.sin()
    s2 = a.sin()  # duplicate
    out = (s1 + s2).retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)
    assert _sin_rows(pie) == 8, "duplicate sin must be hash-consed into one block"
    assert pie.metadata.execution_resources.op_counter["sin"] == 1

    proof = prove(pie, settings, CFG)
    assert verify(proof, settings)
    expect = 2 * np.sin(np.linspace(0.1, 1.2, 8).reshape(2, 4))
    np.testing.assert_allclose(out.data(), expect, atol=1e-3)


def test_cse_merges_constants_and_chains():
    """exp(x) appearing twice (as inside sigmoid-style expressions) shares
    the constant, mul, and exp2 nodes."""
    cx = Graph()
    a = cx.tensor((4,)).set([0.1, 0.2, 0.3, 0.4])
    e1 = a.exp()
    e2 = a.exp()
    (e1 * e2).retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)
    opc = pie.metadata.execution_resources.op_counter
    assert opc["exp2"] == 1
    proof = prove(pie, settings, CFG)
    assert verify(proof, settings)


def test_cse_does_not_merge_distinct():
    """Different inputs / params must NOT merge."""
    cx = Graph()
    a = cx.tensor((2, 2)).set([[1.0, 2.0], [3.0, 4.0]])
    b = cx.tensor((2, 2)).set([[5.0, 6.0], [7.0, 8.0]])
    lt1 = a < b
    lt2 = b < a  # operand order differs: distinct
    r1 = a.sum_reduce(0)
    r2 = a.sum_reduce(1)  # params differ: distinct
    for t in (lt1, lt2):
        t.retrieve()
    (r1 + r2.reshape((2,))).retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)
    opc = pie.metadata.execution_resources.op_counter
    assert opc["less_than"] == 2
    assert opc["sum_reduce"] == 2
    proof = prove(pie, settings, CFG)
    assert verify(proof, settings)


def test_retrieved_duplicate_remaps():
    """A duplicate node that was itself retrieved still yields data()."""
    cx = Graph()
    a = cx.tensor((4,)).set([1.0, 4.0, 9.0, 16.0])
    s1 = a.sqrt().retrieve()
    s2 = a.sqrt().retrieve()  # merged into s1's node
    cx.compile()
    settings = gen_circuit_settings(cx)
    gen_trace(cx, settings)
    np.testing.assert_allclose(s1.data(), [1, 2, 3, 4], atol=1e-3)
    np.testing.assert_allclose(s2.data(), [1, 2, 3, 4], atol=1e-3)
