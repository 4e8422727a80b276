"""User-facing facade (reference: crates/prelude/src/prelude.rs:8-26).

    from luminair_tpu.prelude import *

    cx = Graph()
    a = cx.tensor((2, 2)).set([...])
    b = cx.tensor((2, 2)).set([...])
    c = (a * b + a).retrieve()
    cx.compile()
    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)
    proof = prove(pie, settings)
    verify(proof, settings)
"""

from .graph.graph import Graph, GraphTensor
from .graph.trace import execute, gen_circuit_settings, gen_trace
from .air.pie import LuminairPie
from .air.settings import CircuitSettings
from .pcs.config import FriConfig, PcsConfig
from .prover import LuminairProof, prove
from .verifier import verify
from .errors import (
    EmptyTraceError,
    InvalidLogUpError,
    LuminairError,
    StwoVerifierError,
)

__all__ = [
    "Graph",
    "GraphTensor",
    "execute",
    "gen_circuit_settings",
    "gen_trace",
    "LuminairPie",
    "CircuitSettings",
    "FriConfig",
    "PcsConfig",
    "LuminairProof",
    "prove",
    "verify",
    "EmptyTraceError",
    "InvalidLogUpError",
    "LuminairError",
    "StwoVerifierError",
]
