"""luminair_tpu: a TPU-native Circle-STARK zkML proving stack.

Same capability surface as gizatechxyz/LuminAIR (see SURVEY.md): build a
tensor graph from 12 provable primitives, compile, generate per-operator
trace tables glued by a LogUp argument, prove with a Circle STARK over
M31, verify cheaply.  Every prover stage is vectorized column arithmetic
that runs under numpy (host) or JAX/Pallas (TPU).
"""

__version__ = "0.1.0"
