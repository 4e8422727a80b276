"""Phase-level tracing for the prover and verifier.

Reference parity: the reference instruments every prover phase with
``tracing::info!`` events (crates/prover/src/prover.rs:35,52,65,185,303) and
wraps each verifier phase in ``span!`` (crates/verifiers/rust/src/
verifier.rs:29,40,58,74,91,114).  Here a ``PhaseTimer`` collects wall-clock
per phase; the most recent prove/verify timers are kept module-global so
benchmarks (bench.py, benchmarks/ops_bench.py) can report per-phase
breakdowns without threading a handle through the public API.

Log lines are emitted at INFO on the ``luminair_tpu`` logger (enable with
``LUMINAIR_TPU_TRACE=1`` or standard logging config).

Device-timing note: JAX dispatch is asynchronous, but every prover phase
ends by mixing a value into the Fiat-Shamir channel (a Merkle root, claimed
sums, an OODS sample), which downloads a scalar and therefore drains the
in-order device queue -- so per-phase wall times at phase boundaries are
faithful even on the accelerated path.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Dict, Optional

logger = logging.getLogger("luminair_tpu")

if os.environ.get("LUMINAIR_TPU_TRACE", "0") == "1" and not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


class PhaseTimer:
    """Accumulates wall-clock seconds per named phase."""

    def __init__(self, kind: str):
        self.kind = kind
        self.phases: Dict[str, float] = {}
        self._t_start = time.perf_counter()

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            logger.info("%s %s: %.4fs", self.kind, name, dt)

    def total(self) -> float:
        return time.perf_counter() - self._t_start

    def summary(self) -> Dict[str, float]:
        out = {k: round(v, 4) for k, v in self.phases.items()}
        out["total"] = round(self.total(), 4)
        return out


_last: Dict[str, Optional[PhaseTimer]] = {"prove": None, "verify": None}


def start(kind: str) -> PhaseTimer:
    t = PhaseTimer(kind)
    _last[kind] = t
    return t


def current(kind: str) -> PhaseTimer:
    """The live timer for the in-flight prove()/verify() (a fresh detached
    timer if none is active -- sub-spans then simply go unreported)."""
    t = _last.get(kind)
    return t if t is not None else PhaseTimer(kind)


def last_phases(kind: str) -> Dict[str, float]:
    """Per-phase seconds of the most recent prove()/verify() call."""
    t = _last.get(kind)
    return t.summary() if t else {}
