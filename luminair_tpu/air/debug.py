"""Constraint debugging: evaluate every component's constraints directly on
the trace domain and report which ones fail at which rows.  The reference
has no equivalent -- failures there surface only as opaque verifier
rejections; this is the "assert channel state / per-phase debugging"
tooling SURVEY.md section 7 calls for.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..fields import qm31
from ..crypto.channel import Blake2sChannel
from .claim import LuminairClaim
from .layout import AirLayout
from .framework import AirEval, Felt, WitnessEval


class _CheckEval(WitnessEval):
    """Trace-domain evaluator that records each constraint's values."""

    def __init__(self, main_cols, pp_cols, inter_cols, claimed_sum):
        super().__init__(main_cols, pp_cols)
        self._inter = inter_cols
        self._claimed = claimed_sum
        self.failures: List[tuple] = []
        self._count = 0

    def constraint(self, expr: Felt):
        v = np.asarray(expr.v)
        if v.ndim == 1:
            v = v[None, :]
        bad = np.nonzero(np.any(v != 0, axis=-1))[0]
        if len(bad):
            self.failures.append((self._count, bad[:8].tolist()))
        self._count += 1

    def finalize_logup(self):
        n = self.n_rows
        is_first = np.zeros(n, dtype=np.uint32)
        is_first[0] = 1
        entries = self.relation_entries
        last = len(entries) - 1
        for b, e in enumerate(entries):
            col = Felt(self._inter[b])
            prev_entry = Felt(self._inter[b - 1]) if b > 0 else Felt.const(0)
            if b < last:
                c = (col - prev_entry) * e.denominator - e.numerator
            else:
                s_prev = Felt(np.roll(self._inter[b], 1, axis=0))
                c = (
                    (col - s_prev - prev_entry + Felt.from_m31(is_first) * Felt(self._claimed))
                    * e.denominator
                    - e.numerator
                )
            self.constraint(c)


def check_pie_constraints(pie, settings) -> Dict[str, List[tuple]]:
    """Returns {component: [(constraint_idx, bad_rows), ...]} for every
    constraint that does not vanish on the trace domain."""
    tables = {n: t for n, t in pie.trace_tables.items() if t.n_rows > 0}
    claim = LuminairClaim({n: t.log_size for n, t in tables.items()})
    layout = AirLayout(claim, settings)
    ch = Blake2sChannel()
    ch.mix_bytes(b"debug")
    elems = layout.draw_elements(ch)
    pp_cols = dict(zip(layout.pp.ids(), layout.pp.columns()))

    out = {}
    for c in layout.components:
        padded = tables[c.name].padded_columns(c.MAIN)
        wev = WitnessEval(padded, pp_cols)
        c.evaluate(wev, elems)
        inter, claimed = wev.build_interaction()
        chk = _CheckEval(padded, pp_cols, inter, claimed)
        c.evaluate(chk, elems)
        if chk.failures:
            out[c.name] = chk.failures
    return out
