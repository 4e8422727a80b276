"""AIR constraint framework: one `evaluate()` per component, three
interpreters.

A component defines its constraints once, against the `AirEval` API
(mirroring the role of stwo's FrameworkEval used by every reference
component, e.g. crates/air/src/components/add/component.rs:38-117):

    cols = ev.mains()                  # named main-trace columns
    ev.constraint(expr)                # expr must vanish on the trace
    ev.relation(elements, mult, vals)  # LogUp entry: mult / combine(vals)

The same definition is interpreted by:

  * WitnessEval  -- trace-domain arrays; collects relation entries and
    builds the interaction (LogUp prefix-sum) columns + claimed_sum;
  * DomainEval   -- evaluation-domain arrays (trace committed at blowup 1,
    so committed evals ARE the constraint-evaluation domain); accumulates
    sum(alpha^i * C_i) for the composition polynomial;
  * PointEval    -- OODS-sampled scalars; recomputes the same combination
    at the sample point for the verifier.

LogUp (reference semantics: crates/air/src/components/add/witness.rs
write_interaction_trace, one secure column per relation entry):
  column b carries the within-row chain S_b = S_{b-1} + n_b/d_b; the last
  column additionally carries the running prefix sum down the rows.
  Constraints:
    b < last: (S_b - S_{b-1}) * d_b - n_b = 0
    last:     (S - S_prev_row - S_{last-1} + is_first * claimed_sum) * d - n = 0
  Totalling over rows forces sum(fractions) = claimed_sum; the global
  LogUp check sums claimed_sums over all components to zero.
  "Previous row" is a cyclic roll on the trace/eval domain (circle.py row
  order) and an extra sample at z - G_n for the verifier.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from ..fields import m31, qm31

P64 = np.uint64(2**31 - 1)


class Felt:
    """A QM31 value -- scalar (4,) or column (N, 4)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    @staticmethod
    def from_m31(arr):
        xp = m31._xp(arr)
        return Felt(qm31.from_m31(xp.asarray(arr, dtype=xp.uint32), xp))

    @staticmethod
    def const(x: int):
        return Felt(qm31.from_ints(x))

    def _coerce(self, other):
        if isinstance(other, Felt):
            return other.v
        if isinstance(other, int):
            return qm31.from_ints(other)
        return other

    def __add__(self, other):
        return Felt(qm31.add(self.v, self._coerce(other)))

    __radd__ = __add__

    def __sub__(self, other):
        return Felt(qm31.sub(self.v, self._coerce(other)))

    def __rsub__(self, other):
        return Felt(qm31.sub(self._coerce(other), self.v))

    def __mul__(self, other):
        return Felt(qm31.mul(self.v, self._coerce(other)))

    __rmul__ = __mul__

    def __neg__(self):
        return Felt(qm31.neg(self.v))


class LookupElements:
    """Channel-drawn (z, alpha) pair; combine(values) = sum alpha^i v_i - z.

    Matches the reference's relation!(NodeElements, 2) and LUT relations
    (crates/air/src/components/mod.rs:216, lookups/sin/mod.rs:17)."""

    def __init__(self, z, alpha, size: int):
        self.z = z  # (4,) qm31
        self.alpha = alpha
        self.size = size
        self._alpha_pows = [qm31.from_ints(1)]
        for _ in range(size - 1):
            self._alpha_pows.append(qm31.mul(self._alpha_pows[-1], alpha))

    @classmethod
    def draw(cls, channel, size: int):
        z = channel.draw_felt()
        alpha = channel.draw_felt()
        return cls(z, alpha, size)

    def combine(self, values: List[Felt]) -> Felt:
        assert len(values) == self.size
        acc = qm31.neg(self.z)
        for i, v in enumerate(values):
            vv = v.v if isinstance(v, Felt) else v
            acc = qm31.add(acc, qm31.mul(vv, self._alpha_pows[i]))
        return Felt(acc)


@dataclass
class RelationEntry:
    numerator: Felt  # multiplicity (may be negative / extension)
    denominator: Felt  # combine(values)


class AirEval:
    """Base interpreter: records constraints and relation entries."""

    def __init__(self):
        self.relation_entries: List[RelationEntry] = []

    # -- component-facing API --------------------------------------------

    def main(self, name: str) -> Felt:
        raise NotImplementedError

    def main_next(self, name: str) -> Felt:
        """The column's value at the NEXT row (cyclic).  Columns read this
        way must be declared in the component's MAIN_NEXT list (the
        verifier samples them at z + G_n).  This is the row-linking mask
        the reference lacks: its next_* columns are free witness columns,
        so its running reductions never bind across rows (sum_reduce/
        component.rs:69-70, max_reduce/component.rs:66-81)."""
        raise NotImplementedError

    def preprocessed(self, pp_id: str) -> Felt:
        raise NotImplementedError

    def constraint(self, expr: Felt):
        raise NotImplementedError

    def relation(self, elements: LookupElements, mult: Felt, values: List[Felt]):
        self.relation_entries.append(
            RelationEntry(numerator=mult, denominator=elements.combine(values))
        )

    def one(self):
        return Felt.const(1)

    def const(self, x: int):
        return Felt.const(x)


class WitnessEval(AirEval):
    """Runs on trace-domain arrays to build the interaction trace."""

    def __init__(self, main_cols: Dict[str, np.ndarray], preprocessed_cols: Dict[str, np.ndarray]):
        super().__init__()
        self._main = main_cols
        self._pp = preprocessed_cols
        n = len(next(iter(main_cols.values()))) if main_cols else len(next(iter(preprocessed_cols.values())))
        self.n_rows = n

    def main(self, name: str) -> Felt:
        return Felt.from_m31(self._main[name])

    def main_next(self, name: str) -> Felt:
        arr = self._main[name]
        return Felt.from_m31(m31._xp(arr).roll(arr, -1, axis=0))

    def preprocessed(self, pp_id: str) -> Felt:
        return Felt.from_m31(self._pp[pp_id])

    def constraint(self, expr: Felt):
        pass  # witness generation ignores constraints

    def finalize_logup(self):
        pass  # interaction columns are built separately via build_interaction

    def build_interaction(self):
        """Returns (interaction_cols [(N,4) qm31 per entry], claimed_sum)."""
        n = self.n_rows
        fracs = []
        for e in self.relation_entries:
            num = e.numerator.v
            den = e.denominator.v
            xp = m31._xp(num, den)
            if num.ndim == 1:
                num = xp.broadcast_to(num, (n, 4))
            f = qm31.mul(num, qm31.inv(den))
            fracs.append(f)
        cols = []
        row_acc = qm31.zero((n,), m31._xp(*[f for f in fracs]))
        for f in fracs:
            row_acc = qm31.add(row_acc, f)
            cols.append(row_acc)
        # Last column: prefix sum down the rows.
        xp = m31._xp(row_acc)
        if xp is np:
            S = (np.cumsum(row_acc.astype(np.uint64), axis=0) % P64).astype(np.uint32)
        else:
            # uint64 is unavailable on TPU: modular associative scan instead.
            import jax

            S = jax.lax.associative_scan(m31.add, row_acc, axis=0)
        cols[-1] = S
        claimed_sum = S[-1]
        return cols, claimed_sum


class ConstraintAccumulator:
    """Shared alpha-power bookkeeping for Domain/Point evaluators."""

    def __init__(self, alpha, shape):
        self.alpha = alpha
        self.acc = qm31.zero(shape, np)
        self._pow = qm31.from_ints(1)

    def add(self, expr: Felt):
        v = expr.v
        xp = m31._xp(v, self.acc, self._pow)
        if v.shape != self.acc.shape:
            v = xp.broadcast_to(v, self.acc.shape)
        self.acc = qm31.add(self.acc, qm31.mul(v, xp.broadcast_to(xp.asarray(self._pow), v.shape)))
        self._pow = qm31.mul(self._pow, self.alpha)


class DomainEval(AirEval):
    """Vectorized constraint evaluation on the component's eval domain
    (= its commit domain at blowup 1)."""

    def __init__(
        self,
        main_evals: Dict[str, np.ndarray],
        pp_evals: Dict[str, np.ndarray],
        interaction_evals: List[np.ndarray],  # (M,4) per relation entry
        is_first_evals: np.ndarray,
        claimed_sum,
        accumulator: ConstraintAccumulator,
        roll_stride: int,
    ):
        super().__init__()
        self._main = main_evals
        self._pp = pp_evals
        self._inter = interaction_evals
        self._is_first = is_first_evals
        self._claimed = claimed_sum
        self._acc = accumulator
        self._roll = roll_stride

    def main(self, name: str) -> Felt:
        return Felt.from_m31(self._main[name])

    def main_next(self, name: str) -> Felt:
        # Next row = translation by +G_n = cyclic roll by -stride on the
        # eval domain (inverse of the prev-row roll used by finalize_logup).
        arr = self._main[name]
        return Felt.from_m31(m31._xp(arr).roll(arr, -self._roll, axis=0))

    def preprocessed(self, pp_id: str) -> Felt:
        return Felt.from_m31(self._pp[pp_id])

    def constraint(self, expr: Felt):
        self._acc.add(expr)

    def finalize_logup(self):
        entries = self.relation_entries
        last = len(entries) - 1
        is_first = Felt.from_m31(self._is_first)
        claimed = Felt(self._claimed)
        for b, e in enumerate(entries):
            col = Felt(self._inter[b])
            prev_entry = Felt(self._inter[b - 1]) if b > 0 else Felt.const(0)
            if b < last:
                c = (col - prev_entry) * e.denominator - e.numerator
            else:
                s_prev = Felt(m31._xp(self._inter[b]).roll(self._inter[b], self._roll, axis=0))
                c = (
                    (col - s_prev - prev_entry + is_first * claimed) * e.denominator
                    - e.numerator
                )
            self._acc.add(c)


class PointEval(AirEval):
    """Scalar evaluation at the OODS point for the verifier."""

    def __init__(
        self,
        main_values: Dict[str, np.ndarray],
        pp_values: Dict[str, np.ndarray],
        interaction_values: List[np.ndarray],  # value at z per entry
        interaction_prev_value: np.ndarray,  # last entry's value at z - G_n
        is_first_value: np.ndarray,
        claimed_sum,
        accumulator: ConstraintAccumulator,
        main_next_values: Dict[str, np.ndarray] = None,  # values at z + G_n
    ):
        super().__init__()
        self._main = main_values
        self._pp = pp_values
        self._inter = interaction_values
        self._inter_prev = interaction_prev_value
        self._is_first = is_first_value
        self._claimed = claimed_sum
        self._acc = accumulator
        self._main_next = main_next_values or {}

    def main(self, name: str) -> Felt:
        return Felt(np.asarray(self._main[name], dtype=np.uint32))

    def main_next(self, name: str) -> Felt:
        return Felt(np.asarray(self._main_next[name], dtype=np.uint32))

    def preprocessed(self, pp_id: str) -> Felt:
        return Felt(np.asarray(self._pp[pp_id], dtype=np.uint32))

    def constraint(self, expr: Felt):
        self._acc.add(expr)

    def finalize_logup(self):
        entries = self.relation_entries
        last = len(entries) - 1
        is_first = Felt(np.asarray(self._is_first, dtype=np.uint32))
        claimed = Felt(self._claimed)
        for b, e in enumerate(entries):
            col = Felt(np.asarray(self._inter[b], dtype=np.uint32))
            prev_entry = (
                Felt(np.asarray(self._inter[b - 1], dtype=np.uint32))
                if b > 0
                else Felt.const(0)
            )
            if b < last:
                c = (col - prev_entry) * e.denominator - e.numerator
            else:
                s_prev = Felt(np.asarray(self._inter_prev, dtype=np.uint32))
                c = (
                    (col - s_prev - prev_entry + is_first * claimed) * e.denominator
                    - e.numerator
                )
            self._acc.add(c)
