"""LuminairPie: the serializable artifact between trace generation and
proving (reference: crates/air/src/pie.rs).

Trace tables are column-oriented uint32 (M31) arrays -- the TPU-native
layout: each column is one contiguous HBM buffer, appended per graph node
during trace generation and padded to a power of two at proving time.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np

from .preprocessed import calculate_log_size


#: padding value per column name (default 0) -- padding rows must satisfy
#: all constraints (reference <op>/table.rs `padding()`: zeros with
#: is_last_idx = 1).
_PADDING_ONES = {"is_last_idx"}

#: per-table overrides: less_than pads with a *valid* comparison row
#: (0 < 1 -> out = 1.0 fixed, diff = 1, limb0 = 1; reference
#: less_than/table.rs padding()) because the all-zeros row would violate
#: out = (1 - borrow) * 2^12.
_PADDING_OVERRIDES = {
    "less_than": {"rhs": 1, "out": 1 << 12, "diff": 1, "limb0": 1},
    # Reductions pad is_last_step = 1 so the cross-row continuity masks
    # (acc / max_val chains) are released on padding rows and the cyclic
    # wrap re-anchors row 0 as a segment start.
    "sum_reduce": {"is_last_step": 1},
    "max_reduce": {"is_last_step": 1},
}


@dataclass
class TraceTable:
    name: str
    columns: Dict[str, np.ndarray]

    @property
    def n_rows(self) -> int:
        if not self.columns:
            return 0
        return len(next(iter(self.columns.values())))

    @property
    def log_size(self) -> int:
        return calculate_log_size(self.n_rows)

    def padded_columns(self, col_order: List[str]) -> Dict[str, np.ndarray]:
        n = self.n_rows
        size = 1 << self.log_size
        out = {}
        overrides = _PADDING_OVERRIDES.get(self.name, {})
        for name in col_order:
            col = self.columns[name]
            pad_val = overrides.get(name, 1 if name in _PADDING_ONES else 0)
            if isinstance(col, np.ndarray):
                col = np.asarray(col, dtype=np.uint32)
                padded = np.full(size, pad_val, dtype=np.uint32)
                padded[:n] = col
            else:
                # Device-resident column (device trace generation): pad in
                # HBM so the PIE never round-trips through the host.
                import jax.numpy as jnp

                padded = jnp.pad(
                    col.astype(jnp.uint32), (0, size - n), constant_values=pad_val
                )
            out[name] = padded
        return out

    def to_dict(self):
        return {
            "name": self.name,
            "columns": {k: np.asarray(v, dtype=np.uint32).tolist() for k, v in self.columns.items()},
        }

    @staticmethod
    def from_dict(d):
        return TraceTable(
            d["name"],
            {k: np.asarray(v, dtype=np.uint32) for k, v in d["columns"].items()},
        )


@dataclass
class InputInfo:
    id: int


@dataclass
class OutputInfo:
    is_final_output: bool


@dataclass
class NodeInfo:
    """Per-node metadata used during trace generation (reference
    pie.rs:173-210): inputs, final-output flag, and the expansion-adjusted
    consumer count that balances the LogUp argument under broadcasting
    (graph.rs:220-243)."""

    inputs: List[InputInfo]
    output: OutputInfo
    num_consumers: int
    id: int


@dataclass
class ExecutionResources:
    op_counter: Dict[str, int] = field(default_factory=dict)
    max_log_size: int = 0

    def to_dict(self):
        return {"op_counter": dict(self.op_counter), "max_log_size": self.max_log_size}

    @staticmethod
    def from_dict(d):
        return ExecutionResources(dict(d["op_counter"]), int(d["max_log_size"]))


@dataclass
class Metadata:
    execution_resources: ExecutionResources

    def to_dict(self):
        return {"execution_resources": self.execution_resources.to_dict()}

    @staticmethod
    def from_dict(d):
        return Metadata(ExecutionResources.from_dict(d["execution_resources"]))


@dataclass
class LuminairPie:
    trace_tables: Dict[str, TraceTable]
    metadata: Metadata

    def to_dict(self):
        return {
            "trace_tables": {k: t.to_dict() for k, t in self.trace_tables.items()},
            "metadata": self.metadata.to_dict(),
        }

    @staticmethod
    def from_dict(d):
        return LuminairPie(
            {k: TraceTable.from_dict(t) for k, t in d["trace_tables"].items()},
            Metadata.from_dict(d["metadata"]),
        )
