"""Device-resident trace generation: the whole graph interpreter traced
into ONE XLA program.

The host interpreter (trace.py ``_run``) is the spec; this module replays
the same per-op logic with jax.numpy int64 inside a single jit, so every
trace column is born in HBM and the PIE never crosses the host boundary
before proving (SURVEY §7.4 maps the reference's per-element hot loop,
crates/graph/src/op/prim.rs:952-961, to on-device gathers as speedup
source #1).  Bit-exactness vs the host PIE is asserted by
tests/test_device_trace.py.

Design rules:
  * No float math on device.  Function inputs are fixed-encoded on the
    host (tiny); sin/exp2/log2 outputs come from gathers into the
    settings' LUT value table -- the same values phase 0 commits -- so the
    transcendental is evaluated once per LUT entry on the host instead of
    once per element (reference prim.rs:444-553 evaluates per element).
  * int64 end-to-end (jax_enable_x64): the TPU executes S64
    add/mul/div/mod/cumsum/cummax bit-exactly (measured); the only
    estimate is f64 sqrt, clamped to exact isqrt in fixed.sqrt.
  * Everything is static: shapes, views, LUT layouts, multiplicity
    scalars.  One compile per (graph, settings) pair, persistently cached.

The settings pre-pass (gen_circuit_settings_device) cannot use LUT gathers
(the LUTs don't exist yet), so it runs the graph in SEGMENTS split at
sin/exp2/log2 nodes: each segment is one jit; at the boundary the gathered
LUT input is downloaded (activations are small), f is applied on the host
in float64 -- identical to the host pre-pass -- and the result re-uploaded
for the next segment.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import numpy as np

from .. import fixed
from ..air.pie import ExecutionResources, LuminairPie, Metadata, TraceTable
from ..air.settings import CircuitSettings, Lookups
from ..air.preprocessed import LookupLayout, Range, coalesce_ranges, finalize_lookups
from ..errors import LuminairError
from .graph import Graph
from .trace import NEG1, RANGE_MARGIN

_LUT_OPS = ("sin", "exp2", "log2")
_LUT_FNS = {
    "sin": np.sin,
    "exp2": np.exp2,
    "log2": lambda x: np.log2(np.maximum(x, 1e-300)),
}
_P_MOD = (1 << 31) - 1


def enable_x64():
    import jax

    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)


# Ops the device interpreter can execute (both the trace and settings
# segments).  Graphs containing anything else fall back to the host
# interpreter -- a new op works end-to-end before its device branch lands
# (docs/contribute/add-ops.md §3b).
DEVICE_OPS = frozenset(
    "add mul rem less_than recip square sqrt sin exp2 log2 contiguous "
    "sum_reduce max_reduce copy_to copy_from constant function cse_merged".split()
)


def supports(graph: Graph) -> bool:
    return all(n.op in DEVICE_OPS for n in graph.nodes)


def estimated_rows(graph: Graph) -> int:
    """Static bound on total trace rows (decides host vs device trace gen)."""
    total = 0
    for node in graph.nodes:
        if node.op in ("function", "copy_from", "cse_merged"):
            continue
        if node.op in ("sum_reduce", "max_reduce") and node.srcs:
            total += node.srcs[0][1].n_elements
        elif node.op == "contiguous" and node.srcs:
            src_id, view = node.srcs[0]
            total += max(graph.nodes[src_id].out_len, view.n_elements)
        else:
            total += node.out_len
    return total


def _append(n: int, jnp, **cols) -> dict:
    """Device mirror of trace._TableBuilder.append: scalars broadcast to n,
    everything cast to uint32."""
    blk = {}
    for k, v in cols.items():
        if np.ndim(v) == 0:
            blk[k] = jnp.full(n, v, dtype=jnp.uint32)
        else:
            blk[k] = v.astype(jnp.uint32)
    return blk


def _common(nid: int, n: int, extra_ids: dict, jnp) -> dict:
    idx = jnp.arange(n, dtype=jnp.uint32)
    is_last = (idx == n - 1).astype(jnp.uint32)
    cols = dict(
        node_id=np.uint32(nid),
        idx=idx,
        is_last_idx=is_last,
        next_node_id=np.uint32(nid),
        next_idx=idx + 1,
    )
    for k, v in extra_ids.items():
        cols[k] = np.uint32(v)
        cols["next_" + k] = np.uint32(v)
    return cols


class _Tracer:
    """One compiled trace-generation program for a (graph, settings) pair."""

    def __init__(self, graph: Graph, settings: CircuitSettings):
        import jax

        self.graph = graph
        self.settings = settings
        self.order = graph.toposort()
        consumed = graph.consumers()
        self.input_ids = [
            n.id for n in graph.nodes if n.op == "function" and consumed[n.id] > 0
        ]
        # Static LUT output tables (raw int64 fixed f(x) per layout entry --
        # the same values LutPreProcessed.table_values commits in phase 0).
        self.lut_outs = {}
        self.lut_sizes = {}
        for kind in _LUT_OPS:
            layout = getattr(settings.lookups, kind)
            if layout is not None:
                if layout.outputs is not None:  # normative table bytes
                    self.lut_outs[kind] = np.asarray(layout.outputs, dtype=np.int64)
                else:  # legacy settings without shipped outputs
                    vals = layout.all_values()
                    self.lut_outs[kind] = fixed.from_float(
                        _LUT_FNS[kind](fixed.to_float(vals))
                    )
                self.lut_sizes[kind] = 1 << layout.log_size
        self.rc_bits = settings.lookups.range_check_bits
        # Static op counter (mirrors the host interpreter's bookkeeping).
        self.op_counter: Dict[str, int] = defaultdict(int)
        for nid in self.order:
            op = graph.nodes[nid].op
            if op in ("copy_to", "constant"):
                self.op_counter["inputs"] += 1
            elif op not in ("function", "copy_from"):
                self.op_counter[op] += 1
        self.fn = jax.jit(self._traced)

    def _out_mult(self, nid: int):
        return np.uint32(self.graph.expansion_adjusted_consumers(nid) % _P_MOD)

    def _traced(self, inputs: dict, lut_outs: dict):
        import jax.numpy as jnp
        from jax import lax

        g = self.graph
        buffers: Dict[int, object] = {}
        blocks: Dict[str, List[dict]] = defaultdict(list)
        lut_mults = {
            k: jnp.zeros(self.lut_sizes[k], dtype=jnp.int64) for k in self.lut_outs
        }
        rc_mults = (
            jnp.zeros(1 << self.rc_bits, dtype=jnp.int64) if self.rc_bits else None
        )
        lut_bad = {k: jnp.zeros((), dtype=bool) for k in self.lut_outs}

        for nid in self.order:
            node = g.nodes[nid]
            op = node.op
            srcs = [(buffers.get(s), v) for s, v in node.srcs]

            if op == "function":
                continue

            if op == "copy_to":
                data = inputs[str(node.srcs[0][0])]
                buffers[nid] = data
                n = int(data.shape[0])
                cols = _common(nid, n, {}, jnp)
                cols["val"] = fixed.to_m31(data)
                cols["multiplicity"] = self._out_mult(nid)
                blocks["inputs"].append(_append(n, jnp, **cols))
                continue

            if op == "constant":
                data = jnp.asarray(
                    fixed.from_float(np.array([node.params["value"]]))
                )
                buffers[nid] = data
                cols = _common(nid, 1, {}, jnp)
                cols["val"] = fixed.to_m31(data)
                cols["multiplicity"] = self._out_mult(nid)
                blocks["inputs"].append(_append(1, jnp, **cols))
                continue

            if op == "copy_from":
                buffers[nid] = buffers[node.srcs[0][0]]
                continue

            if op in ("add", "mul", "rem", "less_than"):
                (abuf, av), (bbuf, bv) = srcs
                lhs = av.gather(abuf, jnp)
                rhs = bv.gather(bbuf, jnp)
                n = av.n_elements
                ids = {"lhs_id": node.srcs[0][0], "rhs_id": node.srcs[1][0]}
                if op == "add":
                    out = fixed.add(lhs, rhs)
                    extra = {}
                elif op == "mul":
                    out, rem = fixed.mul(lhs, rhs)
                    extra = {"rem": fixed.to_m31(rem)}
                elif op == "rem":
                    quot, out = fixed.div_rem(lhs, rhs)
                    extra = {"quotient": fixed.to_m31(quot)}
                else:  # less_than
                    out, borrow, diff = fixed.less_than(lhs, rhs)
                    diff_u32 = diff.astype(jnp.uint64).astype(jnp.uint32)
                    extra = {
                        "borrow": borrow.astype(jnp.uint32),
                        "diff": fixed.to_m31(diff),
                        "limb0": diff_u32 & 0xFF,
                        "limb1": (diff_u32 >> 8) & 0xFF,
                        "limb2": (diff_u32 >> 16) & 0xFF,
                        "limb3": (diff_u32 >> 24) & 0xFF,
                    }
                    if rc_mults is not None:
                        for k in ("limb0", "limb1", "limb2", "limb3"):
                            rc_mults = rc_mults.at[extra[k].astype(jnp.int32)].add(1)
                buffers[nid] = out
                cols = _common(nid, n, ids, jnp)
                cols["lhs"] = fixed.to_m31(lhs)
                cols["rhs"] = fixed.to_m31(rhs)
                if op == "rem":
                    cols["rem"] = fixed.to_m31(out)
                else:
                    cols["out"] = fixed.to_m31(out)
                cols.update(extra)
                cols["lhs_mult"] = NEG1
                cols["rhs_mult"] = NEG1
                cols["out_mult"] = self._out_mult(nid)
                if op == "less_than":
                    cols["range_check_mult"] = np.uint32(1)
                blocks[op].append(_append(n, jnp, **cols))

            elif op in ("recip", "square", "sqrt", "sin", "exp2", "log2", "contiguous"):
                buf, view = srcs[0]
                inp = view.gather(buf, jnp)
                ids = {"input_id": node.srcs[0][0]}
                if op == "recip":
                    out, rem = fixed.recip(inp)
                    extra = {
                        "rem": fixed.to_m31(rem),
                        "scale": np.uint32(1 << fixed.DEFAULT_FP_SCALE),
                    }
                elif op == "square":
                    out, rem = fixed.square(inp)
                    extra = {"rem": fixed.to_m31(rem)}
                elif op == "sqrt":
                    out, rem = fixed.sqrt(inp)
                    extra = {
                        "rem": fixed.to_m31(rem),
                        "scale": np.uint32(1 << fixed.DEFAULT_FP_SCALE),
                    }
                elif op in _LUT_OPS:
                    layout = getattr(self.settings.lookups, op)
                    pos = layout.find_index(inp, jnp)
                    lut_bad[op] = lut_bad[op] | jnp.any(pos < 0)
                    posc = jnp.clip(pos, 0, lut_outs[op].shape[0] - 1)
                    out = lut_outs[op][posc]
                    extra = {"lookup_mult": np.uint32(1)}
                    lut_mults[op] = lut_mults[op].at[posc].add(1)
                else:  # contiguous
                    out = inp
                    extra = None
                if op == "contiguous":
                    n_in = int(buf.shape[0])
                    n_out = int(inp.shape[0])
                    n = max(n_in, n_out)
                    raw = jnp.zeros(n, dtype=jnp.int64).at[:n_in].set(buf)
                    gathered = jnp.zeros(n, dtype=jnp.int64).at[:n_out].set(inp)
                    factor = view.expansion_factor()
                    imult = np.uint32((_P_MOD - factor) % _P_MOD)
                    rows = jnp.arange(n, dtype=jnp.uint32)
                    input_mult = jnp.where(rows < n_in, imult, np.uint32(0))
                    om = jnp.where(rows < n_out, self._out_mult(nid), np.uint32(0))
                    buffers[nid] = out
                    cols = _common(nid, n, ids, jnp)
                    cols["input"] = fixed.to_m31(raw)
                    cols["out"] = fixed.to_m31(gathered)
                    cols["input_mult"] = input_mult
                    cols["out_mult"] = om
                    blocks["contiguous"].append(_append(n, jnp, **cols))
                else:
                    buffers[nid] = out
                    n = view.n_elements
                    cols = _common(nid, n, ids, jnp)
                    cols["input"] = fixed.to_m31(inp)
                    cols["out"] = fixed.to_m31(out)
                    cols.update(extra)
                    cols["input_mult"] = NEG1
                    cols["out_mult"] = self._out_mult(nid)
                    blocks[op].append(_append(n, jnp, **cols))

            elif op in ("sum_reduce", "max_reduce"):
                buf, view = srcs[0]
                dim = node.params["dim"]
                sh = view.shape
                front = int(np.prod(sh[:dim])) if dim > 0 else 1
                dsize = sh[dim]
                back = int(np.prod(sh[dim + 1 :])) if dim + 1 < len(sh) else 1
                vals = view.gather(buf, jnp).reshape(front, dsize, back)
                v = jnp.moveaxis(vals, 1, 2)
                flat = v.reshape(-1, dsize)
                n_rows = front * back * dsize
                out_idx = jnp.repeat(
                    jnp.arange(front * back, dtype=jnp.uint32), dsize
                )
                is_last_step = jnp.tile(
                    (jnp.arange(dsize) == dsize - 1).astype(jnp.uint32),
                    front * back,
                )
                if op == "sum_reduce":
                    inc = jnp.cumsum(flat, axis=1)
                    acc = inc - flat
                    nxt = inc
                    outv = inc[:, -1]
                    extra_names = ("acc", "next_acc")
                else:
                    run = lax.cummax(flat, axis=1)
                    acc = jnp.concatenate([flat[:, :1], run[:, :-1]], axis=1)
                    nxt = run
                    outv = run[:, -1]
                    is_max = (flat > acc).astype(jnp.uint32).reshape(-1)
                    extra_names = ("max_val", "next_max_val")
                    # >= witness limbs (see MaxReduceComponent / trace.py).
                    loser = jnp.where(flat > acc, acc, flat)
                    ge_d = (nxt - loser).reshape(-1)
                    lut_bad["max_reduce_range"] = lut_bad.get(
                        "max_reduce_range", jnp.zeros((), dtype=bool)
                    ) | jnp.any((ge_d < 0) | (ge_d >= 1 << 30))
                    ge_u32 = ge_d.astype(jnp.uint32)
                buffers[nid] = outv
                om = self._out_mult(nid)
                out_col = jnp.where(
                    is_last_step.astype(bool),
                    jnp.repeat(fixed.to_m31(outv), dsize),
                    np.uint32(0),
                ).astype(jnp.uint32)
                cols = dict(
                    node_id=np.uint32(nid),
                    input_id=np.uint32(node.srcs[0][0]),
                    idx=out_idx,
                    is_last_idx=(out_idx == front * back - 1).astype(jnp.uint32),
                    next_node_id=np.uint32(nid),
                    next_input_id=np.uint32(node.srcs[0][0]),
                    next_idx=out_idx + 1,
                    input=fixed.to_m31(flat.reshape(-1)),
                    out=out_col,
                )
                cols[extra_names[0]] = fixed.to_m31(acc.reshape(-1))
                cols[extra_names[1]] = fixed.to_m31(nxt.reshape(-1))
                if op == "max_reduce":
                    cols["is_max"] = is_max
                    cols["ge_limb0"] = ge_u32 & 0xFF
                    cols["ge_limb1"] = (ge_u32 >> 8) & 0xFF
                    cols["ge_limb2"] = (ge_u32 >> 16) & 0xFF
                    cols["ge_limb3"] = (ge_u32 >> 24) & 0x3F
                    cols["range_check_mult"] = np.uint32(1)
                    if rc_mults is not None:
                        for limb in (
                            cols["ge_limb0"],
                            cols["ge_limb1"],
                            cols["ge_limb2"],
                            cols["ge_limb3"] * 4,
                        ):
                            rc_mults = rc_mults.at[limb.astype(jnp.int32)].add(1)
                cols["is_last_step"] = is_last_step
                cols["input_mult"] = NEG1
                cols["out_mult"] = (is_last_step * om).astype(jnp.uint32)
                blocks[op].append(_append(n_rows, jnp, **cols))
            else:
                raise LuminairError(f"unknown op {op}")

        tables = {
            name: {
                k: (
                    jnp.concatenate([b[k] for b in blks])
                    if len(blks) > 1
                    else blks[0][k]
                )
                for k in blks[0]
            }
            for name, blks in blocks.items()
        }
        outs = {str(rid): buffers[rid] for rid in g.to_retrieve}
        return tables, outs, lut_mults, rc_mults, lut_bad


def _tracer_for(graph: Graph, settings: CircuitSettings) -> _Tracer:
    cache = graph.__dict__.setdefault("_device_tracers", {})
    key = id(settings)
    if key not in cache:
        cache[key] = _Tracer(graph, settings)
    return cache[key]


def gen_trace_device(graph: Graph, settings: CircuitSettings) -> LuminairPie:
    """Device-resident gen_trace: one jit call; PIE columns stay in HBM."""
    enable_x64()
    import jax.numpy as jnp

    if not graph.compiled:
        graph.compile()
    tracer = _tracer_for(graph, settings)
    inputs = {
        str(nid): jnp.asarray(
            fixed.from_float(
                graph.input_data.get(
                    nid, np.zeros(graph.nodes[nid].out_len, dtype=np.float64)
                )
            )
        )
        for nid in tracer.input_ids
    }
    lut_dev = {k: jnp.asarray(v) for k, v in tracer.lut_outs.items()}
    tables_d, outs_d, lut_m, rc_m, bads = tracer.fn(inputs, lut_dev)

    if bads:
        flags = np.asarray(jnp.stack(list(bads.values())))
        for kind, bad in zip(bads.keys(), flags):
            if bad:
                if kind == "max_reduce_range":
                    raise LuminairError(
                        "max_reduce step difference outside [0, 2^30) -- "
                        "fixed-point values exceed the provable range"
                    )
                raise LuminairError(f"{kind} input outside LUT range")

    trace_tables = {}
    for name, cols in tables_d.items():
        trace_tables[name] = TraceTable(name, dict(cols))
    for kind, m in lut_m.items():
        trace_tables[f"{kind}_lookup"] = TraceTable(
            f"{kind}_lookup", {"multiplicity": m.astype(jnp.uint32)}
        )
    if rc_m is not None:
        trace_tables["range_check_lookup"] = TraceTable(
            "range_check_lookup", {"multiplicity": rc_m.astype(jnp.uint32)}
        )

    # Outputs: the only download (tiny -- retrieved tensors).
    graph.output_data = {}
    for rid_s, dbuf in outs_d.items():
        rid = int(rid_s)
        node = graph.nodes[rid]
        data = fixed.to_float(np.asarray(dbuf))
        graph.output_data[rid] = data
        if node.op == "copy_from":
            src = node.srcs[0][0]
            graph.output_data[src] = data
            if graph.nodes[src].op == "copy_to":
                graph.output_data[graph.nodes[src].srcs[0][0]] = data

    max_log = max(t.log_size for t in trace_tables.values())
    return LuminairPie(
        trace_tables=trace_tables,
        metadata=Metadata(ExecutionResources(dict(tracer.op_counter), max_log)),
    )


# ---------------------------------------------------------------------------
# Settings pre-pass (segmented at LUT nodes)
# ---------------------------------------------------------------------------


def _segment_fn(graph: Graph, seg_nodes: tuple, lut_nid):
    """Jitted executor for one segment: computes seg_nodes' buffers from
    (external buffers, fixed inputs); if lut_nid is set, additionally
    returns that node's gathered input and its raw source buffer min/max."""
    import jax

    def run(ext: dict, inputs: dict):
        import jax.numpy as jnp

        buffers = {int(k): v for k, v in ext.items()}
        for nid in seg_nodes:
            node = graph.nodes[nid]
            op = node.op
            if op == "function":
                continue
            if op == "copy_to":
                buffers[nid] = inputs[str(node.srcs[0][0])]
                continue
            if op == "constant":
                buffers[nid] = jnp.asarray(
                    fixed.from_float(np.array([node.params["value"]]))
                )
                continue
            if op == "copy_from":
                buffers[nid] = buffers[node.srcs[0][0]]
                continue
            srcs = [(buffers[s], v) for s, v in node.srcs]
            if op in ("add", "mul", "rem", "less_than"):
                (abuf, av), (bbuf, bv) = srcs
                lhs, rhs = av.gather(abuf, jnp), bv.gather(bbuf, jnp)
                if op == "add":
                    buffers[nid] = fixed.add(lhs, rhs)
                elif op == "mul":
                    buffers[nid] = fixed.mul(lhs, rhs)[0]
                elif op == "rem":
                    buffers[nid] = fixed.div_rem(lhs, rhs)[1]
                else:
                    buffers[nid] = fixed.less_than(lhs, rhs)[0]
            elif op in ("recip", "square", "sqrt", "contiguous"):
                buf, view = srcs[0]
                inp = view.gather(buf, jnp)
                if op == "recip":
                    buffers[nid] = fixed.recip(inp)[0]
                elif op == "square":
                    buffers[nid] = fixed.square(inp)[0]
                elif op == "sqrt":
                    buffers[nid] = fixed.sqrt(inp)[0]
                else:
                    buffers[nid] = inp
            elif op in ("sum_reduce", "max_reduce"):
                buf, view = srcs[0]
                dim = node.params["dim"]
                sh = view.shape
                front = int(np.prod(sh[:dim])) if dim > 0 else 1
                dsize = sh[dim]
                back = int(np.prod(sh[dim + 1 :])) if dim + 1 < len(sh) else 1
                vals = view.gather(buf, jnp).reshape(front, dsize, back)
                if op == "sum_reduce":
                    buffers[nid] = jnp.sum(vals, axis=1).reshape(-1)
                else:
                    buffers[nid] = jnp.max(vals, axis=1).reshape(-1)
            else:
                raise LuminairError(f"unknown op {op} in settings segment")
        produced = {str(nid): buffers[nid] for nid in seg_nodes if nid in buffers}
        boundary = None
        if lut_nid is not None:
            node = graph.nodes[lut_nid]
            sbuf = buffers[node.srcs[0][0]]
            inp = node.srcs[0][1].gather(sbuf, jnp)
            boundary = (inp, jnp.min(sbuf), jnp.max(sbuf))
        return produced, boundary

    return jax.jit(run)


def gen_circuit_settings_device(graph: Graph) -> CircuitSettings:
    """Device pre-pass: LUT value-range discovery (reference graph.rs:61-159)
    with all tensor compute on device; only LUT-op inputs (activations)
    cross to the host, where f is applied in float64 exactly as the host
    pre-pass does."""
    enable_x64()
    import jax.numpy as jnp

    if not graph.compiled:
        graph.compile()
    order = graph.toposort()
    segments = []
    cur: List[int] = []
    for nid in order:
        if graph.nodes[nid].op in _LUT_OPS:
            segments.append((tuple(cur), nid))
            cur = []
        else:
            cur.append(nid)
    segments.append((tuple(cur), None))

    cache = graph.__dict__.setdefault("_settings_segments", {})
    consumed = graph.consumers()
    inputs = {
        str(n.id): jnp.asarray(
            fixed.from_float(
                graph.input_data.get(
                    n.id, np.zeros(n.out_len, dtype=np.float64)
                )
            )
        )
        for n in graph.nodes
        if n.op == "function" and consumed[n.id] > 0
    }

    ranges = {"sin": [], "exp2": [], "log2": []}
    dev_buffers: Dict[str, object] = {}
    for i, (seg_nodes, lut_nid) in enumerate(segments):
        key = (i, seg_nodes, lut_nid)
        if key not in cache:
            cache[key] = _segment_fn(graph, seg_nodes, lut_nid)
        ext = {
            str(s): dev_buffers[str(s)]
            for nid in seg_nodes + ((lut_nid,) if lut_nid is not None else ())
            for s, _ in graph.nodes[nid].srcs
            if str(s) in dev_buffers
        }
        produced, boundary = cache[key](ext, inputs)
        dev_buffers.update(produced)
        if lut_nid is not None:
            op = graph.nodes[lut_nid].op
            inp_d, mn_d, mx_d = boundary
            inp = np.asarray(inp_d)
            lo, hi = fixed.to_float(np.asarray(mn_d)), fixed.to_float(np.asarray(mx_d))
            span = hi - lo
            delta = span * RANGE_MARGIN
            ranges[op].append(
                Range(
                    int(fixed.from_float(lo - delta)),
                    int(fixed.from_float(hi + delta)),
                )
            )
            out = fixed.from_float(_LUT_FNS[op](fixed.to_float(inp)))
            dev_buffers[str(lut_nid)] = jnp.asarray(out)

    lk = Lookups()
    for kind in _LUT_OPS:
        if ranges[kind]:
            setattr(lk, kind, LookupLayout(coalesce_ranges(ranges[kind])))
    if any(n.op in ("less_than", "max_reduce") for n in graph.nodes):
        lk.range_check_bits = 8
    finalize_lookups(lk)  # normative LUT output bytes (see preprocessed.py)
    return CircuitSettings(lookups=lk)
