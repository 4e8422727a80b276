// AIR layer of the web verifier: fixed-point LUT columns, the 17
// component constraint systems (OODS point evaluation only), and the
// deterministic trace layout — mirrors native/air.inc and
// luminair_tpu/air/{preprocessed,components,layout,framework}.py.

import {
  P, qAdd, qSub, qMul, qMulM31, qNeg, qZero, qOne, qFromM31,
} from './field.mjs';

// ---------------------------------------------------------------------------
// Fixed<12> numerics (numerair-equivalent; see SURVEY.md §1)
// ---------------------------------------------------------------------------

export const FP_SCALE = 12;
const FP_FACTOR = 4096.0;
const SAFE_MAX = 4611686018427387904.0; // 2^62

/** round-half-to-even of x*4096, nan->0, clipped to +/-2^62 (fixed.py). */
export function fixedFromNumber(x) {
  let scaled = roundTiesToEven(x * FP_FACTOR);
  if (Number.isNaN(scaled)) scaled = 0;
  if (scaled > SAFE_MAX) scaled = SAFE_MAX;
  if (scaled < -SAFE_MAX) scaled = -SAFE_MAX;
  return scaled;
}

function roundTiesToEven(x) {
  const r = Math.round(x); // half-away-from-zero for .5 (toward +inf)
  if (Math.abs(x % 1) === 0.5) return 2 * Math.round(x / 2);
  return r;
}

export function fixedToNumber(v) {
  return v / FP_FACTOR;
}

/** Signed fixed value -> M31 residue. Exact for |v| < 2^53; BigInt beyond. */
export function fixedToM31(v) {
  if (Number.isSafeInteger(v)) {
    let r = v % P;
    if (r < 0) r += P;
    return r;
  }
  let r = BigInt(Math.trunc(v)) % BigInt(P);
  if (r < 0n) r += BigInt(P);
  return Number(r);
}

// LUT function per kind (air/preprocessed.py _LUT_FNS).
//
// With settings v2 the output column comes from NORMATIVE table bytes in
// the settings (validated by validateLutOutputs below), so engine-libm
// last-ulp divergence no longer affects the preprocessed root.  lutFn is
// used for v1 (legacy recompute) settings and for the tolerance check.
function lutFn(kind, x) {
  switch (kind) {
    case 0:
      return Math.sin(x);
    case 1:
      return Math.pow(2, x);
    default:
      return Math.log2(x > 1e-300 ? x : 1e-300);
  }
}

const P_BIG = BigInt(P);

/** Signed BigInt fixed value -> M31 residue. */
function bigToM31(v) {
  let r = v % P_BIG;
  if (r < 0n) r += P_BIG;
  return Number(r);
}

/** Two columns (input, f(input)) over the coalesced ranges, zero padded. */
export function lutColumns(kind, layout) {
  const n = 1 << layout.logSize;
  const col0 = new Uint32Array(n);
  const col1 = new Uint32Array(n);
  const normative = layout.outputs != null;
  let i = 0;
  for (const rg of layout.ranges) {
    for (let v = rg.lo; v <= rg.hi && i < n; v++, i++) {
      col0[i] = fixedToM31(v);
      col1[i] = normative
        ? bigToM31(layout.outputs[i])
        : fixedToM31(fixedFromNumber(lutFn(kind, fixedToNumber(v))));
    }
  }
  return [col0, col1];
}

/**
 * Verify a shipped output table approximates f within tolerance (two fixed
 * steps + 2^-48 relative -- dwarfs cross-engine last-ulp noise).  The table
 * is part of the public statement; this bounds how far a malicious prover
 * can bend "sin".  Mirrors air/preprocessed.py validate_lut_outputs and
 * native/air.inc.  Returns true for v1 settings (column is recomputed).
 */
export function validateLutOutputs(kind, layout) {
  if (layout.outputs == null) return true;
  const TOL_REL = 2 ** -48;
  let i = 0;
  for (const rg of layout.ranges) {
    for (let v = rg.lo; v <= rg.hi; v++, i++) {
      let ys = lutFn(kind, fixedToNumber(v)) * FP_FACTOR;
      if (Number.isNaN(ys)) ys = 0;
      if (ys > SAFE_MAX) ys = SAFE_MAX;
      if (ys < -SAFE_MAX) ys = -SAFE_MAX;
      const tol = 2.0 + Math.abs(ys) * TOL_REL;
      if (Math.abs(Number(layout.outputs[i]) - ys) > tol) return false;
    }
  }
  return true;
}

// ---------------------------------------------------------------------------
// LogUp interaction elements
// ---------------------------------------------------------------------------

export class LookupElems {
  init(channel, size) {
    this.z = channel.drawFelt();
    this.alpha = channel.drawFelt();
    this.pows = [qOne()];
    for (let i = 1; i < size; i++) this.pows.push(qMul(this.pows[i - 1], this.alpha));
  }

  combine(vals) {
    let acc = qNeg(this.z);
    for (let i = 0; i < vals.length; i++) acc = qAdd(acc, qMul(vals[i], this.pows[i]));
    return acc;
  }
}

// ---------------------------------------------------------------------------
// Point evaluation context (framework.py PointEval + ConstraintAccumulator)
// ---------------------------------------------------------------------------

const Q_ONE = qOne();
const SCALE_M31 = 1 << FP_SCALE;
const M31_MAX_C = P; // 2^31 - 1 as a constant multiplier (== 0 mod P)

class PointEval {
  constructor(alpha, powRef, claimed) {
    this.main = new Map();
    this.mainNext = new Map(); // MAIN_NEXT columns at z + G_n
    this.pp = new Map();
    this.inter = [];
    this.interPrev = qZero();
    this.isFirst = qZero();
    this.claimed = claimed;
    this.alpha = alpha;
    this.powRef = powRef; // { v: QM31 } shared global alpha power
    this.acc = qZero();
    this.entries = []; // [numerator, denominator]
  }

  m(name) {
    const v = this.main.get(name);
    if (v === undefined) throw new Error(`missing main column ${name}`);
    return v;
  }

  mn(name) {
    const v = this.mainNext.get(name);
    if (v === undefined) throw new Error(`missing next-row column ${name}`);
    return v;
  }

  constraint(e) {
    this.acc = qAdd(this.acc, qMul(e, this.powRef.v));
    this.powRef.v = qMul(this.powRef.v, this.alpha);
  }

  relation(elems, mult, vals) {
    this.entries.push([mult, elems.combine(vals)]);
  }

  finalizeLogup() {
    const last = this.entries.length - 1;
    for (let b = 0; b < this.entries.length; b++) {
      const col = this.inter[b];
      const prevEntry = b > 0 ? this.inter[b - 1] : qZero();
      let c;
      if (b < last) {
        c = qSub(qMul(qSub(col, prevEntry), this.entries[b][1]), this.entries[b][0]);
      } else {
        let t = qSub(qSub(col, this.interPrev), prevEntry);
        t = qAdd(t, qMul(this.isFirst, this.claimed));
        c = qSub(qMul(t, this.entries[b][1]), this.entries[b][0]);
      }
      this.constraint(c);
    }
  }
}

export { PointEval };

function qScaleConst(v, k) {
  return qMulM31(v, k % P);
}

// Shared transition constraints (air/components/__init__.py _transitions).
function transitions(ev, ids) {
  const notLast = qSub(Q_ONE, ev.m('is_last_idx'));
  for (const [a, b] of ids) ev.constraint(qMul(notLast, qSub(ev.m(a), ev.m(b))));
  ev.constraint(qMul(notLast, qSub(qSub(ev.m('next_idx'), ev.m('idx')), Q_ONE)));
}

function booleanity(ev, name) {
  ev.constraint(qMul(ev.m(name), qSub(ev.m(name), Q_ONE)));
}

// --- per-component evaluate functions ---------------------------------------

function evalAdd(ev, el) {
  booleanity(ev, 'is_last_idx');
  ev.constraint(qSub(qAdd(ev.m('lhs'), ev.m('rhs')), ev.m('out')));
  transitions(ev, [['next_node_id', 'node_id'], ['next_lhs_id', 'lhs_id'], ['next_rhs_id', 'rhs_id']]);
  ev.relation(el.node, ev.m('lhs_mult'), [ev.m('lhs'), ev.m('lhs_id')]);
  ev.relation(el.node, ev.m('rhs_mult'), [ev.m('rhs'), ev.m('rhs_id')]);
  ev.relation(el.node, ev.m('out_mult'), [ev.m('out'), ev.m('node_id')]);
  ev.finalizeLogup();
}

function evalMul(ev, el) {
  booleanity(ev, 'is_last_idx');
  ev.constraint(
    qSub(qSub(qMul(ev.m('lhs'), ev.m('rhs')), qScaleConst(ev.m('out'), SCALE_M31)), ev.m('rem')),
  );
  transitions(ev, [['next_node_id', 'node_id'], ['next_lhs_id', 'lhs_id'], ['next_rhs_id', 'rhs_id']]);
  ev.relation(el.node, ev.m('lhs_mult'), [ev.m('lhs'), ev.m('lhs_id')]);
  ev.relation(el.node, ev.m('rhs_mult'), [ev.m('rhs'), ev.m('rhs_id')]);
  ev.relation(el.node, ev.m('out_mult'), [ev.m('out'), ev.m('node_id')]);
  ev.finalizeLogup();
}

function evalRecip(ev, el) {
  booleanity(ev, 'is_last_idx');
  ev.constraint(
    qSub(qAdd(qMul(ev.m('input'), ev.m('out')), ev.m('rem')), qMul(ev.m('scale'), ev.m('scale'))),
  );
  transitions(ev, [['next_node_id', 'node_id'], ['next_input_id', 'input_id']]);
  ev.relation(el.node, ev.m('input_mult'), [ev.m('input'), ev.m('input_id')]);
  ev.relation(el.node, ev.m('out_mult'), [ev.m('out'), ev.m('node_id')]);
  ev.finalizeLogup();
}

function evalSqrt(ev, el) {
  booleanity(ev, 'is_last_idx');
  ev.constraint(
    qSub(qAdd(qMul(ev.m('out'), ev.m('out')), ev.m('rem')), qMul(ev.m('input'), ev.m('scale'))),
  );
  transitions(ev, [['next_node_id', 'node_id'], ['next_input_id', 'input_id']]);
  ev.relation(el.node, ev.m('input_mult'), [ev.m('input'), ev.m('input_id')]);
  ev.relation(el.node, ev.m('out_mult'), [ev.m('out'), ev.m('node_id')]);
  ev.finalizeLogup();
}

function evalRem(ev, el) {
  booleanity(ev, 'is_last_idx');
  ev.constraint(qSub(qAdd(qMul(ev.m('quotient'), ev.m('rhs')), ev.m('rem')), ev.m('lhs')));
  transitions(ev, [['next_node_id', 'node_id'], ['next_lhs_id', 'lhs_id'], ['next_rhs_id', 'rhs_id']]);
  ev.relation(el.node, ev.m('lhs_mult'), [ev.m('lhs'), ev.m('lhs_id')]);
  ev.relation(el.node, ev.m('rhs_mult'), [ev.m('rhs'), ev.m('rhs_id')]);
  ev.relation(el.node, ev.m('out_mult'), [ev.m('rem'), ev.m('node_id')]);
  ev.finalizeLogup();
}

function makeEvalLutOp(lutName) {
  return (ev, el) => {
    booleanity(ev, 'is_last_idx');
    transitions(ev, [['next_node_id', 'node_id'], ['next_input_id', 'input_id']]);
    ev.relation(el.node, ev.m('input_mult'), [ev.m('input'), ev.m('input_id')]);
    ev.relation(el.node, ev.m('out_mult'), [ev.m('out'), ev.m('node_id')]);
    ev.relation(el[lutName], ev.m('lookup_mult'), [ev.m('input'), ev.m('out')]);
    ev.finalizeLogup();
  };
}

function evalLessThan(ev, el) {
  booleanity(ev, 'is_last_idx');
  booleanity(ev, 'borrow');
  ev.constraint(qSub(ev.m('out'), qScaleConst(qSub(Q_ONE, ev.m('borrow')), SCALE_M31)));
  ev.constraint(
    qSub(qSub(qAdd(ev.m('lhs'), ev.m('diff')), ev.m('rhs')), qScaleConst(ev.m('borrow'), M31_MAX_C)),
  );
  let d = ev.m('diff');
  d = qSub(d, ev.m('limb0'));
  d = qSub(d, qScaleConst(ev.m('limb1'), 1 << 8));
  d = qSub(d, qScaleConst(ev.m('limb2'), 1 << 16));
  d = qSub(d, qScaleConst(ev.m('limb3'), 1 << 24));
  ev.constraint(d);
  transitions(ev, [['next_node_id', 'node_id'], ['next_lhs_id', 'lhs_id'], ['next_rhs_id', 'rhs_id']]);
  ev.relation(el.node, ev.m('lhs_mult'), [ev.m('lhs'), ev.m('lhs_id')]);
  ev.relation(el.node, ev.m('rhs_mult'), [ev.m('rhs'), ev.m('rhs_id')]);
  ev.relation(el.node, ev.m('out_mult'), [ev.m('out'), ev.m('node_id')]);
  ev.relation(el.rangeCheck, ev.m('range_check_mult'), [ev.m('limb0')]);
  ev.relation(el.rangeCheck, ev.m('range_check_mult'), [ev.m('limb1')]);
  ev.relation(el.rangeCheck, ev.m('range_check_mult'), [ev.m('limb2')]);
  ev.relation(el.rangeCheck, ev.m('range_check_mult'), [ev.m('limb3')]);
  ev.finalizeLogup();
}

function evalSumReduce(ev, el) {
  booleanity(ev, 'is_last_idx');
  booleanity(ev, 'is_last_step');
  ev.constraint(qSub(qSub(ev.m('next_acc'), ev.m('acc')), ev.m('input')));
  ev.constraint(qMul(qSub(ev.m('out'), ev.m('next_acc')), ev.m('is_last_step')));
  // Row linking: acc chain continues inside a segment, restarts at 0 after
  // a segment end.
  ev.constraint(qMul(qSub(Q_ONE, ev.m('is_last_step')), qSub(ev.mn('acc'), ev.m('next_acc'))));
  ev.constraint(qMul(ev.m('is_last_step'), ev.mn('acc')));
  transitions(ev, [['next_node_id', 'node_id'], ['next_input_id', 'input_id']]);
  ev.relation(el.node, ev.m('input_mult'), [ev.m('input'), ev.m('input_id')]);
  ev.relation(el.node, ev.m('out_mult'), [ev.m('out'), ev.m('node_id')]);
  ev.finalizeLogup();
}

function evalMaxReduce(ev, el) {
  booleanity(ev, 'is_last_idx');
  booleanity(ev, 'is_max');
  booleanity(ev, 'is_last_step');
  ev.constraint(qMul(ev.m('is_max'), qSub(ev.m('next_max_val'), ev.m('input'))));
  ev.constraint(qMul(qSub(Q_ONE, ev.m('is_max')), qSub(ev.m('next_max_val'), ev.m('max_val'))));
  // >= soundness: next_max - loser recomposes from 8/8/8/6-bit limbs
  // (limb3 range-checked as 4*limb3), bounding the step to [0, 2^30).
  const loser = qAdd(
    qMul(ev.m('is_max'), ev.m('max_val')),
    qMul(qSub(Q_ONE, ev.m('is_max')), ev.m('input')),
  );
  let rec = ev.m('ge_limb0');
  rec = qAdd(rec, qScaleConst(ev.m('ge_limb1'), 1 << 8));
  rec = qAdd(rec, qScaleConst(ev.m('ge_limb2'), 1 << 16));
  rec = qAdd(rec, qScaleConst(ev.m('ge_limb3'), 1 << 24));
  ev.constraint(qAdd(qSub(rec, ev.m('next_max_val')), loser));
  ev.constraint(qMul(qSub(ev.m('out'), ev.m('next_max_val')), ev.m('is_last_step')));
  // Row linking: max_val chain continues inside a segment; a new segment
  // anchors its running max at its own first input.
  ev.constraint(qMul(qSub(Q_ONE, ev.m('is_last_step')), qSub(ev.mn('max_val'), ev.m('next_max_val'))));
  ev.constraint(qMul(ev.m('is_last_step'), qSub(ev.mn('max_val'), ev.mn('input'))));
  transitions(ev, [['next_node_id', 'node_id'], ['next_input_id', 'input_id']]);
  ev.relation(el.node, ev.m('input_mult'), [ev.m('input'), ev.m('input_id')]);
  ev.relation(el.node, ev.m('out_mult'), [ev.m('out'), ev.m('node_id')]);
  ev.relation(el.rangeCheck, ev.m('range_check_mult'), [ev.m('ge_limb0')]);
  ev.relation(el.rangeCheck, ev.m('range_check_mult'), [ev.m('ge_limb1')]);
  ev.relation(el.rangeCheck, ev.m('range_check_mult'), [ev.m('ge_limb2')]);
  ev.relation(el.rangeCheck, ev.m('range_check_mult'), [qScaleConst(ev.m('ge_limb3'), 4)]);
  ev.finalizeLogup();
}

function evalInputs(ev, el) {
  booleanity(ev, 'is_last_idx');
  transitions(ev, [['next_node_id', 'node_id']]);
  ev.relation(el.node, ev.m('multiplicity'), [ev.m('val'), ev.m('node_id')]);
  ev.finalizeLogup();
}

function evalContiguous(ev, el) {
  booleanity(ev, 'is_last_idx');
  transitions(ev, [['next_node_id', 'node_id'], ['next_input_id', 'input_id']]);
  ev.relation(el.node, ev.m('input_mult'), [ev.m('input'), ev.m('input_id')]);
  ev.relation(el.node, ev.m('out_mult'), [ev.m('out'), ev.m('node_id')]);
  ev.finalizeLogup();
}

function makeEvalLutTable(lutName) {
  return (ev, el) => {
    ev.relation(el[lutName], qNeg(ev.m('multiplicity')), [ev.pp.get('pp_0'), ev.pp.get('pp_1')]);
    ev.finalizeLogup();
  };
}

function evalRangeCheckTable(ev, el) {
  ev.relation(el.rangeCheck, qNeg(ev.m('multiplicity')), [ev.pp.get('pp_0')]);
  ev.finalizeLogup();
}

// square: x*x == out*2^S + rem (post-reference extension; appended LAST in
// the canonical order -- docs/contribute/add-ops.md worked example).
function evalSquare(ev, el) {
  booleanity(ev, 'is_last_idx');
  ev.constraint(
    qSub(qSub(qMul(ev.m('input'), ev.m('input')), qScaleConst(ev.m('out'), SCALE_M31)), ev.m('rem')),
  );
  transitions(ev, [['next_node_id', 'node_id'], ['next_input_id', 'input_id']]);
  ev.relation(el.node, ev.m('input_mult'), [ev.m('input'), ev.m('input_id')]);
  ev.relation(el.node, ev.m('out_mult'), [ev.m('out'), ev.m('node_id')]);
  ev.finalizeLogup();
}

// --- canonical component registry (air/components/__init__.py) --------------

const split = (s) => s.split(' ');
const LUT_MAIN = split(
  'node_id input_id idx is_last_idx next_node_id next_input_id next_idx input out input_mult out_mult lookup_mult',
);

export const ALL_COMPONENTS = [
  {
    name: 'add',
    mainCols: split('node_id lhs_id rhs_id idx is_last_idx next_node_id next_lhs_id next_rhs_id next_idx lhs rhs out lhs_mult rhs_mult out_mult'),
    nInteraction: 3,
    ppIds: [],
    evaluate: evalAdd,
  },
  {
    name: 'mul',
    mainCols: split('node_id lhs_id rhs_id idx is_last_idx next_node_id next_lhs_id next_rhs_id next_idx lhs rhs out rem lhs_mult rhs_mult out_mult'),
    nInteraction: 3,
    ppIds: [],
    evaluate: evalMul,
  },
  {
    name: 'recip',
    mainCols: split('node_id input_id idx is_last_idx next_node_id next_input_id next_idx input out rem scale input_mult out_mult'),
    nInteraction: 2,
    ppIds: [],
    evaluate: evalRecip,
  },
  {
    name: 'sqrt',
    mainCols: split('node_id input_id idx is_last_idx next_node_id next_input_id next_idx input out rem scale input_mult out_mult'),
    nInteraction: 2,
    ppIds: [],
    evaluate: evalSqrt,
  },
  {
    name: 'rem',
    mainCols: split('node_id lhs_id rhs_id idx is_last_idx next_node_id next_lhs_id next_rhs_id next_idx lhs rhs rem quotient lhs_mult rhs_mult out_mult'),
    nInteraction: 3,
    ppIds: [],
    evaluate: evalRem,
  },
  { name: 'sin', mainCols: LUT_MAIN, nInteraction: 3, ppIds: [], evaluate: makeEvalLutOp('sin') },
  { name: 'exp2', mainCols: LUT_MAIN, nInteraction: 3, ppIds: [], evaluate: makeEvalLutOp('exp2') },
  { name: 'log2', mainCols: LUT_MAIN, nInteraction: 3, ppIds: [], evaluate: makeEvalLutOp('log2') },
  {
    name: 'less_than',
    mainCols: split('node_id lhs_id rhs_id idx is_last_idx next_node_id next_lhs_id next_rhs_id next_idx lhs rhs out borrow diff limb0 limb1 limb2 limb3 lhs_mult rhs_mult out_mult range_check_mult'),
    nInteraction: 7,
    ppIds: [],
    evaluate: evalLessThan,
  },
  {
    name: 'sum_reduce',
    mainCols: split('node_id input_id idx is_last_idx next_node_id next_input_id next_idx input out acc next_acc is_last_step input_mult out_mult'),
    nInteraction: 2,
    ppIds: [],
    mainNext: ['acc'],
    evaluate: evalSumReduce,
  },
  {
    name: 'max_reduce',
    mainCols: split('node_id input_id idx is_last_idx next_node_id next_input_id next_idx input out max_val next_max_val is_max is_last_step ge_limb0 ge_limb1 ge_limb2 ge_limb3 input_mult out_mult range_check_mult'),
    nInteraction: 6,
    ppIds: [],
    mainNext: ['max_val', 'input'],
    evaluate: evalMaxReduce,
  },
  {
    name: 'inputs',
    mainCols: split('node_id idx is_last_idx next_node_id next_idx val multiplicity'),
    nInteraction: 1,
    ppIds: [],
    evaluate: evalInputs,
  },
  {
    name: 'contiguous',
    mainCols: split('node_id input_id idx is_last_idx next_node_id next_input_id next_idx input out input_mult out_mult'),
    nInteraction: 2,
    ppIds: [],
    evaluate: evalContiguous,
  },
  { name: 'sin_lookup', mainCols: ['multiplicity'], nInteraction: 1, ppIds: ['sin_lut_0', 'sin_lut_1'], evaluate: makeEvalLutTable('sin') },
  { name: 'exp2_lookup', mainCols: ['multiplicity'], nInteraction: 1, ppIds: ['exp2_lut_0', 'exp2_lut_1'], evaluate: makeEvalLutTable('exp2') },
  { name: 'log2_lookup', mainCols: ['multiplicity'], nInteraction: 1, ppIds: ['log2_lut_0', 'log2_lut_1'], evaluate: makeEvalLutTable('log2') },
  { name: 'range_check_lookup', mainCols: ['multiplicity'], nInteraction: 1, ppIds: ['range_check_8_column_0'], evaluate: evalRangeCheckTable },
  // Post-reference extensions append strictly at the end (canonical order
  // is consensus-critical).
  {
    name: 'square',
    mainCols: 'node_id input_id idx is_last_idx next_node_id next_input_id next_idx input out rem input_mult out_mult'.split(' '),
    nInteraction: 2,
    ppIds: [],
    evaluate: evalSquare,
  },
];

// ---------------------------------------------------------------------------
// Layout (air/layout.py AirLayout)
// ---------------------------------------------------------------------------

export function buildLayout(pf, settings) {
  const lay = {
    compIdx: [],
    compLog: [],
    compSum: pf.sums,
    pp: [], // { id, logSize, column }
    mainSlices: [],
    interSlices: [],
    mainLogs: [],
    interLogs: [],
    compositionLog: 0,
    maxLog: 0,
    ppIndex(id) {
      for (let i = 0; i < this.pp.length; i++) if (this.pp[i].id === id) return i;
      return -1;
    },
  };
  let prev = -1;
  for (const [idx, log] of pf.claim) {
    if (idx <= prev || idx >= ALL_COMPONENTS.length || log < 1 || log > 30) return null;
    prev = idx;
    lay.compIdx.push(idx);
    lay.compLog.push(log);
    lay.maxLog = Math.max(lay.maxLog, log);
  }
  if (lay.compIdx.length === 0) return null;

  const inClaim = (name) => lay.compIdx.some((ci) => ALL_COMPONENTS[ci].name === name);

  // Preprocessed: is_first per present size (desc), LUTs, range check.
  const logsDesc = [...new Set(lay.compLog)].sort((a, b) => b - a);
  for (const log of logsDesc) {
    const column = new Uint32Array(1 << log);
    column[0] = 1;
    lay.pp.push({ id: `is_first_${log}`, logSize: log, column });
  }
  const kinds = ['sin', 'exp2', 'log2'];
  const luts = [settings.sin, settings.exp2, settings.log2];
  for (let k = 0; k < 3; k++) {
    if (luts[k].present && inClaim(`${kinds[k]}_lookup`)) {
      const [col0, col1] = lutColumns(k, luts[k]);
      lay.pp.push({ id: `${kinds[k]}_lut_0`, logSize: luts[k].logSize, column: col0 });
      lay.pp.push({ id: `${kinds[k]}_lut_1`, logSize: luts[k].logSize, column: col1 });
    }
  }
  if (settings.rcPresent && inClaim('range_check_lookup')) {
    const column = new Uint32Array(1 << settings.rcBits);
    for (let i = 0; i < column.length; i++) column[i] = i;
    lay.pp.push({ id: `range_check_${settings.rcBits}_column_0`, logSize: settings.rcBits, column });
  }

  // Main / interaction slices.
  let mainPos = 0;
  let interPos = 0;
  for (let i = 0; i < lay.compIdx.length; i++) {
    const c = ALL_COMPONENTS[lay.compIdx[i]];
    const log = lay.compLog[i];
    lay.mainSlices.push([mainPos, mainPos + c.mainCols.length]);
    mainPos += c.mainCols.length;
    for (let k = 0; k < c.mainCols.length; k++) lay.mainLogs.push(log);
    lay.interSlices.push([interPos, interPos + c.nInteraction]);
    interPos += c.nInteraction;
    for (let k = 0; k < 4 * c.nInteraction; k++) lay.interLogs.push(log);
  }
  lay.compositionLog = lay.maxLog + 1;
  return lay;
}

/** recombine_qm31 (air/layout.py): c0 + c1*i + c2*u + c3*iu. */
export function recombine(coords /* QM31[4] */) {
  const basis = [qFromM31(1), [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]];
  let acc = qZero();
  for (let i = 0; i < 4; i++) acc = qAdd(acc, qMul(coords[i], basis[i]));
  return acc;
}
