// Verification pipeline of the web verifier: transcript replay, composition
// identity at the OODS point, DEEP quotients, FRI fold checks — mirrors
// native/verify.inc and luminair_tpu/{verifier,pcs/scheme,pcs/fri,
// pcs/quotients}.py.  The role of the reference's WASM verifier
// (crates/verifiers/wasm/src/verifier.rs:35-99).

import {
  INV2, mInv,
  qAdd, qSub, qMul, qMulM31, qInv, qIsZero, qEq, qZero, qOne, qFromM31,
  qConjCm31,
} from './field.mjs';
import { Channel } from './channel.mjs';
import {
  domainPointAt, groupGen, pointFromT, qptAdd, qptSub, cosetVanishingQ, piX, ldeColumn,
} from './circle.mjs';
import { merkleRoot, verifyDecommitment, computedPositions } from './merkle.mjs';
import { parseProof, parseSettings } from './wire.mjs';
import { ALL_COMPONENTS, LookupElems, PointEval, buildLayout, recombine, validateLutOutputs } from './air.mjs';

export const VerifyError = {
  OK: 0,
  PARSE: 1,
  STRUCTURE: 2,
  PP_ROOT: 3,
  LOGUP: 4,
  COMPOSITION: 5,
  POW: 6,
  DECOMMIT: 7,
  FRI: 8,
  LUT_TABLE: 9,
  CONFIG: 10,
};

/** Phase metadata for progress UIs (reference: wasm/src/utils.rs:79-107). */
export const VERIFICATION_PHASES = [
  { id: 'parse', name: 'Parse artifacts', description: 'Decode the proof and circuit settings wire formats' },
  { id: 'preprocessed', name: 'Recommit preprocessed trace', description: 'Rebuild LUT columns from settings, LDE, and recompute the tree-0 Merkle root' },
  { id: 'logup', name: 'LogUp balance', description: 'Check that the claimed LogUp sums cancel to zero across all components' },
  { id: 'composition', name: 'Constraint check (OODS)', description: 'Re-evaluate every AIR constraint at the out-of-domain sample point' },
  { id: 'pow', name: 'Proof of work', description: 'Check the grinding nonce against the channel state' },
  { id: 'decommit', name: 'Merkle decommitments', description: 'Verify query openings against all four committed trees' },
  { id: 'fri', name: 'FRI', description: 'Recompute DEEP quotients and replay the FRI folding at the query positions' },
];

export function getVerificationPhases() {
  return VERIFICATION_PHASES;
}

// ---------------------------------------------------------------------------
// Needed opening positions per input log (pcs/fri.py needed_input_positions)
// ---------------------------------------------------------------------------

/**
 * Position sets the verifier materializes when folding `depth` steps from
 * carried positions `pending` at line level `levelLog` (pcs/fri.py
 * fold_position_sets): sets[0] is the coset the committed layer opens,
 * sets[t] the positions after t folds, sets[depth] the next carried set.
 */
function foldPositionSets(pending, levelLog, depth) {
  let final = new Set(pending);
  for (let t = 0; t < depth; t++) {
    const n = 1 << (levelLog - t);
    const nxt = new Set();
    for (const p of final) nxt.add(Math.min(p, n - 1 - p));
    final = nxt;
  }
  const sets = [final];
  for (let t = depth; t > 0; t--) {
    const n = 1 << (levelLog - t + 1);
    const up = new Set();
    for (const p of sets[sets.length - 1]) {
      up.add(p);
      up.add(n - 1 - p);
    }
    sets.push(up);
  }
  sets.reverse();
  return sets;
}

function neededInputPositions(drawn, inputLogsDesc, foldsPerLayer, lastLineLog) {
  const kmax = inputLogsDesc[0];
  const logset = new Set(inputLogsDesc);
  const n = 1 << kmax;
  const need = new Map();
  {
    const s = new Set();
    for (const p of drawn) {
      s.add(p);
      s.add(n - 1 - p);
    }
    need.set(kmax, [...s].sort((a, b) => a - b));
  }
  let pos = new Set();
  for (const p of drawn) pos.add(Math.min(p, n - 1 - p));
  let curLog = kmax - 1;
  while (curLog > lastLineLog) {
    const f = Math.min(foldsPerLayer, curLog - lastLineLog);
    const sets = foldPositionSets(pos, curLog, f);
    for (let t = 1; t <= f; t++) {
      const k = curLog - t + 1; // circle-log-k input mixes at line level k-1
      if (logset.has(k) && k !== kmax) {
        const s = new Set();
        for (const i of sets[t]) {
          s.add(i);
          s.add((1 << k) - 1 - i);
        }
        need.set(k, [...s].sort((a, b) => a - b));
      }
    }
    pos = sets[sets.length - 1];
    curLog -= f;
  }
  return need;
}

// x-coordinate of the line domain at fold level lineLog, index i.
function lineXAt(lineLog, i) {
  return domainPointAt(lineLog + 1, i).x;
}

// ---------------------------------------------------------------------------
// DEEP quotient recomputation at query positions (pcs/quotients.py)
// ---------------------------------------------------------------------------

function sampleConstants(s) {
  const zbx = qConjCm31(s.point.x);
  const zby = qConjCm31(s.point.y);
  const A = qSub(zby, s.point.y);
  const B = qSub(zbx, s.point.x);
  const Cc = qSub(qMul(B, s.point.y), qMul(A, s.point.x));
  const dv = qSub(qConjCm31(s.value), s.value);
  const denom = qSub(zbx, s.point.x);
  if (qIsZero(denom)) return null;
  const aCoef = qMul(dv, qInv(denom));
  const c0 = qSub(s.value, qMul(aCoef, s.point.x));
  return { A, B, Cc, aCoef, c0 };
}

function recomputeQuotients(samples, opened, need, gamma) {
  // Group by (commit_log, point) in first-occurrence order.
  const groups = [];
  const keyed = new Map();
  for (let i = 0; i < samples.length; i++) {
    const s = samples[i];
    const key = `${s.commitLog}|${s.point.x.join(',')}|${s.point.y.join(',')}`;
    const gi = keyed.get(key);
    if (gi === undefined) {
      keyed.set(key, groups.length);
      groups.push({ log: s.commitLog, idxs: [i] });
    } else {
      groups[gi].idxs.push(i);
    }
  }
  // Gamma powers by global sample index.
  const gpow = [];
  let g = qOne();
  for (let i = 0; i < samples.length; i++) {
    gpow.push(g);
    g = qMul(g, gamma);
  }
  const quots = new Map(); // log -> Map<pos, QM31>
  for (const grp of groups) {
    const base = sampleConstants(samples[grp.idxs[0]]);
    if (!base) return null;
    let accA = qZero();
    let accC0 = qZero();
    const members = [];
    for (const idx of grp.idxs) {
      const sc = sampleConstants(samples[idx]);
      if (!sc) return null;
      accA = qAdd(accA, qMul(gpow[idx], sc.aCoef));
      accC0 = qAdd(accC0, qMul(gpow[idx], sc.c0));
      members.push([gpow[idx], samples[idx]]);
    }
    const ni = need.get(grp.log);
    if (!ni) return null;
    if (!quots.has(grp.log)) quots.set(grp.log, new Map());
    const qlog = quots.get(grp.log);
    for (const pos of ni) {
      const pt = domainPointAt(grp.log, pos);
      const L = qAdd(qSub(qMulM31(base.A, pt.x), qMulM31(base.B, pt.y)), base.Cc);
      if (qIsZero(L)) return null;
      let num = qZero();
      for (const [gp, sp] of members) {
        const col = opened.get(`${sp.tree}:${sp.col}`);
        if (!col) return null;
        const v = col.get(pos);
        if (v === undefined) return null;
        num = qAdd(num, qMulM31(gp, v));
      }
      num = qSub(num, qMulM31(accA, pt.x));
      num = qSub(num, accC0);
      qlog.set(pos, qAdd(qlog.get(pos) || qZero(), qMul(num, qInv(L))));
    }
  }
  return quots;
}

// ---------------------------------------------------------------------------
// FRI verification (pcs/fri.py fri_replay + fri_check_queries)
// ---------------------------------------------------------------------------

function friCheckQueries(fri, logBlowup, logLastLayer, foldsPerLayer, alpha0, alphas, quots, inputLogsDesc, positions) {
  const kmax = inputLogsDesc[0];
  const logset = new Set(inputLogsDesc);
  const lastLineLog = logBlowup + logLastLayer;

  const queryEval = (circleLog, pos) => {
    const li = quots.get(circleLog);
    if (!li) return null;
    const v = li.get(pos);
    return v === undefined ? null : v;
  };

  const circleFoldAt = (circleLog, pos) => {
    const n = 1 << circleLog;
    const i = Math.min(pos, n - 1 - pos);
    const vI = queryEval(circleLog, i);
    const vSib = queryEval(circleLog, n - 1 - i);
    if (!vI || !vSib) return null;
    const y = domainPointAt(circleLog, i).y;
    const e = qMulM31(qAdd(vI, vSib), INV2);
    const oNum = qMulM31(qSub(vI, vSib), INV2);
    const o = qMulM31(oNum, mInv(y));
    return qAdd(e, qMul(alpha0, o));
  };

  let pending = new Map(); // index -> QM31
  let curLineLog = kmax - 1;
  for (const p of positions) {
    const i = Math.min(p, (1 << kmax) - 1 - p);
    const v = circleFoldAt(kmax, p);
    if (!v) return false;
    pending.set(i, v);
  }

  let layerIdx = 0;
  while (curLineLog > lastLineLog) {
    // Open the committed layer at the full fold coset, check the carried
    // values against the opening, then replay this layer's folds (step t
    // uses challenge alpha^(2^t); inputs arriving mid-layer mix scaled by
    // the square of the fold challenge just applied).
    const log = curLineLog;
    const f = Math.min(foldsPerLayer, log - lastLineLog);
    const sets = foldPositionSets(pending.keys(), log, f);
    const coset = [...sets[0]].sort((a, b) => a - b);
    if (
      layerIdx >= fri.layerQueriedValues.length ||
      layerIdx >= fri.layerWitnesses.length ||
      layerIdx >= fri.layerRoots.length
    ) {
      return false;
    }
    const vals = fri.layerQueriedValues[layerIdx];
    if (vals.length !== 4) return false;
    const queries = new Map([[log, coset]]);
    if (
      !verifyDecommitment(fri.layerRoots[layerIdx], [log, log, log, log], queries, vals, fri.layerWitnesses[layerIdx])
    ) {
      return false;
    }
    let cur = new Map();
    for (let j = 0; j < coset.length; j++) {
      const v = [0, 0, 0, 0];
      for (let c = 0; c < 4; c++) {
        if (j >= vals[c].length) return false;
        v[c] = vals[c][j];
      }
      cur.set(coset[j], v);
    }
    for (const [i, v] of pending) {
      if (!qEq(cur.get(i), v)) return false;
    }
    let beta = alphas[layerIdx];
    for (let t = 0; t < f; t++) {
      const lvl = log - t; // level being folded (size 2^lvl)
      const nLvl = 1 << lvl;
      const nxt = new Map();
      for (const p of sets[t + 1]) {
        const sib = nLvl - 1 - p;
        const vP = cur.get(p);
        const vSib = cur.get(sib);
        const e = qMulM31(qAdd(vP, vSib), INV2);
        const oNum = qMulM31(qSub(vP, vSib), INV2);
        const xTw = lineXAt(lvl, p);
        const o = qMulM31(oNum, mInv(xTw));
        nxt.set(p, qAdd(e, qMul(beta, o)));
      }
      cur = nxt;
      const k = lvl; // a circle-log-k input mixes at line level k-1
      if (logset.has(k) && k !== kmax) {
        const beta2 = qMul(beta, beta);
        for (const [i, v] of cur) {
          const addV = circleFoldAt(k, i);
          if (!addV) return false;
          cur.set(i, qAdd(v, qMul(beta2, addV)));
        }
      }
      beta = qMul(beta, beta);
    }
    pending = cur;
    curLineLog -= f;
    layerIdx += 1;
  }

  // Last layer: strided coefficients, evaluate the line basis at x.
  const fullLen = 1 << lastLineLog;
  const stride = 1 << logBlowup;
  if (fri.lastLayerCoeffs.length * stride !== fullLen) return false;
  const coeffs = [];
  for (let i = 0; i < fullLen; i++) coeffs.push(qZero());
  for (let i = 0; i < fri.lastLayerCoeffs.length; i++) coeffs[i * stride] = fri.lastLayerCoeffs[i];
  for (const [i, v] of pending) {
    const x = lineXAt(lastLineLog, i);
    const ts = [];
    let cur = x;
    for (let k = 0; k < lastLineLog; k++) {
      ts.push(cur);
      cur = piX(cur);
    }
    let a = coeffs;
    for (let lvl = lastLineLog - 1; lvl >= 0; lvl--) {
      const b = [];
      for (let j = 0; j < a.length / 2; j++) {
        b.push(qAdd(a[2 * j], qMulM31(a[2 * j + 1], ts[lvl])));
      }
      a = b;
    }
    if (!qEq(a[0], v)) return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// Top-level verify (verifier.py + pcs/scheme.py verify_values)
// ---------------------------------------------------------------------------

function fail(code, error) {
  return { success: false, code, error };
}

/**
 * Verify a proof (`.lmv` bytes) against circuit settings (`.lms` bytes).
 * Returns { success, code, error } — never throws on malformed input.
 * onPhase(id) is called as each verification phase starts.
 */
export function verify(proofBytes, settingsBytes, onPhaseOrOptions = () => {}) {
  // Third argument: either onPhase(id) directly, or an options object
  // { onPhase, minSecurityBits } -- minSecurityBits enforces a floor on
  // the proof-carried PcsConfig (powBits + logBlowup * nQueries), the
  // parameter-downgrade protection matching verifier.py / native.
  const opts = typeof onPhaseOrOptions === 'function'
    ? { onPhase: onPhaseOrOptions }
    : (onPhaseOrOptions || {});
  const onPhase = opts.onPhase || (() => {});
  const minSecurityBits = opts.minSecurityBits || 0;
  onPhase('parse');
  const st = parseSettings(settingsBytes);
  if (!st) return fail(VerifyError.PARSE, 'settings parse error');
  const pf = parseProof(proofBytes);
  if (!pf) return fail(VerifyError.PARSE, 'proof parse error');
  try {
    return verifyParsed(pf, st, onPhase, minSecurityBits);
  } catch (e) {
    return fail(VerifyError.STRUCTURE, `exception: ${e.message}`);
  }
}

function verifyParsed(pf, st, onPhase, minSecurityBits = 0) {
  if (pf.powBits + pf.logBlowup * pf.nQueries < minSecurityBits) {
    return fail(VerifyError.CONFIG, 'proof config below required security bits');
  }
  // Settings v2: validate shipped normative LUT tables before trusting them.
  {
    const kinds = ['sin', 'exp2', 'log2'];
    const luts = [st.sin, st.exp2, st.log2];
    for (let k = 0; k < 3; k++) {
      if (luts[k].present && !validateLutOutputs(k, luts[k])) {
        return fail(VerifyError.LUT_TABLE, `${kinds[k]} LUT output table out of tolerance`);
      }
    }
  }
  const lay = buildLayout(pf, st);
  if (!lay) return fail(VerifyError.STRUCTURE, 'invalid claim/layout');
  if (pf.roots.length !== 4 || pf.sums.length !== pf.claim.length) {
    return fail(VerifyError.STRUCTURE, 'bad roots/sums count');
  }
  const B = pf.logBlowup;
  if (B < 1 || B > 4) return fail(VerifyError.STRUCTURE, 'unsupported blowup');

  const ch = new Channel();
  // Claim mix: flat (component index, log_size) pairs.
  {
    const data = new Uint32Array(2 * pf.claim.length);
    pf.claim.forEach(([idx, log], i) => {
      data[2 * i] = idx;
      data[2 * i + 1] = log;
    });
    ch.mixU32s(data);
  }

  // --- tree 0: recommit the preprocessed columns ---------------------------
  onPhase('preprocessed');
  {
    const byLog = new Map();
    for (const e of lay.pp) {
      const lde = ldeColumn(e.column, B);
      const key = e.logSize + B;
      if (!byLog.has(key)) byLog.set(key, []);
      byLog.get(key).push(lde);
    }
    const root = merkleRoot(byLog);
    let ok = true;
    for (let i = 0; i < 8; i++) if (root[i] !== pf.roots[0][i]) ok = false;
    if (!ok) return fail(VerifyError.PP_ROOT, 'preprocessed tree root mismatch');
  }
  ch.mixRoot(pf.roots[0]);
  ch.mixRoot(pf.roots[1]);

  // --- interaction elements -------------------------------------------------
  const inClaim = (name) => lay.compIdx.some((ci) => ALL_COMPONENTS[ci].name === name);
  const elems = {
    node: new LookupElems(),
    sin: new LookupElems(),
    exp2: new LookupElems(),
    log2: new LookupElems(),
    rangeCheck: new LookupElems(),
  };
  elems.node.init(ch, 2);
  if (inClaim('sin_lookup')) elems.sin.init(ch, 2);
  if (inClaim('exp2_lookup')) elems.exp2.init(ch, 2);
  if (inClaim('log2_lookup')) elems.log2.init(ch, 2);
  if (inClaim('range_check_lookup')) elems.rangeCheck.init(ch, 1);

  // --- global LogUp balance + interaction commit ----------------------------
  onPhase('logup');
  {
    let total = qZero();
    for (const s of pf.sums) total = qAdd(total, s);
    if (!qIsZero(total)) return fail(VerifyError.LOGUP, 'sum of claimed LogUp sums != 0');
  }
  for (const s of pf.sums) ch.mixFelt(s);
  ch.mixRoot(pf.roots[2]);
  const alpha = ch.drawFelt();
  ch.mixRoot(pf.roots[3]);
  const z = pointFromT(ch.drawFelt());

  // --- expected sampled-value shape ------------------------------------------
  const treeLogs = [[], [], [], []];
  const treeNpts = [[], [], [], []];
  for (const e of lay.pp) {
    treeLogs[0].push(e.logSize);
    treeNpts[0].push(1);
  }
  for (const log of lay.mainLogs) {
    treeLogs[1].push(log);
    treeNpts[1].push(1);
  }
  // MAIN_NEXT columns open at z + G_n too (next-row masks).
  for (let i = 0; i < lay.compIdx.length; i++) {
    const c = ALL_COMPONENTS[lay.compIdx[i]];
    const s0 = lay.mainSlices[i][0];
    for (const name of c.mainNext || []) {
      const k = c.mainCols.indexOf(name);
      if (k >= 0) treeNpts[1][s0 + k] = 2;
    }
  }
  for (let i = 0; i < lay.compIdx.length; i++) {
    const c = ALL_COMPONENTS[lay.compIdx[i]];
    for (let b = 0; b < c.nInteraction; b++) {
      const npts = b === c.nInteraction - 1 ? 2 : 1;
      for (let k = 0; k < 4; k++) {
        treeLogs[2].push(lay.compLog[i]);
        treeNpts[2].push(npts);
      }
    }
  }
  for (let k = 0; k < 4; k++) {
    treeLogs[3].push(lay.compositionLog);
    treeNpts[3].push(1);
  }
  if (pf.sampledValues.length !== 4) return fail(VerifyError.STRUCTURE, 'bad sampled_values tree count');
  for (let t = 0; t < 4; t++) {
    if (pf.sampledValues[t].length !== treeLogs[t].length) {
      return fail(VerifyError.STRUCTURE, 'bad sampled_values column count');
    }
    for (let c = 0; c < treeLogs[t].length; c++) {
      if (pf.sampledValues[t][c].length !== treeNpts[t][c]) {
        return fail(VerifyError.STRUCTURE, 'bad sampled_values point count');
      }
    }
  }

  // --- composition identity at the OODS point --------------------------------
  onPhase('composition');
  {
    let total = qZero();
    const powRef = { v: qOne() };
    for (let i = 0; i < lay.compIdx.length; i++) {
      const c = ALL_COMPONENTS[lay.compIdx[i]];
      const n = lay.compLog[i];
      const ev = new PointEval(alpha, powRef, lay.compSum[i]);
      const s0 = lay.mainSlices[i][0];
      for (let k = 0; k < c.mainCols.length; k++) {
        ev.main.set(c.mainCols[k], pf.sampledValues[1][s0 + k][0]);
      for (const name of c.mainNext || [])
        ev.mainNext.set(name, pf.sampledValues[1][s0 + c.mainCols.indexOf(name)][1]);
      }
      for (let k = 0; k < c.ppIds.length; k++) {
        const pi = lay.ppIndex(c.ppIds[k]);
        if (pi < 0) return fail(VerifyError.STRUCTURE, `missing preprocessed column ${c.ppIds[k]}`);
        ev.pp.set(`pp_${k}`, pf.sampledValues[0][pi][0]);
      }
      const [b0, b1] = lay.interSlices[i];
      for (let b = 0; b < b1 - b0; b++) {
        const coords = [];
        for (let k = 0; k < 4; k++) coords.push(pf.sampledValues[2][(b0 + b) * 4 + k][0]);
        ev.inter.push(recombine(coords));
      }
      {
        const coords = [];
        for (let k = 0; k < 4; k++) coords.push(pf.sampledValues[2][(b1 - 1) * 4 + k][1]);
        ev.interPrev = recombine(coords);
      }
      const ifi = lay.ppIndex(`is_first_${n}`);
      if (ifi < 0) return fail(VerifyError.STRUCTURE, 'missing is_first column');
      ev.isFirst = pf.sampledValues[0][ifi][0];
      c.evaluate(ev, elems);
      const v = cosetVanishingQ(z.x, n);
      total = qAdd(total, qMul(ev.acc, qInv(v)));
    }
    const coords = [];
    for (let k = 0; k < 4; k++) coords.push(pf.sampledValues[3][k][0]);
    if (!qEq(total, recombine(coords))) {
      return fail(VerifyError.COMPOSITION, 'composition polynomial OODS mismatch');
    }
  }

  // --- samples (enumeration order shared with the prover) --------------------
  const samples = [];
  for (let t = 0; t < 4; t++) {
    for (let c = 0; c < treeLogs[t].length; c++) {
      const commitLog = treeLogs[t][c] + B;
      for (let pi = 0; pi < treeNpts[t][c]; pi++) {
        let pt = z;
        if (pi === 1) {
          const gn = groupGen(treeLogs[t][c]);
          const gq = { x: qFromM31(gn.x), y: qFromM31(gn.y) };
          // tree 1: next-row mask at z + G; tree 2: LogUp prev at z - G.
          pt = t === 1 ? qptAdd(z, gq) : qptSub(z, gq);
        }
        samples.push({ commitLog, tree: t, col: c, point: pt, value: pf.sampledValues[t][c][pi] });
      }
    }
  }
  for (let t = 0; t < 4; t++) {
    for (const col of pf.sampledValues[t]) {
      for (const v of col) ch.mixFelt(v);
    }
  }

  const gamma = ch.drawFelt();
  const inputLogs = [...new Set(samples.map((s) => s.commitLog))].sort((a, b) => b - a);
  const kmax = inputLogs[0];
  const lastLineLog = B + pf.logLastLayer;
  // Soundness: the fold chain must reach every input's line level
  // (min inputLog - 1); input logs come from the trusted claim while
  // logLastLayer rides the untrusted proof.  Mirrors fri.py:fri_replay.
  if (lastLineLog > inputLogs[inputLogs.length - 1] - 1) {
    return fail(VerifyError.FRI, 'last layer bound skips smallest FRI input');
  }

  // --- FRI replay (roots + last layer into the channel) ----------------------
  const alpha0 = ch.drawFelt();
  const alphas = [];
  {
    let curLog = kmax - 1;
    let idx = 0;
    while (curLog > lastLineLog) {
      if (idx >= pf.fri.layerRoots.length) return fail(VerifyError.FRI, 'too few FRI layers');
      ch.mixRoot(pf.fri.layerRoots[idx]);
      alphas.push(ch.drawFelt());
      idx++;
      curLog -= Math.min(pf.foldsPerLayer, curLog - lastLineLog);
    }
    if (pf.fri.layerRoots.length !== alphas.length) return fail(VerifyError.FRI, 'too many FRI layers');
    if (pf.fri.lastLayerCoeffs.length !== 1 << pf.logLastLayer) {
      return fail(VerifyError.FRI, 'bad last layer size');
    }
    const words = new Uint32Array(4 * pf.fri.lastLayerCoeffs.length);
    pf.fri.lastLayerCoeffs.forEach((cfe, i) => {
      for (let k = 0; k < 4; k++) words[4 * i + k] = cfe[k];
    });
    ch.mixU32s(words);
  }

  // --- PoW + queries ----------------------------------------------------------
  onPhase('pow');
  if (!ch.checkPowNonce(pf.powBits, pf.powNonce)) {
    return fail(VerifyError.POW, 'proof of work check failed');
  }
  ch.mixU64(pf.powNonce);
  const positions = ch.drawQueries(pf.nQueries, kmax);

  // --- tree decommitments -------------------------------------------------------
  onPhase('decommit');
  const need = neededInputPositions(positions, inputLogs, pf.foldsPerLayer, lastLineLog);
  const opened = new Map(); // "tree:col" -> Map<pos, M31 value>
  for (let t = 0; t < 4; t++) {
    const commitLogs = treeLogs[t].map((log) => log + B);
    const queries = new Map();
    for (const log of new Set(commitLogs)) {
      if (need.has(log)) queries.set(log, need.get(log));
    }
    if (t >= pf.treeQueriedValues.length || t >= pf.treeWitnesses.length) {
      return fail(VerifyError.DECOMMIT, 'missing tree openings');
    }
    if (!verifyDecommitment(pf.roots[t], commitLogs, queries, pf.treeQueriedValues[t], pf.treeWitnesses[t])) {
      return fail(VerifyError.DECOMMIT, `tree decommitment failed (tree ${t})`);
    }
    const bottom = Math.max(...commitLogs);
    const compPos = computedPositions(bottom, queries);
    // Opened values: logs descending, column index order within each log.
    let vi = 0;
    const logsInTree = [...new Set(commitLogs)].sort((a, b) => b - a);
    for (const log of logsInTree) {
      for (let c = 0; c < commitLogs.length; c++) {
        if (commitLogs[c] !== log) continue;
        if (vi >= pf.treeQueriedValues[t].length) {
          return fail(VerifyError.DECOMMIT, 'missing opened values');
        }
        const vals = pf.treeQueriedValues[t][vi++];
        const posList = compPos.get(log) || [];
        if (vals.length !== posList.length) {
          return fail(VerifyError.DECOMMIT, 'opened value count mismatch');
        }
        const dst = new Map();
        for (let j = 0; j < posList.length; j++) dst.set(posList[j], vals[j]);
        opened.set(`${t}:${c}`, dst);
      }
    }
  }

  // --- DEEP quotients + FRI fold checks ------------------------------------------
  onPhase('fri');
  const quots = recomputeQuotients(samples, opened, need, gamma);
  if (!quots) return fail(VerifyError.FRI, 'quotient recomputation failed');
  if (!friCheckQueries(pf.fri, B, pf.logLastLayer, pf.foldsPerLayer, alpha0, alphas, quots, inputLogs, positions)) {
    return fail(VerifyError.FRI, 'FRI query check failed');
  }
  return { success: true, code: VerifyError.OK, error: null };
}
