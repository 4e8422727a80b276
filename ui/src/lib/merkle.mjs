// Merkle commitments over mixed-height column sets — mirrors
// luminair_tpu/crypto/merkle.py and the C++ port in native/verifier.cpp:
// each tree layer hashes [left child digest || right child digest ||
// column values injected at this layer], as 32-bit LE words.

import { hashWords, digestEq } from './blake2s.mjs';

/**
 * Per-layer recomputed-node positions given per-log query positions.
 * queries: Map<log, number[] (sorted)>. Returns Map<log, number[]>.
 */
export function computedPositions(bottomLog, queries) {
  const out = new Map();
  let s = new Set(queries.get(bottomLog) || []);
  out.set(bottomLog, [...s].sort((a, b) => a - b));
  for (let log = bottomLog - 1; log >= 0; log--) {
    const nxt = new Set();
    for (const p of s) nxt.add(p >> 1);
    for (const q of queries.get(log) || []) nxt.add(q);
    s = nxt;
    out.set(log, [...s].sort((a, b) => a - b));
  }
  return out;
}

/**
 * Full tree build (used to recommit the preprocessed tree).
 * colsByLog: Map<log, Uint32Array[]> in insertion order per log.
 * Returns root digest as Uint32Array(8).
 */
export function merkleRoot(colsByLog) {
  const maxLog = Math.max(...colsByLog.keys());
  let prev = null; // Uint32Array, 8 words per node
  for (let log = maxLog; log >= 0; log--) {
    const n = 1 << log;
    const cols = colsByLog.get(log) || [];
    const wordsPer = (prev ? 16 : 0) + cols.length;
    const layer = new Uint32Array(8 * n);
    const msg = new Uint32Array(wordsPer);
    for (let i = 0; i < n; i++) {
      let w = 0;
      if (prev) {
        msg.set(prev.subarray(16 * i, 16 * i + 16), 0);
        w = 16;
      }
      for (let c = 0; c < cols.length; c++) msg[w + c] = cols[c][i];
      layer.set(hashWords(msg), 8 * i);
    }
    prev = layer;
  }
  return prev.subarray(0, 8);
}

/**
 * Partial recompute from openings (merkle.verify_decommitment).
 * root: Uint32Array(8); columnLogs: number[] (one per column);
 * queries: Map<log, number[]>; queriedValues: Uint32Array[] (flat lists in
 * logs-descending, insertion order within log); witness: Uint32Array(8)[].
 */
export function verifyDecommitment(root, columnLogs, queries, queriedValues, witness) {
  const colsCount = new Map();
  for (const log of columnLogs) colsCount.set(log, (colsCount.get(log) || 0) + 1);
  const logsDesc = [...colsCount.keys()].sort((a, b) => b - a);
  const bottom = logsDesc[0];
  const comp = computedPositions(bottom, queries);

  // Consume values: logs descending, column insertion order within log.
  const valuesByLog = new Map();
  let vi = 0;
  for (const log of logsDesc) {
    const list = [];
    for (let k = 0; k < colsCount.get(log); k++) {
      if (vi >= queriedValues.length) return false;
      list.push(queriedValues[vi++]);
    }
    valuesByLog.set(log, list);
  }
  if (vi !== queriedValues.length) return false;
  for (const [log, list] of valuesByLog) {
    for (const v of list) {
      if (v.length !== (comp.get(log) || []).length) return false;
    }
  }

  let wi = 0;
  let nodeHashes = new Map(); // position -> Uint32Array(8)
  const sbot = comp.get(bottom);
  if (sbot.length > 0) {
    const vb = valuesByLog.get(bottom);
    if (!vb || vb.length === 0) return false;
    const msg = new Uint32Array(vb.length);
    for (let i = 0; i < sbot.length; i++) {
      for (let c = 0; c < vb.length; c++) msg[c] = vb[c][i];
      nodeHashes.set(sbot[i], hashWords(msg));
    }
  }
  let s = sbot;
  for (let log = bottom; log >= 1; log--) {
    const known = new Set(s);
    const nxt = comp.get(log - 1);
    const vn = valuesByLog.get(log - 1) || [];
    const parentHashes = new Map();
    const msg = new Uint32Array(16 + vn.length);
    for (let idx = 0; idx < nxt.length; idx++) {
      const par = nxt[idx];
      for (let ci = 0; ci < 2; ci++) {
        const child = 2 * par + ci;
        if (known.has(child)) {
          msg.set(nodeHashes.get(child), ci * 8);
        } else {
          if (wi >= witness.length) return false;
          msg.set(witness[wi++], ci * 8);
        }
      }
      for (let c = 0; c < vn.length; c++) msg[16 + c] = vn[c][idx];
      parentHashes.set(par, hashWords(msg));
    }
    nodeHashes = parentHashes;
    s = nxt;
  }
  if (nodeHashes.size !== 1 || !nodeHashes.has(0)) return false;
  if (wi !== witness.length) return false; // trailing witness data
  return digestEq(nodeHashes.get(0), root);
}
