// Flat wire format parsing — mirrors luminair_tpu/serde.py
// (proof_to_flat_bytes / settings_to_flat_bytes) and the C++ Reader in
// native/verifier.cpp.  `.lmv` proof files, `.lms` settings files.

const LIMIT = 1 << 26; // structural sanity bound

class Reader {
  constructor(bytes /* Uint8Array */) {
    this.dv = new DataView(bytes.buffer, bytes.byteOffset, bytes.byteLength);
    this.bytes = bytes;
    this.off = 0;
    this.ok = true;
  }

  need(n) {
    if (!this.ok || this.off + n > this.bytes.length) {
      this.ok = false;
      return false;
    }
    return true;
  }

  u8() {
    if (!this.need(1)) return 0;
    return this.bytes[this.off++];
  }

  u32() {
    if (!this.need(4)) return 0;
    const v = this.dv.getUint32(this.off, true);
    this.off += 4;
    return v;
  }

  u64() {
    if (!this.need(8)) return 0n;
    const v = this.dv.getBigUint64(this.off, true);
    this.off += 8;
    return v;
  }

  i64() {
    if (!this.need(8)) return 0;
    const v = this.dv.getBigInt64(this.off, true);
    this.off += 8;
    const n = Number(v);
    if (!Number.isSafeInteger(n)) this.ok = false;
    return n;
  }

  /** Full-range i64 as BigInt (LUT output tables reach +-2^62). */
  i64big() {
    if (!this.need(8)) return 0n;
    const v = this.dv.getBigInt64(this.off, true);
    this.off += 8;
    return v;
  }

  qm31() {
    return [this.u32(), this.u32(), this.u32(), this.u32()];
  }

  digest() {
    const d = new Uint32Array(8);
    for (let i = 0; i < 8; i++) d[i] = this.u32();
    return d;
  }

  u32s() {
    const n = this.u32();
    if (!this.need(n * 4)) return new Uint32Array(0);
    const v = new Uint32Array(n);
    for (let i = 0; i < n; i++) v[i] = this.dv.getUint32(this.off + 4 * i, true);
    this.off += n * 4;
    return v;
  }

  magic(m) {
    if (!this.need(4)) return false;
    let good = true;
    for (let i = 0; i < 4; i++) {
      if (this.bytes[this.off + i] !== m.charCodeAt(i)) good = false;
    }
    this.off += 4;
    this.ok = this.ok && good;
    return good;
  }
}

/** Parse `.lms` settings bytes. Returns null on malformed input. */
export function parseSettings(bytes) {
  const r = new Reader(bytes);
  if (!r.magic('LMSF')) return null;
  const version = r.u32();
  // v2: each LUT carries its normative output table (serde.py); v1 is the
  // legacy recompute-from-libm path.
  if (version !== 1 && version !== 2) return null;
  const emptyLut = () => ({ present: false, logSize: 0, ranges: [], outputs: null });
  const s = { sin: emptyLut(), exp2: emptyLut(), log2: emptyLut(), rcPresent: false, rcBits: 0 };
  for (const lut of [s.sin, s.exp2, s.log2]) {
    if (r.u8()) {
      lut.present = true;
      lut.logSize = r.u32();
      const nr = r.u32();
      if (nr > 1 << 20) return null;
      let nValues = 0;
      for (let i = 0; i < nr; i++) {
        const lo = r.i64();
        const hi = r.i64();
        if (hi < lo) return null;
        nValues += hi - lo + 1;
        lut.ranges.push({ lo, hi });
      }
      if (version >= 2) {
        const no = r.u32();
        // The table must cover the enumeration exactly.
        if (no !== nValues || no > 1 << 26) return null;
        lut.outputs = new Array(no);
        for (let i = 0; i < no; i++) lut.outputs[i] = r.i64big();
      }
    }
  }
  if (r.u8()) {
    s.rcPresent = true;
    s.rcBits = r.u32();
  }
  return r.ok ? s : null;
}

/** Parse `.lmv` proof bytes. Returns null on malformed input. */
export function parseProof(bytes) {
  const r = new Reader(bytes);
  if (!r.magic('LMVF')) return null;
  const version = r.u32();
  if (version !== 1 && version !== 2) return null;
  const pf = {
    powBits: r.u32(),
    logBlowup: r.u32(),
    logLastLayer: r.u32(),
    nQueries: r.u32(),
    // v2: line-fold steps per committed FRI layer (v1 proofs fold once).
    foldsPerLayer: 1,
    claim: [],
    sums: [],
    roots: [],
    sampledValues: [],
    powNonce: 0n,
    treeQueriedValues: [],
    treeWitnesses: [],
    fri: { layerRoots: [], layerQueriedValues: [], layerWitnesses: [], lastLayerCoeffs: [] },
  };
  if (version >= 2) {
    pf.foldsPerLayer = r.u32();
    if (pf.foldsPerLayer < 1 || pf.foldsPerLayer > 8) return null;
  }
  const nClaim = r.u32();
  if (nClaim > 32) return null;
  for (let i = 0; i < nClaim; i++) {
    const idx = r.u32();
    const log = r.u32();
    pf.claim.push([idx, log]);
  }
  for (let i = 0; i < nClaim; i++) pf.sums.push(r.qm31());
  const nRoots = r.u32();
  if (nRoots > 8) return null;
  for (let i = 0; i < nRoots; i++) pf.roots.push(r.digest());
  const nTrees = r.u32();
  if (nTrees > 8) return null;
  for (let t = 0; t < nTrees; t++) {
    const nCols = r.u32();
    if (nCols > LIMIT) return null;
    const tree = [];
    for (let c = 0; c < nCols; c++) {
      const nPts = r.u32();
      if (nPts > 16) return null;
      const col = [];
      for (let k = 0; k < nPts; k++) col.push(r.qm31());
      tree.push(col);
    }
    pf.sampledValues.push(tree);
  }
  pf.powNonce = r.u64();
  let nt = r.u32();
  if (nt > 8) return null;
  for (let t = 0; t < nt; t++) {
    const nArr = r.u32();
    if (nArr > LIMIT) return null;
    const arrays = [];
    for (let a = 0; a < nArr; a++) arrays.push(r.u32s());
    pf.treeQueriedValues.push(arrays);
  }
  nt = r.u32();
  if (nt > 8) return null;
  for (let t = 0; t < nt; t++) {
    const nDig = r.u32();
    if (nDig > LIMIT) return null;
    const digs = [];
    for (let d = 0; d < nDig; d++) digs.push(r.digest());
    pf.treeWitnesses.push(digs);
  }
  const nLayers = r.u32();
  if (nLayers > 64) return null;
  for (let i = 0; i < nLayers; i++) pf.fri.layerRoots.push(r.digest());
  let nl = r.u32();
  if (nl > 64) return null;
  for (let i = 0; i < nl; i++) {
    const nArr = r.u32();
    if (nArr > 16) return null;
    const arrays = [];
    for (let a = 0; a < nArr; a++) arrays.push(r.u32s());
    pf.fri.layerQueriedValues.push(arrays);
  }
  nl = r.u32();
  if (nl > 64) return null;
  for (let i = 0; i < nl; i++) {
    const nDig = r.u32();
    if (nDig > LIMIT) return null;
    const digs = [];
    for (let d = 0; d < nDig; d++) digs.push(r.digest());
    pf.fri.layerWitnesses.push(digs);
  }
  const nCoeffs = r.u32();
  if (nCoeffs > LIMIT) return null;
  for (let i = 0; i < nCoeffs; i++) pf.fri.lastLayerCoeffs.push(r.qm31());
  return r.ok ? pf : null;
}
