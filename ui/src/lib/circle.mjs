// Circle group over M31, canonic domains, FFT twiddles, circle (i)FFT and
// low-degree extension — mirrors luminair_tpu/{circle,fft}.py and the
// scalar loops in native/verifier.cpp.

import {
  P, INV2, mAdd, mSub, mNeg, mMul, mInv,
  qAdd, qSub, qMul, qInv, qOne, qNeg,
} from './field.mjs';

export const CIRCLE_GEN = { x: 2, y: 1268011823 };
export const CIRCLE_LOG_ORDER = 31;

export function ptAdd(p, q) {
  return {
    x: mSub(mMul(p.x, q.x), mMul(p.y, q.y)),
    y: mAdd(mMul(p.x, q.y), mMul(p.y, q.x)),
  };
}

export function ptDouble(p) {
  const x2 = mMul(p.x, p.x);
  const xy = mMul(p.x, p.y);
  return { x: mSub(mAdd(x2, x2), 1), y: mAdd(xy, xy) };
}

export function groupGen(logSize) {
  let g = CIRCLE_GEN;
  for (let i = 0; i < CIRCLE_LOG_ORDER - logSize; i++) g = ptDouble(g);
  return g;
}

/** Canonic coset points: (2i+1) * G_{log+1}, i in [0, 2^log). */
export function domainPoints(logSize) {
  const n = 1 << logSize;
  const q = groupGen(logSize + 1);
  const step = ptDouble(q);
  const xs = new Uint32Array(n);
  const ys = new Uint32Array(n);
  let cur = q;
  for (let i = 0; i < n; i++) {
    xs[i] = cur.x;
    ys[i] = cur.y;
    cur = ptAdd(cur, step);
  }
  return { xs, ys };
}

/** Single domain point (2i+1) * G_{log+1} by double-and-add. */
export function domainPointAt(logSize, i) {
  const g = groupGen(logSize + 1);
  let k = 2 * i + 1;
  let result = { x: 1, y: 0 };
  let base = g;
  let has = false;
  while (k > 0) {
    if (k % 2 === 1) {
      result = has ? ptAdd(result, base) : base;
      has = true;
    }
    base = ptDouble(base);
    k = Math.floor(k / 2);
  }
  return result;
}

export function piX(x) {
  const x2 = mMul(x, x);
  return mSub(mAdd(x2, x2), 1);
}

export function piXQ(x /* QM31 */) {
  const x2 = qMul(x, x);
  return qSub(qAdd(x2, x2), qOne());
}

// --- QM31 circle points ----------------------------------------------------

export function qptAdd(p, q) {
  return {
    x: qSub(qMul(p.x, q.x), qMul(p.y, q.y)),
    y: qAdd(qMul(p.x, q.y), qMul(p.y, q.x)),
  };
}

export function qptSub(p, q) {
  return qptAdd(p, { x: q.x, y: qNeg(q.y) });
}

/** Stereographic map t -> ((1-t^2)/(1+t^2), 2t/(1+t^2)). */
export function pointFromT(t) {
  const one = qOne();
  const t2 = qMul(t, t);
  const dinv = qInv(qAdd(one, t2));
  return { x: qMul(qSub(one, t2), dinv), y: qMul(qAdd(t, t), dinv) };
}

/** V_n(x) = pi^(n-1)(x): vanishing polynomial of the size-2^n trace coset. */
export function cosetVanishingQ(x, traceLog) {
  let v = x;
  for (let i = 0; i < traceLog - 1; i++) v = piXQ(v);
  return v;
}

// --- FFT twiddles ------------------------------------------------------------

/** Forward twiddles, top stage first: tw[0] = ys[:n/2]; tw[k] = x chain. */
export function fftTwiddles(logN) {
  const d = domainPoints(logN);
  const n = 1 << logN;
  const tw = [d.ys.slice(0, n / 2)];
  let cur = d.xs.slice(0, n / 2);
  while (cur.length >= 2) {
    tw.push(cur.slice(0, cur.length / 2));
    const nxt = new Uint32Array(cur.length / 2);
    for (let i = 0; i < nxt.length; i++) nxt[i] = piX(cur[i]);
    cur = nxt;
  }
  return tw;
}

export function ifftTwiddles(logN) {
  const tw = fftTwiddles(logN);
  return tw.map((stage) => {
    const out = new Uint32Array(stage.length);
    for (let i = 0; i < stage.length; i++) out[i] = mMul(mInv(stage[i]), INV2);
    return out;
  });
}

// --- circle iFFT / FFT / LDE -------------------------------------------------

export function ifftInplace(a /* Uint32Array */, twInv) {
  const n = a.length;
  if (n <= 1) return;
  let b = new Uint32Array(n);
  // Circle stage: pair (i, n-1-i).
  for (let i = 0; i < n / 2; i++) {
    const v0 = a[i];
    const v1 = a[n - 1 - i];
    b[i] = mMul(mAdd(v0, v1), INV2);
    b[n / 2 + i] = mMul(mSub(v0, v1), twInv[0][i]);
  }
  [a, b] = swapInto(a, b);
  // Line stages.
  let nBlocks = 2;
  let m = n / 2;
  let stage = 1;
  while (m >= 2) {
    const t = twInv[stage];
    for (let blk = 0; blk < nBlocks; blk++) {
      const base = blk * m;
      for (let j = 0; j < m / 2; j++) {
        const v0 = a[base + j];
        const v1 = a[base + m - 1 - j];
        b[base + j] = mMul(mAdd(v0, v1), INV2);
        b[base + m / 2 + j] = mMul(mSub(v0, v1), t[j]);
      }
    }
    [a, b] = swapInto(a, b);
    nBlocks *= 2;
    m /= 2;
    stage++;
  }
  return a;
}

export function fftInplace(a, tw) {
  const n = a.length;
  if (n <= 1) return a;
  let logN = 0;
  while (1 << logN < n) logN++;
  let b = new Uint32Array(n);
  let m = 2;
  let nBlocks = n / 2;
  let stage = logN - 1;
  while (m <= n / 2) {
    const t = tw[stage];
    for (let blk = 0; blk < nBlocks; blk++) {
      const base = blk * m;
      for (let j = 0; j < m / 2; j++) {
        const e = a[base + j];
        const o = a[base + m / 2 + j];
        const to = mMul(t[j], o);
        b[base + j] = mAdd(e, to);
        b[base + m - 1 - j] = mSub(e, to);
      }
    }
    [a, b] = swapInto(a, b);
    m *= 2;
    nBlocks /= 2;
    stage--;
  }
  const t = tw[0];
  for (let j = 0; j < n / 2; j++) {
    const e = a[j];
    const o = a[n / 2 + j];
    const to = mMul(t[j], o);
    b[j] = mAdd(e, to);
    b[n - 1 - j] = mSub(e, to);
  }
  return b;
}

function swapInto(a, b) {
  return [b, a];
}

const twCache = new Map();
const twiCache = new Map();

/** LDE: trace column (2^log values) -> commit-domain column (2^(log+blowup)). */
export function ldeColumn(values /* Uint32Array */, logBlowup) {
  const n = values.length;
  let logN = 0;
  while (1 << logN < n) logN++;
  if (!twiCache.has(logN)) twiCache.set(logN, ifftTwiddles(logN));
  let coeffs = Uint32Array.from(values);
  coeffs = n > 1 ? ifftInplace(coeffs, twiCache.get(logN)) : coeffs;
  const bigLog = logN + logBlowup;
  const stride = 1 << logBlowup;
  const ext = new Uint32Array(1 << bigLog);
  for (let i = 0; i < n; i++) ext[i * stride] = coeffs[i];
  if (!twCache.has(bigLog)) twCache.set(bigLog, fftTwiddles(bigLog));
  return fftInplace(ext, twCache.get(bigLog));
}
