// M31 / QM31 field arithmetic for the in-browser verifier.
//
// Mirrors native/verifier.cpp (m_* / q_* helpers) and
// luminair_tpu/fields/{m31,qm31}.py, the role of stwo's field types in the
// reference's WASM verifier (crates/verifiers/wasm).  Pure ES module, no
// dependencies; all M31 values are plain JS numbers in [0, P).
//
// 31-bit modular multiplication is done with exact double-precision
// arithmetic (all intermediates < 2^47 < 2^53), no BigInt on the hot path.

export const P = 0x7fffffff; // 2^31 - 1
export const INV2 = (P + 1) / 2; // 1/2 mod P = 2^30

export function mAdd(a, b) {
  const s = a + b;
  return s >= P ? s - P : s;
}

export function mSub(a, b) {
  const d = a + P - b;
  return d >= P ? d - P : d;
}

export function mNeg(a) {
  const r = P - a;
  return r >= P ? r - P : r;
}

// Reduce t < 2^53 modulo P (2^31 == 1 mod P).
function reduceP(t) {
  let r = (t % 0x80000000) + Math.floor(t / 0x80000000);
  if (r >= 0x80000000) r = (r % 0x80000000) + Math.floor(r / 0x80000000);
  return r >= P ? r - P : r;
}

export function mMul(a, b) {
  // a = ah*2^16 + al; a*b = ah*b*2^16 + al*b, each partial exact (< 2^47).
  const ah = Math.floor(a / 65536);
  const al = a % 65536;
  const lo = reduceP(al * b);
  const hi = reduceP(ah * b); // still needs *2^16
  // hi*2^16 mod P: hi = h1*2^15 + h0  ->  h0*2^16 + h1   (2^31 == 1 mod P)
  const h1 = Math.floor(hi / 32768);
  const h0 = hi % 32768;
  let s = h0 * 65536 + h1;
  if (s >= P) s -= P;
  const r = lo + s;
  return r >= P ? r - P : r;
}

export function mPow(a, e) {
  let r = 1;
  let base = a;
  let k = e;
  while (k > 0) {
    if (k % 2 === 1) r = mMul(r, base);
    base = mMul(base, base);
    k = Math.floor(k / 2);
  }
  return r;
}

export function mInv(a) {
  return mPow(a, P - 2);
}

// ---------------------------------------------------------------------------
// QM31 = CM31[u] / (u^2 - (2 + i)), CM31 = M31[i] / (i^2 + 1).
// Represented as a plain 4-array [a, b, c, d] = (a + b*i) + (c + d*i)*u.
// ---------------------------------------------------------------------------

export function qZero() {
  return [0, 0, 0, 0];
}

export function qOne() {
  return [1, 0, 0, 0];
}

export function qFromM31(a) {
  return [a, 0, 0, 0];
}

export function qEq(x, y) {
  return x[0] === y[0] && x[1] === y[1] && x[2] === y[2] && x[3] === y[3];
}

export function qIsZero(x) {
  return x[0] === 0 && x[1] === 0 && x[2] === 0 && x[3] === 0;
}

export function qAdd(x, y) {
  return [mAdd(x[0], y[0]), mAdd(x[1], y[1]), mAdd(x[2], y[2]), mAdd(x[3], y[3])];
}

export function qSub(x, y) {
  return [mSub(x[0], y[0]), mSub(x[1], y[1]), mSub(x[2], y[2]), mSub(x[3], y[3])];
}

export function qNeg(x) {
  return [mNeg(x[0]), mNeg(x[1]), mNeg(x[2]), mNeg(x[3])];
}

// (ar + ai*i) * (br + bi*i) -> [rr, ri]
function cmMul(ar, ai, br, bi) {
  return [mSub(mMul(ar, br), mMul(ai, bi)), mAdd(mMul(ar, bi), mMul(ai, br))];
}

export function qMul(x, y) {
  // (A + Bu)(C + Du) = AC + R*BD + (AD + BC)u,  R = 2 + i
  const ac = cmMul(x[0], x[1], y[0], y[1]);
  const bd = cmMul(x[2], x[3], y[2], y[3]);
  const ad = cmMul(x[0], x[1], y[2], y[3]);
  const bc = cmMul(x[2], x[3], y[0], y[1]);
  const rbdR = mSub(mAdd(bd[0], bd[0]), bd[1]);
  const rbdI = mAdd(bd[0], mAdd(bd[1], bd[1]));
  return [
    mAdd(ac[0], rbdR),
    mAdd(ac[1], rbdI),
    mAdd(ad[0], bc[0]),
    mAdd(ad[1], bc[1]),
  ];
}

export function qMulM31(x, s) {
  return [mMul(x[0], s), mMul(x[1], s), mMul(x[2], s), mMul(x[3], s)];
}

export function qInv(x) {
  // (A + Bu)^-1 = (A - Bu) / (A^2 - R*B^2)
  const a2 = cmMul(x[0], x[1], x[0], x[1]);
  const b2 = cmMul(x[2], x[3], x[2], x[3]);
  const rb2R = mSub(mAdd(b2[0], b2[0]), b2[1]);
  const rb2I = mAdd(b2[0], mAdd(b2[1], b2[1]));
  const denR = mSub(a2[0], rb2R);
  const denI = mSub(a2[1], rb2I);
  const n = mAdd(mMul(denR, denR), mMul(denI, denI));
  const ninv = mInv(n);
  const diR = mMul(denR, ninv);
  const diI = mMul(mNeg(denI), ninv);
  const na = cmMul(x[0], x[1], diR, diI);
  const nb = cmMul(mNeg(x[2]), mNeg(x[3]), diR, diI);
  return [na[0], na[1], nb[0], nb[1]];
}

export function qPow(x, e) {
  let r = qOne();
  let base = x;
  let k = e;
  while (k > 0) {
    if (k % 2 === 1) r = qMul(r, base);
    base = qMul(base, base);
    k = Math.floor(k / 2);
  }
  return r;
}

// Gal(QM31/CM31): (A + Bu) -> (A - Bu)
export function qConjCm31(x) {
  return [x[0], x[1], mNeg(x[2]), mNeg(x[3])];
}
