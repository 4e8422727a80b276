// Blake2s-256, unkeyed — bit-identical to hashlib.blake2s / the C++
// implementation in native/verifier.cpp (b2s_compress / blake2s).
// The reference's WASM verifier gets this from the Rust blake2 crate.

const IV = new Uint32Array([
  0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
  0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19,
]);

const SIGMA = [
  [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
  [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
  [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
  [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
  [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
  [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
  [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
  [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
  [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
  [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
];

const v = new Uint32Array(16);
const m = new Uint32Array(16);

function rotr(x, n) {
  return ((x >>> n) | (x << (32 - n))) >>> 0;
}

// h: Uint32Array(8) state, mBuf: Uint32Array(16), t: byte counter (< 2^53).
function compress(h, tLo, tHi, last) {
  for (let i = 0; i < 8; i++) v[i] = h[i];
  for (let i = 0; i < 8; i++) v[8 + i] = IV[i];
  v[12] = (v[12] ^ tLo) >>> 0;
  v[13] = (v[13] ^ tHi) >>> 0;
  if (last) v[14] = (v[14] ^ 0xffffffff) >>> 0;
  for (let r = 0; r < 10; r++) {
    const s = SIGMA[r];
    g(0, 4, 8, 12, m[s[0]], m[s[1]]);
    g(1, 5, 9, 13, m[s[2]], m[s[3]]);
    g(2, 6, 10, 14, m[s[4]], m[s[5]]);
    g(3, 7, 11, 15, m[s[6]], m[s[7]]);
    g(0, 5, 10, 15, m[s[8]], m[s[9]]);
    g(1, 6, 11, 12, m[s[10]], m[s[11]]);
    g(2, 7, 8, 13, m[s[12]], m[s[13]]);
    g(3, 4, 9, 14, m[s[14]], m[s[15]]);
  }
  for (let i = 0; i < 8; i++) h[i] = (h[i] ^ v[i] ^ v[8 + i]) >>> 0;
}

function g(a, b, c, d, x, y) {
  v[a] = (v[a] + v[b] + x) >>> 0;
  v[d] = rotr(v[d] ^ v[a], 16);
  v[c] = (v[c] + v[d]) >>> 0;
  v[b] = rotr(v[b] ^ v[c], 12);
  v[a] = (v[a] + v[b] + y) >>> 0;
  v[d] = rotr(v[d] ^ v[a], 8);
  v[c] = (v[c] + v[d]) >>> 0;
  v[b] = rotr(v[b] ^ v[c], 7);
}

/** Hash raw bytes -> 32-byte digest (Uint8Array). */
export function blake2s(data) {
  const h = new Uint32Array(8);
  for (let i = 0; i < 8; i++) h[i] = IV[i];
  h[0] = (h[0] ^ (0x01010000 ^ 32)) >>> 0;
  const len = data.length;
  let off = 0;
  let t = 0;
  while (len - off > 64) {
    for (let i = 0; i < 16; i++) {
      const b = off + 4 * i;
      m[i] =
        (data[b] | (data[b + 1] << 8) | (data[b + 2] << 16) | (data[b + 3] << 24)) >>> 0;
    }
    t += 64;
    compress(h, t >>> 0, Math.floor(t / 0x100000000), false);
    off += 64;
  }
  m.fill(0);
  const take = len - off;
  for (let i = 0; i < take; i++) {
    m[i >> 2] = (m[i >> 2] | (data[off + i] << ((i & 3) * 8))) >>> 0;
  }
  t += take;
  compress(h, t >>> 0, Math.floor(t / 0x100000000), true);
  const out = new Uint8Array(32);
  for (let i = 0; i < 8; i++) {
    out[4 * i] = h[i] & 0xff;
    out[4 * i + 1] = (h[i] >>> 8) & 0xff;
    out[4 * i + 2] = (h[i] >>> 16) & 0xff;
    out[4 * i + 3] = (h[i] >>> 24) & 0xff;
  }
  return out;
}

/** Hash little-endian u32 words -> digest as Uint32Array(8). */
export function hashWords(words) {
  const bytes = new Uint8Array(words.length * 4);
  for (let i = 0; i < words.length; i++) {
    const w = words[i];
    bytes[4 * i] = w & 0xff;
    bytes[4 * i + 1] = (w >>> 8) & 0xff;
    bytes[4 * i + 2] = (w >>> 16) & 0xff;
    bytes[4 * i + 3] = (w >>> 24) & 0xff;
  }
  return digestToWords(blake2s(bytes));
}

export function digestToWords(d) {
  const w = new Uint32Array(8);
  for (let i = 0; i < 8; i++) {
    w[i] =
      (d[4 * i] | (d[4 * i + 1] << 8) | (d[4 * i + 2] << 16) | (d[4 * i + 3] << 24)) >>> 0;
  }
  return w;
}

export function wordsToBytes(w) {
  const out = new Uint8Array(w.length * 4);
  for (let i = 0; i < w.length; i++) {
    out[4 * i] = w[i] & 0xff;
    out[4 * i + 1] = (w[i] >>> 8) & 0xff;
    out[4 * i + 2] = (w[i] >>> 16) & 0xff;
    out[4 * i + 3] = (w[i] >>> 24) & 0xff;
  }
  return out;
}

export function digestEq(a, b) {
  for (let i = 0; i < 8; i++) if (a[i] !== b[i]) return false;
  return true;
}
