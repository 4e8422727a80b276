// Blake2s Fiat-Shamir channel — replays luminair_tpu/crypto/channel.py
// (and native/verifier.cpp Channel) transcript-for-transcript.

import { blake2s, wordsToBytes } from './blake2s.mjs';
import { P } from './field.mjs';

export class Channel {
  constructor() {
    this.digest = new Uint8Array(32);
    this.counter = 0n;
  }

  mixBytes(data) {
    const buf = new Uint8Array(32 + data.length);
    buf.set(this.digest, 0);
    buf.set(data, 32);
    this.digest = blake2s(buf);
    this.counter = 0n;
  }

  mixU32s(words) {
    this.mixBytes(wordsToBytes(words));
  }

  mixU64(v /* BigInt */) {
    const b = new Uint8Array(8);
    let x = BigInt(v);
    for (let i = 0; i < 8; i++) {
      b[i] = Number(x & 0xffn);
      x >>= 8n;
    }
    this.mixBytes(b);
  }

  mixRoot(digestWords /* Uint32Array(8) */) {
    this.mixU32s(digestWords);
  }

  mixFelt(f /* QM31 */) {
    this.mixU32s(Uint32Array.from(f));
  }

  drawBlock() {
    const buf = new Uint8Array(40);
    buf.set(this.digest, 0);
    let x = this.counter;
    for (let i = 0; i < 8; i++) {
      buf[32 + i] = Number(x & 0xffn);
      x >>= 8n;
    }
    this.counter += 1n;
    return blake2s(buf);
  }

  drawBaseFelts(n) {
    const out = [];
    while (out.length < n) {
      const blk = this.drawBlock();
      const dv = new DataView(blk.buffer, blk.byteOffset, 32);
      for (let i = 0; i < 8 && out.length < n; i++) {
        const w = dv.getUint32(4 * i, true);
        if (w < 2 * P) out.push(w % P);
      }
    }
    return out;
  }

  drawFelt() {
    return this.drawBaseFelts(4);
  }

  drawQueries(n, logDomain) {
    const mask = Math.pow(2, logDomain) - 1;
    const picked = [];
    while (picked.length < n) {
      const blk = this.drawBlock();
      const dv = new DataView(blk.buffer, blk.byteOffset, 32);
      for (let i = 0; i < 8 && picked.length < n; i++) {
        picked.push((dv.getUint32(4 * i, true) & mask) >>> 0);
      }
    }
    picked.sort((a, b) => a - b);
    return picked.filter((p, i) => i === 0 || p !== picked[i - 1]);
  }

  checkPowNonce(bits, nonce /* BigInt */) {
    if (bits === 0) return true;
    const buf = new Uint8Array(40);
    buf.set(this.digest, 0);
    let x = BigInt(nonce);
    for (let i = 0; i < 8; i++) {
      buf[32 + i] = Number(x & 0xffn);
      x >>= 8n;
    }
    const h = blake2s(buf);
    let v = 0n;
    for (let i = 7; i >= 0; i--) v = (v << 8n) | BigInt(h[i]);
    return (v & ((1n << BigInt(bits)) - 1n)) === 0n;
  }
}
