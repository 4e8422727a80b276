// End-to-end tests for the pure-JS verifier against real proofs produced by
// the Python prover (fixtures regenerated with ui/test/gen_fixtures.py).
// Run: node --test ui/test/
//
// Mirrors the role of tests/test_native_verifier.py for the C++ verifier.

import { test } from 'node:test';
import assert from 'node:assert/strict';
import { readFileSync } from 'node:fs';
import { dirname, join } from 'node:path';
import { fileURLToPath } from 'node:url';

import { verify, getVerificationPhases, VerifyError } from '../src/lib/verify.mjs';
import { blake2s } from '../src/lib/blake2s.mjs';
import { mMul, mInv, P, qMul, qInv, qEq, qOne } from '../src/lib/field.mjs';
import { parseDot, layoutGraph } from '../src/lib/dot.mjs';

const FIXTURES = join(dirname(fileURLToPath(import.meta.url)), 'fixtures');
const load = (name) => new Uint8Array(readFileSync(join(FIXTURES, name)));
const manifest = JSON.parse(readFileSync(join(FIXTURES, 'manifest.json'), 'utf8'));

test('blake2s matches a known test vector', () => {
  // blake2s-256 of the empty string (RFC 7693 reference implementation).
  const hex = Array.from(blake2s(new Uint8Array(0)))
    .map((b) => b.toString(16).padStart(2, '0'))
    .join('');
  assert.equal(hex, '69217a3079908094e11121d042354a7c1f55b6482ca1a51e1b250dfd1ed0eef9');
  // blake2s-256 of "abc".
  const abc = Array.from(blake2s(new TextEncoder().encode('abc')))
    .map((b) => b.toString(16).padStart(2, '0'))
    .join('');
  assert.equal(abc, '508c5e8c327c14e2e1a72ba34eeb452f37458b209ed63a294d999b4c86675982');
});

test('M31 multiplication and inversion', () => {
  assert.equal(mMul(P - 1, P - 1), 1); // (-1)^2 = 1
  assert.equal(mMul(1 << 30, 2), 1); // 2^31 = 1 mod P  ->  2^30 * 2 = 1
  for (const a of [1, 2, 12345, 0x7abcdef, P - 2]) {
    assert.equal(mMul(a, mInv(a)), 1);
  }
});

test('QM31 inversion', () => {
  const x = [3, 5, 7, 11];
  assert.ok(qEq(qMul(x, qInv(x)), qOne()));
});

test('verification phases metadata is well-formed', () => {
  const phases = getVerificationPhases();
  assert.ok(phases.length >= 5);
  for (const p of phases) {
    assert.ok(p.id && p.name && p.description);
  }
});

for (const [name, fx] of Object.entries(manifest)) {
  test(`fixture ${name}: expect ${fx.expect}`, () => {
    const phases = [];
    const result = verify(load(fx.proof), load(fx.settings), (id) => phases.push(id));
    if (fx.expect === 'success') {
      assert.equal(result.error, null);
      assert.ok(result.success);
      assert.equal(result.code, VerifyError.OK);
      assert.deepEqual(phases, getVerificationPhases().map((p) => p.id));
    } else {
      assert.ok(!result.success);
      assert.notEqual(result.code, VerifyError.OK);
      assert.ok(result.error);
    }
  });
}

test('garbage bytes are rejected, not thrown', () => {
  const garbage = new Uint8Array(64).fill(0xab);
  const result = verify(garbage, garbage);
  assert.ok(!result.success);
  assert.equal(result.code, VerifyError.PARSE);
});

test('truncated proof is rejected, not thrown', () => {
  const fx = manifest.simple;
  const full = load(fx.proof);
  const result = verify(full.subarray(0, Math.floor(full.length / 3)), load(fx.settings));
  assert.ok(!result.success);
});

test('DOT parsing and layout', () => {
  const dot = `digraph {
    0 [ label = "function" ]
    1 [ label = "mul" ]
    2 [ label = "add" ]
    0 -> 1 [ label = "[2, 2]" ]
    1 -> 2 [ label = "[2, 2]" ]
  }`;
  const g = parseDot(dot);
  assert.equal(g.nodes.length, 3);
  assert.equal(g.edges.length, 2);
  const laid = layoutGraph(g);
  const byId = new Map(laid.nodes.map((n) => [n.id, n]));
  assert.equal(byId.get('0').layer, 0);
  assert.equal(byId.get('1').layer, 1);
  assert.equal(byId.get('2').layer, 2);
  assert.ok(laid.width > 0 && laid.height > 0);
});

test('oversized last-layer bound is rejected structurally (untrusted config)', () => {
  // ADVICE r2 (high): logLastLayer rides the untrusted proof; a value making
  // lastLineLog > min(inputLogs) - 1 must be rejected before numeric work.
  const pf = new Uint8Array(load('all_ops.lmv'));
  // Wire offset 16: magic(4) + version(4) + powBits(4) + logBlowup(4).
  new DataView(pf.buffer).setUint32(16, 10, true);
  const result = verify(pf, load('all_ops.lms'));
  assert.equal(result.success, false);
  assert.match(result.errorMessage, /skips smallest|last layer/i);
});
