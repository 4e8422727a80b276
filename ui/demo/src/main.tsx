/**
 * Demo app: verify committed proof fixtures in the browser and render the
 * computation graph, using the library's public React surface
 * (VerifyButton, VerifyBadge, VerificationModal, GraphVisualizer).
 *
 * Capability parity with the reference's Next.js demo (ui/demo/ in
 * gizatechxyz/LuminAIR), built on the pure-JS verifier instead of WASM.
 *
 *   npm run demo        (from ui/: installs + starts Vite dev server)
 */
import React, { useEffect, useState } from 'react';
import { createRoot } from 'react-dom/client';
import {
  VerifyButton,
  VerificationModal,
  GraphVisualizer,
  VerifyError,
} from '@luminair-tpu/web';
import type { VerificationResult } from '@luminair-tpu/web';

interface Fixture {
  title: string;
  proof: string;
  settings: string;
  expect: 'success' | 'failure';
  note: string;
}

const FIXTURES: Fixture[] = [
  {
    title: 'all_ops — every operator, LUTs + range check',
    proof: '/all_ops.lmv',
    settings: '/all_ops.lms',
    expect: 'success',
    note: 'sin/exp2/log2 lookups, less_than range check, reductions.',
  },
  {
    title: 'simple — 2×2 mul+add',
    proof: '/simple.lmv',
    settings: '/simple.lms',
    expect: 'success',
    note: 'The quick-start graph (examples/simple.py).',
  },
  {
    title: 'tampered — one flipped byte',
    proof: '/tampered.lmv',
    settings: '/simple.lms',
    expect: 'failure',
    note: 'Must FAIL: a Merkle decommitment no longer matches its root.',
  },
];

async function fetchBytes(url: string): Promise<Uint8Array> {
  const resp = await fetch(url);
  if (!resp.ok) throw new Error(`fetch ${url}: HTTP ${resp.status}`);
  return new Uint8Array(await resp.arrayBuffer());
}

function FixtureCard({ fx }: { fx: Fixture }) {
  const [result, setResult] = useState<VerificationResult | null>(null);
  const [modal, setModal] = useState<{ proof: Uint8Array; settings: Uint8Array } | null>(null);
  const expected =
    result == null
      ? null
      : fx.expect === 'success'
        ? result.success && result.code === VerifyError.OK
        : !result.success;
  const openModal = async () => {
    const [proof, settings] = await Promise.all([fetchBytes(fx.proof), fetchBytes(fx.settings)]);
    setModal({ proof, settings });
  };
  return (
    <section>
      <h2>{fx.title}</h2>
      <p className="hint">{fx.note}</p>
      <VerifyButton
        proof={fx.proof}
        settings={fx.settings}
        onResult={(r) => setResult(r)}
        label="Verify in browser"
      />
      <button style={{ marginLeft: 12 }} onClick={openModal}>
        Verify with phase progress…
      </button>
      {result && (
        <p>
          verifier says: <code>{result.success ? 'ACCEPTED' : `REJECTED (${result.error})`}</code>{' '}
          — {expected ? '✅ as expected' : '❌ UNEXPECTED'}
        </p>
      )}
      {modal && (
        <VerificationModal
          open
          proof={modal.proof}
          settings={modal.settings}
          onClose={() => setModal(null)}
        />
      )}
    </section>
  );
}

function GraphCard() {
  const [dot, setDot] = useState<string | null>(null);
  useEffect(() => {
    fetch('/all_ops.dot')
      .then((r) => r.text())
      .then(setDot)
      .catch(() => setDot(null));
  }, []);
  return (
    <section>
      <h2>Computation graph (all_ops)</h2>
      <p className="hint">
        Rendered from <code>Graph.graph_viz()</code> DOT output — the graph whose execution the
        proof above attests to.
      </p>
      {dot ? <GraphVisualizer dot={dot} maxWidth={780} /> : <p>loading…</p>}
    </section>
  );
}

function App() {
  return (
    <>
      <h1>luminair_tpu — verifiable tensor computation, checked in your browser</h1>
      <p className="hint">
        Each card fetches a committed Circle-STARK proof (<code>.lmv</code>) and its circuit
        settings (<code>.lms</code>), then replays the full transcript — Merkle roots, LogUp
        balance, composition identity, DEEP quotients, FRI — in dependency-free JavaScript.
      </p>
      {FIXTURES.map((fx) => (
        <FixtureCard key={fx.title} fx={fx} />
      ))}
      <GraphCard />
    </>
  );
}

createRoot(document.getElementById('root')!).render(<App />);
