// Modal dialog showing per-phase verification progress.
// Capability parity with the reference's VerificationModal (ui/src/
// components/VerificationModal.tsx) driven by the phases JSON the WASM
// verifier exposes (crates/verifiers/wasm/src/utils.rs:79-107); here the
// phases come from getVerificationPhases() in ../lib/verify.mjs.

import React, { useCallback, useEffect, useState } from 'react';
// @ts-ignore -- plain ES module, typed via ../lib/index.d.ts
import { verify, getVerificationPhases } from '../lib/verify.mjs';
import type { VerificationPhase, VerificationResult } from '../lib/index';
import { modalCard, modalOverlay, palette, phaseRow, button } from '../styles';

export interface VerificationModalProps {
  open: boolean;
  onClose: () => void;
  proof: Uint8Array;
  settings: Uint8Array;
  onResult?: (result: VerificationResult) => void;
  title?: string;
}

type PhaseState = 'pending' | 'running' | 'done' | 'failed';

export function VerificationModal({
  open,
  onClose,
  proof,
  settings,
  onResult,
  title = 'Verifying STARK proof',
}: VerificationModalProps): React.ReactElement | null {
  const phases: VerificationPhase[] = getVerificationPhases();
  const [states, setStates] = useState<Record<string, PhaseState>>({});
  const [result, setResult] = useState<VerificationResult | null>(null);

  const run = useCallback(() => {
    const next: Record<string, PhaseState> = {};
    for (const p of phases) next[p.id] = 'pending';
    setStates(next);
    setResult(null);
    let current: string | null = null;
    // Defer the CPU-bound verification so the modal paints first.
    setTimeout(() => {
      const res: VerificationResult = verify(proof, settings, (phaseId: string) => {
        setStates((prev) => {
          const upd = { ...prev, [phaseId]: 'running' as PhaseState };
          if (current) upd[current] = 'done';
          current = phaseId;
          return upd;
        });
      });
      setStates((prev) => {
        const upd = { ...prev };
        for (const p of phases) {
          if (upd[p.id] === 'running') upd[p.id] = res.success ? 'done' : 'failed';
          else if (res.success && upd[p.id] === 'pending') upd[p.id] = 'done';
        }
        return upd;
      });
      setResult(res);
      onResult?.(res);
    }, 30);
  }, [proof, settings, phases, onResult]);

  useEffect(() => {
    if (open) run();
  }, [open, run]);

  if (!open) return null;

  const mark = (s: PhaseState) =>
    s === 'done' ? '✓' : s === 'failed' ? '✗' : s === 'running' ? '●' : '○';
  const color = (s: PhaseState) =>
    s === 'done' ? palette.ok : s === 'failed' ? palette.fail : s === 'running' ? palette.accent : palette.pending;

  return (
    <div style={modalOverlay} role="dialog" aria-modal="true" aria-label={title} onClick={onClose}>
      <div style={modalCard} onClick={(e) => e.stopPropagation()}>
        <h2 style={{ margin: '0 0 12px', fontSize: 18 }}>{title}</h2>
        <div>
          {phases.map((p) => {
            const s = states[p.id] ?? 'pending';
            return (
              <div key={p.id} style={phaseRow}>
                <span style={{ color: color(s), fontWeight: 700, width: 16 }}>{mark(s)}</span>
                <div>
                  <div style={{ fontSize: 14, fontWeight: 600 }}>{p.name}</div>
                  <div style={{ fontSize: 12, color: palette.subtext }}>{p.description}</div>
                </div>
              </div>
            );
          })}
        </div>
        <div style={{ marginTop: 16, display: 'flex', alignItems: 'center', gap: 12 }}>
          {result && (
            <strong style={{ color: result.success ? palette.ok : palette.fail, fontSize: 14 }}>
              {result.success ? 'Proof verified' : `Failed: ${result.error}`}
            </strong>
          )}
          <button type="button" style={{ ...button, marginLeft: 'auto' }} onClick={onClose}>
            Close
          </button>
        </div>
      </div>
    </div>
  );
}

export default VerificationModal;
