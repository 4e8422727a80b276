// One-click in-browser proof verification button.
// Capability parity with the reference's VerifyButton (ui/src/components/
// VerifyButton.tsx): fetches or accepts proof + settings bytes, runs the
// pure-JS verifier off the main click handler, and reports the result.

import React, { useCallback, useRef, useState } from 'react';
// @ts-ignore -- plain ES module, typed via ../lib/index.d.ts
import { verify } from '../lib/verify.mjs';
import type { VerificationResult } from '../lib/index';
import { button, buttonDisabled } from '../styles';
import { VerifyBadge, VerifyStatus } from './VerifyBadge';

export interface VerifyButtonProps {
  /** Proof bytes (`.lmv`), or a URL to fetch them from. */
  proof: Uint8Array | string;
  /** Settings bytes (`.lms`), or a URL to fetch them from. */
  settings: Uint8Array | string;
  /** Called with the result when verification completes. */
  onResult?: (result: VerificationResult) => void;
  /** Called as each verification phase starts (phase id). */
  onPhase?: (phaseId: string) => void;
  label?: string;
  showBadge?: boolean;
}

async function toBytes(src: Uint8Array | string): Promise<Uint8Array> {
  if (typeof src !== 'string') return src;
  const resp = await fetch(src);
  if (!resp.ok) throw new Error(`fetch ${src}: HTTP ${resp.status}`);
  return new Uint8Array(await resp.arrayBuffer());
}

export function VerifyButton({
  proof,
  settings,
  onResult,
  onPhase,
  label = 'Verify proof',
  showBadge = true,
}: VerifyButtonProps): React.ReactElement {
  const [status, setStatus] = useState<VerifyStatus>('unverified');
  const [error, setError] = useState<string | null>(null);
  const running = useRef(false);

  const run = useCallback(async () => {
    if (running.current) return;
    running.current = true;
    setStatus('verifying');
    setError(null);
    try {
      const [proofBytes, settingsBytes] = await Promise.all([toBytes(proof), toBytes(settings)]);
      // Yield a frame so the 'verifying' state paints before the CPU-bound work.
      await new Promise((r) => setTimeout(r, 0));
      const result: VerificationResult = verify(proofBytes, settingsBytes, onPhase ?? (() => {}));
      setStatus(result.success ? 'verified' : 'failed');
      setError(result.error);
      onResult?.(result);
    } catch (e) {
      const message = e instanceof Error ? e.message : String(e);
      setStatus('failed');
      setError(message);
      onResult?.({ success: false, code: -1, error: message });
    } finally {
      running.current = false;
    }
  }, [proof, settings, onResult, onPhase]);

  return (
    <span style={{ display: 'inline-flex', alignItems: 'center', gap: 12 }}>
      <button
        type="button"
        style={status === 'verifying' ? buttonDisabled : button}
        onClick={run}
        disabled={status === 'verifying'}
      >
        {status === 'verifying' ? 'Verifying…' : label}
      </button>
      {showBadge && <VerifyBadge status={status} error={error} />}
    </span>
  );
}

export default VerifyButton;
