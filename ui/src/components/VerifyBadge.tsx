// Small status chip showing a proof's verification state.
// Capability parity with the reference's VerifyBadge (ui/src/components/
// VerifyBadge.tsx in gizatechxyz/LuminAIR) — re-designed, not ported.

import React from 'react';
import { badgeBase, palette } from '../styles';

export type VerifyStatus = 'unverified' | 'verifying' | 'verified' | 'failed';

export interface VerifyBadgeProps {
  status: VerifyStatus;
  /** Optional error detail shown as a title tooltip when failed. */
  error?: string | null;
}

const LABELS: Record<VerifyStatus, string> = {
  unverified: 'Not verified',
  verifying: 'Verifying…',
  verified: 'Proof verified',
  failed: 'Verification failed',
};

const DOTS: Record<VerifyStatus, string> = {
  unverified: palette.pending,
  verifying: palette.accent,
  verified: palette.ok,
  failed: palette.fail,
};

const BACKGROUNDS: Record<VerifyStatus, string> = {
  unverified: palette.pendingBg,
  verifying: palette.pendingBg,
  verified: palette.okBg,
  failed: palette.failBg,
};

export function VerifyBadge({ status, error }: VerifyBadgeProps): React.ReactElement {
  return (
    <span
      style={{ ...badgeBase, background: BACKGROUNDS[status], color: DOTS[status] }}
      title={status === 'failed' && error ? error : undefined}
      role="status"
      aria-label={LABELS[status]}
    >
      <span
        style={{
          width: 8,
          height: 8,
          borderRadius: '50%',
          background: DOTS[status],
          display: 'inline-block',
        }}
      />
      {LABELS[status]}
    </span>
  );
}

export default VerifyBadge;
