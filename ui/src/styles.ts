// Shared inline styles for the React components — kept as plain objects so
// the package needs no CSS pipeline (mirrors the role of ui/src/styles in
// the reference package).

import type { CSSProperties } from 'react';

export const palette = {
  ok: '#0f7b4f',
  okBg: '#e4f5ec',
  fail: '#b3261e',
  failBg: '#fbe9e7',
  pending: '#5f6368',
  pendingBg: '#f1f3f4',
  accent: '#3451b2',
  border: '#d0d4dc',
  text: '#1f2328',
  subtext: '#57606a',
};

export const button: CSSProperties = {
  display: 'inline-flex',
  alignItems: 'center',
  gap: 8,
  padding: '8px 16px',
  borderRadius: 8,
  border: `1px solid ${palette.border}`,
  background: palette.accent,
  color: '#fff',
  fontSize: 14,
  fontWeight: 600,
  cursor: 'pointer',
};

export const buttonDisabled: CSSProperties = {
  ...button,
  background: palette.pendingBg,
  color: palette.pending,
  cursor: 'default',
};

export const badgeBase: CSSProperties = {
  display: 'inline-flex',
  alignItems: 'center',
  gap: 6,
  padding: '2px 10px',
  borderRadius: 999,
  fontSize: 12,
  fontWeight: 600,
  border: '1px solid transparent',
};

export const modalOverlay: CSSProperties = {
  position: 'fixed',
  inset: 0,
  background: 'rgba(15, 18, 24, 0.45)',
  display: 'flex',
  alignItems: 'center',
  justifyContent: 'center',
  zIndex: 1000,
};

export const modalCard: CSSProperties = {
  width: 'min(480px, 92vw)',
  maxHeight: '80vh',
  overflowY: 'auto',
  background: '#fff',
  borderRadius: 12,
  padding: 24,
  boxShadow: '0 12px 40px rgba(15, 18, 24, 0.25)',
  color: palette.text,
  fontFamily: 'system-ui, sans-serif',
};

export const phaseRow: CSSProperties = {
  display: 'flex',
  alignItems: 'flex-start',
  gap: 10,
  padding: '8px 0',
  borderBottom: `1px solid ${palette.pendingBg}`,
};
