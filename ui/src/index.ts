// @luminair-tpu/web — in-browser verification for luminair_tpu proofs.
//
// Capability parity with the reference's two npm packages
// (@gizatech/luminair-web: WASM verifier; @gizatech/luminair-react: UI
// components — ui/src/index.ts in gizatechxyz/LuminAIR), folded into one
// package: the verifier here is pure dependency-free JavaScript (a port of
// the audited native C++ verifier) instead of a WASM build, so it needs no
// toolchain and runs in any browser or node.

// Verifier library (plain ES modules; typed via ./lib/index.d.ts).
// @ts-ignore
export { verify, getVerificationPhases, VERIFICATION_PHASES, VerifyError } from './lib/verify.mjs';
// @ts-ignore
export { parseDot, layoutGraph } from './lib/dot.mjs';
export type {
  VerificationResult,
  VerificationPhase,
  DotGraph,
  DotNode,
  DotEdge,
  LaidOutGraph,
} from './lib/index';

// React components.
export { VerifyButton } from './components/VerifyButton';
export type { VerifyButtonProps } from './components/VerifyButton';
export { VerifyBadge } from './components/VerifyBadge';
export type { VerifyBadgeProps, VerifyStatus } from './components/VerifyBadge';
export { VerificationModal } from './components/VerificationModal';
export type { VerificationModalProps } from './components/VerificationModal';
export { GraphVisualizer } from './components/GraphVisualizer';
export type { GraphVisualizerProps } from './components/GraphVisualizer';
