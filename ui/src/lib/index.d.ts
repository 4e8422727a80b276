// Type declarations for the plain-ES-module verifier library.
// The library itself ships as dependency-free .mjs so it runs in any
// browser or node without a build step; these declarations give TS
// consumers (and the React components) full typing.

export type QM31 = [number, number, number, number];

export interface VerificationResult {
  success: boolean;
  code: number;
  error: string | null;
}

export interface VerificationPhase {
  id: string;
  name: string;
  description: string;
}

export declare const VerifyError: {
  OK: 0;
  PARSE: 1;
  STRUCTURE: 2;
  PP_ROOT: 3;
  LOGUP: 4;
  COMPOSITION: 5;
  POW: 6;
  DECOMMIT: 7;
  FRI: 8;
};

export declare const VERIFICATION_PHASES: VerificationPhase[];
export declare function getVerificationPhases(): VerificationPhase[];

/** Verify a `.lmv` proof against `.lms` settings. Never throws. */
export declare function verify(
  proofBytes: Uint8Array,
  settingsBytes: Uint8Array,
  onPhase?: (phaseId: string) => void,
): VerificationResult;

export interface DotNode {
  id: string;
  label: string;
}
export interface DotEdge {
  from: string;
  to: string;
  label: string;
}
export interface DotGraph {
  nodes: DotNode[];
  edges: DotEdge[];
}
export interface LaidOutNode extends DotNode {
  x: number;
  y: number;
  layer: number;
}
export interface LaidOutGraph {
  nodes: LaidOutNode[];
  edges: DotEdge[];
  width: number;
  height: number;
  nodeW: number;
  nodeH: number;
}

export declare function parseDot(dot: string): DotGraph;
export declare function layoutGraph(
  graph: DotGraph,
  opts?: { nodeW?: number; nodeH?: number; gapX?: number; gapY?: number },
): LaidOutGraph;
