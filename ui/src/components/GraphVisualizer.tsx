// SVG renderer for compiled luminair_tpu graphs.
// Capability parity with the reference's GraphVisualizer (ui/src/
// components/GraphVisualizer.tsx): takes the DOT string produced by
// Graph.graph_viz() (luminair_tpu/graph/graph.py) and draws a layered DAG
// with no external graph library.

import React, { useMemo } from 'react';
// @ts-ignore -- plain ES module, typed via ../lib/index.d.ts
import { parseDot, layoutGraph } from '../lib/dot.mjs';
import type { LaidOutGraph } from '../lib/index';
import { palette } from '../styles';

export interface GraphVisualizerProps {
  /** DOT string from Graph.graph_viz(). */
  dot: string;
  /** Max rendered width in px (the SVG scales to fit). */
  maxWidth?: number;
  /** Color override per op label, e.g. { mul: '#...' }. */
  colors?: Record<string, string>;
}

const OP_COLORS: Record<string, string> = {
  function: '#eef2ff',
  copy_to: '#f1f3f4',
  copy_from: '#f1f3f4',
  contiguous: '#f1f3f4',
  add: '#e4f5ec',
  mul: '#e4f5ec',
  sum_reduce: '#fff3e0',
  max_reduce: '#fff3e0',
  sin: '#fce4ec',
  exp2: '#fce4ec',
  log2: '#fce4ec',
  sqrt: '#fce4ec',
  recip: '#fce4ec',
  less_than: '#ede7f6',
  rem: '#ede7f6',
};

function opKey(label: string): string {
  return label.replace(/\(.*/, '');
}

export function GraphVisualizer({
  dot,
  maxWidth = 720,
  colors = {},
}: GraphVisualizerProps): React.ReactElement {
  const laid: LaidOutGraph = useMemo(() => layoutGraph(parseDot(dot)), [dot]);
  const pos = useMemo(() => {
    const m = new Map<string, { x: number; y: number }>();
    for (const n of laid.nodes) m.set(n.id, { x: n.x, y: n.y });
    return m;
  }, [laid]);

  const { width, height, nodeW, nodeH } = laid;
  return (
    <svg
      viewBox={`0 0 ${width} ${height}`}
      style={{ width: Math.min(width, maxWidth), maxWidth: '100%', height: 'auto' }}
      role="img"
      aria-label="computational graph"
    >
      <defs>
        <marker id="lmn-arrow" viewBox="0 0 8 8" refX="7" refY="4" markerWidth="7" markerHeight="7" orient="auto">
          <path d="M0,0 L8,4 L0,8 z" fill={palette.subtext} />
        </marker>
      </defs>
      {laid.edges.map((e, i) => {
        const a = pos.get(e.from);
        const b = pos.get(e.to);
        if (!a || !b) return null;
        const x1 = a.x + nodeW / 2;
        const y1 = a.y + nodeH;
        const x2 = b.x + nodeW / 2;
        const y2 = b.y;
        const my = (y1 + y2) / 2;
        return (
          <g key={`e${i}`}>
            <path
              d={`M${x1},${y1} C${x1},${my} ${x2},${my} ${x2},${y2}`}
              fill="none"
              stroke={palette.subtext}
              strokeWidth={1.2}
              markerEnd="url(#lmn-arrow)"
            />
            {e.label && (
              <text
                x={(x1 + x2) / 2}
                y={my - 4}
                fontSize={9}
                fill={palette.subtext}
                textAnchor="middle"
                fontFamily="ui-monospace, monospace"
              >
                {e.label}
              </text>
            )}
          </g>
        );
      })}
      {laid.nodes.map((n) => (
        <g key={n.id}>
          <rect
            x={n.x}
            y={n.y}
            width={nodeW}
            height={nodeH}
            rx={8}
            fill={colors[opKey(n.label)] ?? OP_COLORS[opKey(n.label)] ?? '#fff'}
            stroke={palette.border}
          />
          <text
            x={n.x + nodeW / 2}
            y={n.y + nodeH / 2 + 4}
            fontSize={12}
            fontWeight={600}
            fill={palette.text}
            textAnchor="middle"
            fontFamily="system-ui, sans-serif"
          >
            {n.label}
          </text>
          <text
            x={n.x + 6}
            y={n.y + 11}
            fontSize={8}
            fill={palette.subtext}
            fontFamily="ui-monospace, monospace"
          >
            {n.id}
          </text>
        </g>
      ))}
    </svg>
  );
}

export default GraphVisualizer;
