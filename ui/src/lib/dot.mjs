// Minimal parser + layered layout for the DOT strings emitted by
// luminair_tpu Graph.graph_viz() (graph/graph.py), so GraphVisualizer can
// render a compiled graph without any graph-drawing dependency.
//
// Handles exactly the dialect we emit:
//     digraph {
//         0 [ label = "mul" ]
//         0 -> 1 [ label = "[2, 2]" ]
//     }

const NODE_RE = /^\s*(\w+)\s*\[\s*label\s*=\s*"([^"]*)"\s*\]\s*$/;
const EDGE_RE = /^\s*(\w+)\s*->\s*(\w+)\s*(?:\[\s*label\s*=\s*"([^"]*)"\s*\])?\s*$/;

/** Parse DOT -> { nodes: [{id, label}], edges: [{from, to, label}] }. */
export function parseDot(dot) {
  const nodes = [];
  const edges = [];
  for (const line of dot.split('\n')) {
    const e = line.match(EDGE_RE);
    if (e) {
      edges.push({ from: e[1], to: e[2], label: e[3] || '' });
      continue;
    }
    const n = line.match(NODE_RE);
    if (n) nodes.push({ id: n[1], label: n[2] });
  }
  return { nodes, edges };
}

/**
 * Longest-path layering + simple barycenter ordering.
 * Returns { nodes: [{id, label, x, y, layer}], edges, width, height } with
 * unit-square coordinates scaled by (nodeW+gapX, nodeH+gapY).
 */
export function layoutGraph(graph, opts = {}) {
  const { nodeW = 110, nodeH = 34, gapX = 28, gapY = 46 } = opts;
  const byId = new Map(graph.nodes.map((n) => [n.id, { ...n }]));
  const indeg = new Map(graph.nodes.map((n) => [n.id, 0]));
  const out = new Map(graph.nodes.map((n) => [n.id, []]));
  for (const e of graph.edges) {
    if (!byId.has(e.from) || !byId.has(e.to)) continue;
    indeg.set(e.to, indeg.get(e.to) + 1);
    out.get(e.from).push(e.to);
  }
  // Longest-path layer assignment via Kahn order.
  const layer = new Map(graph.nodes.map((n) => [n.id, 0]));
  const queue = graph.nodes.filter((n) => indeg.get(n.id) === 0).map((n) => n.id);
  const indegWork = new Map(indeg);
  while (queue.length) {
    const u = queue.shift();
    for (const v of out.get(u)) {
      layer.set(v, Math.max(layer.get(v), layer.get(u) + 1));
      indegWork.set(v, indegWork.get(v) - 1);
      if (indegWork.get(v) === 0) queue.push(v);
    }
  }
  const nLayers = Math.max(0, ...layer.values()) + 1;
  const layers = Array.from({ length: nLayers }, () => []);
  for (const n of graph.nodes) layers[layer.get(n.id)].push(n.id);
  // One barycenter pass for edge-crossing reduction.
  const posIn = new Map();
  layers.forEach((ids) => ids.forEach((id, i) => posIn.set(id, i)));
  const parents = new Map(graph.nodes.map((n) => [n.id, []]));
  for (const e of graph.edges) {
    if (parents.has(e.to)) parents.get(e.to).push(e.from);
  }
  for (let l = 1; l < nLayers; l++) {
    layers[l].sort((a, b) => bary(a) - bary(b));
    layers[l].forEach((id, i) => posIn.set(id, i));
  }
  function bary(id) {
    const ps = parents.get(id);
    if (!ps || ps.length === 0) return posIn.get(id);
    return ps.reduce((s, p) => s + posIn.get(p), 0) / ps.length;
  }
  const maxRow = Math.max(...layers.map((ids) => ids.length));
  const width = maxRow * (nodeW + gapX) + gapX;
  const height = nLayers * (nodeH + gapY) + gapY;
  const placed = [];
  layers.forEach((ids, l) => {
    const rowW = ids.length * (nodeW + gapX) - gapX;
    const x0 = (width - rowW) / 2;
    ids.forEach((id, i) => {
      const n = byId.get(id);
      placed.push({
        ...n,
        layer: l,
        x: x0 + i * (nodeW + gapX),
        y: gapY / 2 + l * (nodeH + gapY),
      });
    });
  });
  return { nodes: placed, edges: graph.edges, width, height, nodeW, nodeH };
}
