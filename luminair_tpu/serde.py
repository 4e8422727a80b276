"""Artifact serialization: proofs, PIEs, settings (binary + JSON).

Reference equivalents: LuminairProof/CircuitSettings/LuminairPie bincode &
JSON file serde (crates/prover/src/lib.rs:25-107,
crates/air/src/settings.rs:50-121, crates/air/src/pie.rs:142).  The binary
container here is an .npz (zip of little-endian .npy arrays + a JSON
manifest) -- compact, deterministic, and readable from any language.
"""

from __future__ import annotations

import io
import json
from typing import Any, Dict, List, Tuple

import numpy as np

from .air.claim import LuminairClaim, LuminairInteractionClaim
from .pcs.config import PcsConfig
from .pcs.fri import FriProof
from .pcs.scheme import PcsProof
from .errors import SerializationError


def _encode(obj, arrays: List[np.ndarray]):
    if isinstance(obj, np.ndarray):
        arrays.append(obj)
        return {"$a": len(arrays) - 1}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, dict):
        return {"$d": {str(k): _encode(v, arrays) for k, v in obj.items()}}
    if isinstance(obj, (list, tuple)):
        return {"$l": [_encode(v, arrays) for v in obj]}
    if obj is None or isinstance(obj, (int, float, str, bool)):
        return obj
    raise SerializationError(f"cannot encode {type(obj)}")


def _decode(obj, arrays):
    if isinstance(obj, dict):
        if "$a" in obj:
            return arrays[f"arr_{obj['$a']}"]
        if "$d" in obj:
            return {k: _decode(v, arrays) for k, v in obj["$d"].items()}
        if "$l" in obj:
            return [_decode(v, arrays) for v in obj["$l"]]
    return obj


def write_msg_file(path: str, kind: str, payload):
    arrays: List[np.ndarray] = []
    manifest = json.dumps({"kind": kind, "payload": _encode(payload, arrays)})
    named = {f"arr_{i}": a for i, a in enumerate(arrays)}
    with open(path, "wb") as fh:  # exact filename (savez would append .npz)
        np.savez_compressed(
            fh, manifest=np.frombuffer(manifest.encode(), dtype=np.uint8), **named
        )


def read_msg_file(path: str) -> Tuple[str, Any]:
    with np.load(path) as z:
        manifest = json.loads(bytes(z["manifest"]).decode())
        payload = _decode(manifest["payload"], z)
        return manifest["kind"], payload


def proof_to_payload(proof) -> dict:
    p = proof.pcs_proof
    f = p.fri_proof
    return {
        "claim": proof.claim.to_dict(),
        "interaction_claim": proof.interaction_claim.to_dict(),
        "roots": [np.asarray(r, dtype=np.uint32) for r in proof.roots],
        "config": proof.config.to_dict(),
        "pcs": {
            "sampled_values": p.sampled_values,
            "pow_nonce": int(p.pow_nonce),
            "tree_queried_values": p.tree_queried_values,
            "tree_witnesses": p.tree_witnesses,
            "fri": {
                "layer_roots": f.layer_roots,
                "layer_queried_values": f.layer_queried_values,
                "layer_witnesses": f.layer_witnesses,
                "last_layer_coeffs": f.last_layer_coeffs,
                "pow_nonce": int(f.pow_nonce),
            },
        },
    }


def proof_from_payload(payload) -> "LuminairProof":
    from .prover import LuminairProof

    fri = payload["pcs"]["fri"]
    fri_proof = FriProof(
        layer_roots=[np.asarray(r, dtype=np.uint32) for r in fri["layer_roots"]],
        layer_queried_values=[
            [np.asarray(a, dtype=np.uint32) for a in layer]
            for layer in fri["layer_queried_values"]
        ],
        layer_witnesses=[
            [np.asarray(a, dtype=np.uint32) for a in layer]
            for layer in fri["layer_witnesses"]
        ],
        last_layer_coeffs=np.asarray(fri["last_layer_coeffs"], dtype=np.uint32),
        pow_nonce=int(fri["pow_nonce"]),
    )
    pcs = PcsProof(
        sampled_values=payload["pcs"]["sampled_values"],
        fri_proof=fri_proof,
        pow_nonce=int(payload["pcs"]["pow_nonce"]),
        tree_queried_values=payload["pcs"]["tree_queried_values"],
        tree_witnesses=payload["pcs"]["tree_witnesses"],
    )
    return LuminairProof(
        claim=LuminairClaim.from_dict(payload["claim"]),
        interaction_claim=LuminairInteractionClaim.from_dict(payload["interaction_claim"]),
        roots=[np.asarray(r, dtype=np.uint32) for r in payload["roots"]],
        pcs_proof=pcs,
        config=PcsConfig.from_dict(payload["config"]),
    )


def proof_to_file(proof, path: str):
    write_msg_file(path, "proof", proof_to_payload(proof))


def proof_from_file(path: str):
    kind, payload = read_msg_file(path)
    if kind != "proof":
        raise SerializationError(f"expected proof file, got {kind}")
    return proof_from_payload(payload)


def proof_to_json_file(proof, path: str):
    arrays: List[np.ndarray] = []
    enc = _encode(proof_to_payload(proof), arrays)
    with open(path, "w") as fh:
        json.dump({"payload": enc, "arrays": [a.tolist() for a in arrays]}, fh)


def proof_from_json_file(path: str):
    with open(path) as fh:
        d = json.load(fh)
    arrays = {f"arr_{i}": np.asarray(a, dtype=np.uint32) for i, a in enumerate(d["arrays"])}
    return proof_from_payload(_decode(d["payload"], arrays))


def pie_to_file(pie, path: str):
    write_msg_file(
        path,
        "pie",
        {
            "tables": {
                name: {"columns": dict(t.columns)} for name, t in pie.trace_tables.items()
            },
            "metadata": pie.metadata.to_dict(),
        },
    )


def pie_from_file(path: str):
    from .air.pie import LuminairPie, Metadata, TraceTable

    kind, payload = read_msg_file(path)
    if kind != "pie":
        raise SerializationError(f"expected pie file, got {kind}")
    tables = {
        name: TraceTable(name, {k: np.asarray(v, dtype=np.uint32) for k, v in d["columns"].items()})
        for name, d in payload["tables"].items()
    }
    return LuminairPie(tables, Metadata.from_dict(payload["metadata"]))
