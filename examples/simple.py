"""The reference's examples/simple (examples/simple/src/main.rs:1-56):
2x2 mul + add graph; compile -> settings -> trace -> prove -> verify ->
serialize proof & settings."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from luminair_tpu.prelude import *
from luminair_tpu import serde


def main():
    cx = Graph()
    a = cx.tensor((2, 2)).set([[1.0, 2.0], [3.0, 4.0]])
    b = cx.tensor((2, 2)).set([[10.0, 20.0], [30.0, 40.0]])
    c = (a * b + a).retrieve()

    cx.compile()

    settings = gen_circuit_settings(cx)
    pie = gen_trace(cx, settings)

    t0 = time.time()
    proof = prove(pie, settings)
    print(f"proved in {time.time() - t0:.2f}s")

    t0 = time.time()
    assert verify(proof, settings)
    print(f"verified in {time.time() - t0:.2f}s")

    print("output:", c.data().tolist())

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    serde.proof_to_file(proof, os.path.join(out_dir, "proof.bin"))
    settings.to_json_file(os.path.join(out_dir, "settings.json"))
    proof2 = serde.proof_from_file(os.path.join(out_dir, "proof.bin"))
    assert verify(proof2, CircuitSettings.from_json_file(os.path.join(out_dir, "settings.json")))
    print("serialized proof re-verified OK")


if __name__ == "__main__":
    main()
