"""CircuitSettings: lookup-table layouts shared by prover & verifier
(reference: crates/air/src/settings.rs).  JSON + compact binary file serde
(the reference ships bincode + JSON; here the binary format is a
deterministic little-endian layout, see serde.py)."""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Optional

from .preprocessed import LookupLayout


@dataclass
class Lookups:
    sin: Optional[LookupLayout] = None
    exp2: Optional[LookupLayout] = None
    log2: Optional[LookupLayout] = None
    range_check_bits: Optional[int] = None  # 8 when less_than is present

    def to_dict(self):
        return {
            "sin": self.sin.to_dict() if self.sin else None,
            "exp2": self.exp2.to_dict() if self.exp2 else None,
            "log2": self.log2.to_dict() if self.log2 else None,
            "range_check_bits": self.range_check_bits,
        }

    @staticmethod
    def from_dict(d):
        return Lookups(
            sin=LookupLayout.from_dict(d["sin"]) if d.get("sin") else None,
            exp2=LookupLayout.from_dict(d["exp2"]) if d.get("exp2") else None,
            log2=LookupLayout.from_dict(d["log2"]) if d.get("log2") else None,
            range_check_bits=d.get("range_check_bits"),
        )


@dataclass
class CircuitSettings:
    lookups: Lookups = field(default_factory=Lookups)

    def to_dict(self):
        return {"lookups": self.lookups.to_dict()}

    @staticmethod
    def from_dict(d):
        return CircuitSettings(Lookups.from_dict(d["lookups"]))

    def to_json_file(self, path: str):
        with open(path, "w") as f:
            json.dump(self.to_dict(), f)

    @staticmethod
    def from_json_file(path: str) -> "CircuitSettings":
        with open(path) as f:
            return CircuitSettings.from_dict(json.load(f))

    def to_bin_file(self, path: str):
        from .. import serde

        serde.write_msg_file(path, "settings", self.to_dict())

    @staticmethod
    def from_bin_file(path: str) -> "CircuitSettings":
        from .. import serde

        kind, d = serde.read_msg_file(path)
        assert kind == "settings"
        return CircuitSettings.from_dict(d)
