"""WormholeVerifier — the user-facing verification API.

Port of /root/reference/wormhole/verifier/src/lib.rs: host-side (numpy
only), cheap enough for on-chain-style environments."""

from __future__ import annotations

from ..circuits.wormhole.circuit import WormholeCircuit
from ..plonk.config import CircuitConfig
from ..plonk.verifier import verify as plonk_verify


class WormholeVerifier:
    def __init__(self, config: CircuitConfig | None = None, circuit_data=None):
        if circuit_data is None:
            circuit_data = WormholeCircuit(config).build_circuit()
        self.common = circuit_data.common
        self.verifier_only = circuit_data.verifier_only

    @staticmethod
    def from_parts(common, verifier_only) -> "WormholeVerifier":
        v = WormholeVerifier.__new__(WormholeVerifier)
        v.common = common
        v.verifier_only = verifier_only
        return v

    @staticmethod
    def new_from_files(verifier_path, common_path) -> "WormholeVerifier":
        from .artifacts import load_verifier

        return load_verifier(verifier_path, common_path)

    def verify(self, proof_with_pis) -> None:
        plonk_verify(self.common, self.verifier_only, proof_with_pis)
