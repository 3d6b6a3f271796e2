"""Wormhole circuit inputs and public-input layout.

Port of /root/reference/wormhole/circuit/src/inputs.rs: public-input felt
layout (16 felts): nullifier[0..4], root_hash[4..8], funding_amount[8..12],
exit_account[12..16] (inputs.rs:12-19, 91-104)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ...utils import codecs

LEAF_PI_LEN = 16
NULLIFIER_START_INDEX = 0
NULLIFIER_END_INDEX = 4
ROOT_HASH_START_INDEX = 4
ROOT_HASH_END_INDEX = 8
FUNDING_AMOUNT_START_INDEX = 8
FUNDING_AMOUNT_END_INDEX = 12
EXIT_ACCOUNT_START_INDEX = 12
EXIT_ACCOUNT_END_INDEX = 16


@dataclass
class ProcessedStorageProof:
    """A storage proof plus per-node indices of the committed child hash
    (storage_proof/mod.rs:59-77)."""

    proof: list[bytes]
    indices: list[int]

    def __post_init__(self):
        if len(self.proof) != len(self.indices):
            raise ValueError(
                "indices length must be equal to proof length, actual lengths: "
                f"{len(self.proof)}, {len(self.indices)}"
            )


@dataclass
class PublicCircuitInputs:
    funding_amount: int          # u128
    nullifier: bytes             # 32-byte digest
    root_hash: bytes             # 32-byte digest
    exit_account: bytes          # 32-byte digest

    @staticmethod
    def try_from_slice(pis: np.ndarray) -> "PublicCircuitInputs":
        if len(pis) != LEAF_PI_LEN:
            raise ValueError(
                f"public inputs should contain: {LEAF_PI_LEN} field elements, "
                f"got: {len(pis)}"
            )
        nullifier = codecs.digest_felts_to_bytes(pis[NULLIFIER_START_INDEX:NULLIFIER_END_INDEX])
        codecs.validate_bytes_digest(nullifier)
        root_hash = codecs.digest_felts_to_bytes(pis[ROOT_HASH_START_INDEX:ROOT_HASH_END_INDEX])
        codecs.validate_bytes_digest(root_hash)
        funding_amount = codecs.felts_to_u128(
            pis[FUNDING_AMOUNT_START_INDEX:FUNDING_AMOUNT_END_INDEX]
        )
        exit_account = codecs.digest_felts_to_bytes(
            pis[EXIT_ACCOUNT_START_INDEX:EXIT_ACCOUNT_END_INDEX]
        )
        codecs.validate_bytes_digest(exit_account)
        return PublicCircuitInputs(funding_amount, nullifier, root_hash, exit_account)

    @staticmethod
    def try_from_proof(proof_with_pis) -> "PublicCircuitInputs":
        return PublicCircuitInputs.try_from_slice(proof_with_pis.public_inputs)

    @staticmethod
    def try_from_aggregated(aggr, leaf_pi_len: int, num_leaves: int):
        """Split a root aggregated proof's PIs into per-leaf inputs
        (inputs.rs:61-89)."""
        pis = aggr.public_inputs
        expected = leaf_pi_len * num_leaves
        if len(pis) != expected:
            raise ValueError(
                f"aggregated public inputs should contain: {expected} "
                f"(= {num_leaves} leaves x {leaf_pi_len} fields), got: {len(pis)}"
            )
        return [
            PublicCircuitInputs.try_from_slice(pis[i * leaf_pi_len : (i + 1) * leaf_pi_len])
            for i in range(num_leaves)
        ]


@dataclass
class PrivateCircuitInputs:
    secret: bytes                       # 32 bytes
    storage_proof: ProcessedStorageProof
    transfer_count: int                 # u64
    funding_account: bytes              # 32-byte digest
    unspendable_account: bytes          # 32-byte digest


@dataclass
class CircuitInputs:
    public: PublicCircuitInputs
    private: PrivateCircuitInputs
