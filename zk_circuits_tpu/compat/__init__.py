"""Reference-format compatibility layer.

Readers for the byte formats produced by the reference stack (qp-plonky2's
DefaultGateSerializer artifacts and proof serialization — the files under
/root/reference/wormhole/bench-data/) and a host verifier that checks
reference-produced proofs.  This is the interop/parity surface: a user of
the reference can hand our framework their common.bin / verifier.bin /
proof.bin and verify them here (SURVEY.md §7.3 item 6).
"""

from .serde import (  # noqa: F401
    RefCommonData,
    RefProof,
    RefVerifierData,
    read_common_data,
    read_proof,
    read_verifier_data,
)
