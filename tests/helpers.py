"""Canonical golden fixtures — re-exported from the package's
golden_fixtures module (the analog of the reference's test-helpers crate,
/root/reference/wormhole/tests/test-helpers/src/lib.rs)."""

from zk_circuits_tpu.circuits.wormhole.golden_fixtures import (  # noqa: F401
    DEFAULT_EXIT_ACCOUNT,
    DEFAULT_FUNDING_ACCOUNT,
    DEFAULT_FUNDING_AMOUNT,
    DEFAULT_ROOT_HASH,
    DEFAULT_SECRET,
    DEFAULT_STORAGE_PROOF,
    DEFAULT_STORAGE_PROOF_INDICES,
    DEFAULT_TO_ACCOUNT,
    DEFAULT_TRANSFER_COUNT,
    EXPECTED_NULLIFIER,
    EXPECTED_ROOT_HASH,
    processed_storage_proof,
    test_inputs,
)
