"""Codec round-trips mirroring the reference's utils_tests
(/root/reference/wormhole/tests/src/circuit/utils_tests.rs)."""

import numpy as np
import pytest

from zk_circuits_tpu.host.gl import P_INT
from zk_circuits_tpu.utils import codecs


def test_u128_round_trip():
    for v in [0, 1, 2**32 - 1, 2**32, 2**64, 2**128 - 1, 1_000_000_000_000]:
        felts = codecs.u128_to_felts(v)
        assert felts.shape == (4,)
        assert all(f < 2**32 for f in felts)
        assert codecs.felts_to_u128(felts) == v


def test_u64_round_trip():
    for v in [0, 1, 2**32 - 1, 2**32, 2**64 - 1, 4]:
        felts = codecs.u64_to_felts(v)
        assert codecs.felts_to_u64(felts) == v


def test_u64_limb_order():
    # High limb first (utils.rs:126-131).
    felts = codecs.u64_to_felts((5 << 32) | 7)
    assert felts[0] == 5 and felts[1] == 7


def test_felts_to_u64_rejects_wide_limb():
    with pytest.raises(codecs.FeltWidthError):
        codecs.felts_to_u64(np.array([2**32, 0], dtype=np.uint64))


def test_injective_bytes_round_trip():
    data = bytes(range(32))
    felts = codecs.injective_bytes_to_felts(data)
    assert felts.shape == (8,)
    assert codecs.injective_felts_to_bytes(felts) == data


def test_injective_partial_chunk_pads():
    felts = codecs.injective_bytes_to_felts(b"\x01\x02")
    assert felts[0] == 0x0201


def test_injective_string():
    felts = codecs.injective_string_to_felts("wormhole")
    assert felts[0] == int.from_bytes(b"worm", "little")
    assert felts[1] == int.from_bytes(b"hole", "little")


def test_digest_round_trip_and_validation():
    data = bytes(range(32))
    codecs.validate_bytes_digest(data)
    felts = codecs.digest_bytes_to_felts(data)
    assert codecs.digest_felts_to_bytes(felts) == data

    bad = (P_INT).to_bytes(8, "little") + bytes(24)
    with pytest.raises(codecs.DigestError):
        codecs.validate_bytes_digest(bad)
    with pytest.raises(codecs.DigestError):
        codecs.validate_bytes_digest(bytes(31))
