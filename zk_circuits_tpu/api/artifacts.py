"""Circuit-artifact (de)serialization: common.bin / verifier.bin / prover.bin.

The analog of the reference's three-artifact checkpoint flow
(/root/reference/wormhole/circuit-builder/src/lib.rs:11-66 writes the bins;
prover/verifier constructors reload them, prover/src/lib.rs:104-187).

common.bin and verifier.bin use a compact custom binary format (json header
+ raw u64 arrays); prover.bin additionally carries the preprocessed
commitment and witness schedule via numpy's npz container (documented
provisional format, versioned)."""

from __future__ import annotations

import io
import json
import pickle
import struct
from pathlib import Path

import numpy as np

from ..circuits.wormhole.circuit import WormholeCircuit
from ..iop.gates import gate_from_id
from ..plonk.circuit_data import CommonCircuitData, VerifierOnlyCircuitData
from ..plonk.config import CircuitConfig, FriConfig

MAGIC = b"ZKTC"
VERSION = 1


def _config_to_dict(cfg: CircuitConfig) -> dict:
    d = {k: getattr(cfg, k) for k in (
        "num_wires", "num_routed_wires", "num_constants", "use_base_arithmetic_gate",
        "security_bits", "num_challenges", "zero_knowledge", "max_quotient_degree_factor",
    )}
    f = cfg.fri_config
    d["fri"] = {k: getattr(f, k) for k in (
        "rate_bits", "cap_height", "proof_of_work_bits", "reduction_arity_bits",
        "final_poly_bits", "num_query_rounds",
    )}
    return d


def _config_from_dict(d: dict) -> CircuitConfig:
    fri = FriConfig(**d.pop("fri"))
    return CircuitConfig(fri_config=fri, **d)


def common_data_to_bytes(common: CommonCircuitData) -> bytes:
    header = {
        "config": _config_to_dict(common.config),
        "degree_bits": common.degree_bits,
        "gate_ids": [g.id for g in common.gate_types],
        "selector_groups": common.selector_groups,
        "num_gate_constraints": common.num_gate_constraints,
        "num_public_inputs": common.num_public_inputs,
    }
    hb = json.dumps(header).encode()
    buf = io.BytesIO()
    buf.write(MAGIC)
    buf.write(struct.pack("<II", VERSION, len(hb)))
    buf.write(hb)
    buf.write(np.ascontiguousarray(common.k_is).tobytes())
    buf.write(np.ascontiguousarray(common.circuit_digest).tobytes())
    return buf.getvalue()


def common_data_from_bytes(data: bytes) -> CommonCircuitData:
    buf = io.BytesIO(data)
    assert buf.read(4) == MAGIC, "bad common.bin magic"
    version, hlen = struct.unpack("<II", buf.read(8))
    assert version == VERSION
    header = json.loads(buf.read(hlen))
    config = _config_from_dict(header["config"])
    gate_types = [gate_from_id(g) for g in header["gate_ids"]]
    gate_to_index = {g.id: i for i, g in enumerate(gate_types)}
    groups = [list(g) for g in header["selector_groups"]]
    gate_to_group = {}
    for gi, grp in enumerate(groups):
        for idx in grp:
            gate_to_group[gate_types[idx].id] = gi
    k_is = np.frombuffer(buf.read(8 * config.num_routed_wires), dtype="<u8").astype(np.uint64)
    digest = np.frombuffer(buf.read(32), dtype="<u8").astype(np.uint64)
    common = CommonCircuitData(
        config=config,
        degree_bits=header["degree_bits"],
        gate_types=gate_types,
        selector_groups=groups,
        gate_to_group=gate_to_group,
        gate_to_index=gate_to_index,
        num_gate_constraints=header["num_gate_constraints"],
        num_public_inputs=header["num_public_inputs"],
        k_is=k_is,
        circuit_digest=digest,
    )
    return common


def verifier_data_to_bytes(vo: VerifierOnlyCircuitData) -> bytes:
    buf = io.BytesIO()
    buf.write(b"ZKTV")
    buf.write(struct.pack("<II", VERSION, vo.constants_sigmas_cap.shape[0]))
    buf.write(np.ascontiguousarray(vo.constants_sigmas_cap).tobytes())
    buf.write(np.ascontiguousarray(vo.circuit_digest).tobytes())
    return buf.getvalue()


def verifier_data_from_bytes(data: bytes) -> VerifierOnlyCircuitData:
    buf = io.BytesIO(data)
    assert buf.read(4) == b"ZKTV", "bad verifier.bin magic"
    version, cap_len = struct.unpack("<II", buf.read(8))
    assert version == VERSION
    cap = np.frombuffer(buf.read(32 * cap_len), dtype="<u8").astype(np.uint64).reshape(cap_len, 4)
    digest = np.frombuffer(buf.read(32), dtype="<u8").astype(np.uint64)
    return VerifierOnlyCircuitData(cap, digest)


def prover_data_to_bytes(circuit_data, targets) -> bytes:
    # Provisional container: versioned pickle of the prover-only data +
    # fragment targets (pure-python dataclasses of ints).
    return pickle.dumps(
        {"version": VERSION, "prover_only": circuit_data.prover_only, "targets": targets},
        protocol=4,
    )


def generate_circuit_binaries(out_dir, include_prover: bool = True,
                              config: CircuitConfig | None = None):
    """Build the wormhole circuit and write common.bin / verifier.bin /
    prover.bin (circuit-builder/src/lib.rs:11-66)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    config = config or CircuitConfig.standard_recursion_config()
    circuit = WormholeCircuit(config)
    targets = circuit.targets()
    data = circuit.build_circuit()
    (out / "common.bin").write_bytes(common_data_to_bytes(data.common))
    (out / "verifier.bin").write_bytes(verifier_data_to_bytes(data.verifier_only))
    if include_prover:
        (out / "prover.bin").write_bytes(prover_data_to_bytes(data, targets))
    return data


def load_verifier(verifier_path, common_path):
    from .verifier import WormholeVerifier

    common = common_data_from_bytes(Path(common_path).read_bytes())
    vo = verifier_data_from_bytes(Path(verifier_path).read_bytes())
    return WormholeVerifier.from_parts(common, vo)


def load_prover(prover_path, common_path):
    from ..plonk.circuit_data import CircuitData, VerifierOnlyCircuitData
    from .prover import WormholeProver

    common = common_data_from_bytes(Path(common_path).read_bytes())
    blob = pickle.loads(Path(prover_path).read_bytes())
    assert blob["version"] == VERSION
    po = blob["prover_only"]
    vo = VerifierOnlyCircuitData(
        po.constants_sigmas_commitment.cap.copy(), common.circuit_digest
    )
    data = CircuitData(common, po, vo)
    return WormholeProver(circuit_data=data, targets=blob["targets"])


def _main() -> None:
    """CLI analog of the reference's circuit-builder binary
    (circuit-builder/src/main.rs): python -m zk_circuits_tpu.api.artifacts
    [out_dir] [--no-prover]."""
    import sys

    args = [a for a in sys.argv[1:]]
    include_prover = "--no-prover" not in args
    args = [a for a in args if not a.startswith("--")]
    out_dir = args[0] if args else "generated-bins"
    print(f"building wormhole circuit -> {out_dir}/", flush=True)
    generate_circuit_binaries(out_dir, include_prover=include_prover)
    print("wrote common.bin, verifier.bin"
          + (", prover.bin" if include_prover else ""))


if __name__ == "__main__":
    _main()
