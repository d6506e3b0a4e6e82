"""FSST encoder fuzz: byte equality vs the reference Java SymbolTableBuilder.

The compiled harness at /tmp/fsstref (javac'd from the reference sources)
encodes each corpus; our from-scratch builder must produce the identical
(symbol table, lengths, compressed) triple. Covers the residual risk the
fixture sweep can't reach — in particular Java HashMap treeified bins
(8-chains at >=64 capacity), sampling-path boundaries, and degenerate
alphabets. Default 200 cases; FSST_FUZZ_N=1000 for the full run."""

import os
import random
import shutil
import subprocess

import pytest

from maplibre_tile_spec_spark.functions.fsst import build_and_encode

HARNESS = "/tmp/fsstref/out"
N_CASES = int(os.environ.get("FSST_FUZZ_N", "200"))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(HARNESS) or shutil.which("java") is None,
    reason="compiled Java FSST harness unavailable",
)

WORDS = [
    b"street", b"avenue", b"north", b"south", b"main", b"park", b"lake",
    b"the", b"of", b"http://example.com/", b"restaurant", b"\xc3\xa9cole",
    b"building", b"121", b"boulevard", b"saint", b"san", b"via",
]


def _corpus(rng: random.Random, case: int) -> bytes:
    kind = case % 6
    if kind == 0:  # uniform random over a small alphabet
        alpha = bytes(rng.sample(range(256), rng.choice([2, 4, 16, 64])))
        n = rng.randint(16, 4096)
        return bytes(rng.choice(alpha) for _ in range(n))
    if kind == 1:  # word soup (dictionary-compressible text)
        n = rng.randint(4, 600)
        return b" ".join(rng.choice(WORDS) for _ in range(n))
    if kind == 2:  # long runs (repeat-heavy)
        out = b""
        for _ in range(rng.randint(1, 20)):
            out += bytes([rng.randrange(256)]) * rng.randint(1, 300)
        return out
    if kind == 3:  # repeated phrase with point mutations
        phrase = bytes(rng.randrange(256) for _ in range(rng.randint(3, 32)))
        data = bytearray(phrase * rng.randint(2, 200))
        for _ in range(len(data) // 17):
            data[rng.randrange(len(data))] = rng.randrange(256)
        return bytes(data)
    if kind == 4:  # tiny / boundary sizes
        return bytes(rng.randrange(256) for _ in range(rng.choice([1, 2, 3, 7, 8, 9])))
    # kind 5: big enough to engage the 30k sampling path
    blk = b"".join(rng.choice(WORDS) for _ in range(64))
    n = rng.randint(30_001, 80_000)
    return (blk * (n // len(blk) + 1))[:n]


def test_fuzz_byte_parity_vs_java(tmp_path):
    rng = random.Random(20260816)
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    cases = {}
    for i in range(N_CASES):
        data = _corpus(rng, i)
        cases[f"c{i:04d}"] = data
        (in_dir / f"c{i:04d}.bin").write_bytes(data)
    subprocess.run(
        [
            "java", "-cp", HARNESS,
            "org.maplibre.mlt.converter.encodings.fsst.RefBatch",
            str(in_dir), str(out_dir),
        ],
        check=True,
        capture_output=True,
    )
    mismatches = []
    for stem, data in cases.items():
        symbols, lengths, compressed = build_and_encode(data)
        j_sym = (out_dir / f"{stem}.symbols").read_bytes()
        j_len = [
            int(x) for x in (out_dir / f"{stem}.lengths").read_text().split()
        ]
        j_comp = (out_dir / f"{stem}.compressed").read_bytes()
        if bytes(symbols) != j_sym or list(lengths) != j_len or bytes(compressed) != j_comp:
            mismatches.append(stem)
    assert not mismatches, f"{len(mismatches)} corpora diverge from Java: {mismatches[:10]}"
