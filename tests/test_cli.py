"""CLI end-to-end tests (subprocess, oracle backend for speed)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALPHABET = "/root/reference/examples/simple.alphabet.tsv"
AMPHIBIANS = "/root/reference/bindings/python/tests/amphibians.tsv"
REPTILES = "/root/reference/bindings/python/tests/reptiles.tsv"

ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def run_cli(args, stdin=""):
    proc = subprocess.run(
        [sys.executable, "-m", "analiticcl_tpu.cli", *args],
        input=stdin,
        capture_output=True,
        text=True,
        cwd=REPO,
        env=ENV,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_query_tsv():
    out = run_cli(
        ["query", "-a", ALPHABET, "-l", AMPHIBIANS, "--backend", "oracle"],
        stdin="frog\nsaalamander\n",
    )
    lines = out.strip().split("\n")
    assert lines[0].startswith("frog\tfrog\t1\t")
    assert "salamander" in lines[1]


def test_query_json():
    out = run_cli(
        ["query", "-a", ALPHABET, "-l", AMPHIBIANS, "--backend", "oracle", "--json"],
        stdin="frog\n",
    )
    data = json.loads(out)
    assert data[0]["input"] == "frog"
    assert data[0]["variants"][0]["text"] == "frog"
    assert data[0]["variants"][0]["score"] == 1


def test_query_lexmatch():
    out = run_cli(
        [
            "query", "-a", ALPHABET, "-l", AMPHIBIANS, "-l", REPTILES,
            "--backend", "oracle", "--output-lexmatch",
        ],
        stdin="lizard\n",
    )
    assert REPTILES in out
    assert f'"{AMPHIBIANS}' not in out.split("\n")[0].split("lizard\t")[-1].split("\t")[0]


def test_search_mode():
    out = run_cli(
        [
            "search", "-a", ALPHABET, "-l", AMPHIBIANS, "--backend", "oracle",
            "-N", "1",
        ],
        stdin="a frog and a salamandr\n",
    )
    assert "salamandr\t" in out
    assert "salamander" in out
    assert ":" in out  # offsets


def test_index_mode():
    out = run_cli(
        ["index", "-a", ALPHABET, "-l", AMPHIBIANS, "--backend", "oracle"],
    )
    lines = out.strip().split("\n")
    assert lines
    first = lines[0].split("\t")
    assert first[0].isdigit()  # anagram value
    assert len(first) >= 2  # at least one word


def test_learn_mode():
    out = run_cli(
        [
            "learn", "-a", ALPHABET, "-l", AMPHIBIANS, "--backend", "oracle",
            "--strict", "-t", "0.5",
        ],
        stdin="frgo\nfrgo\n",
    )
    # learned variant list: reference word followed by variant/score pairs
    assert "frog\tfrgo\t" in out


def test_testinput_mode():
    out = run_cli(["testinput", "-a", ALPHABET], stdin="hello\n")
    assert out.startswith("OK: hello\t")
