"""Shared scenario definitions for the CLI golden-byte fixtures.

Used by tools/gen_cli_golden.py (writes tests/fixtures_cli/*) and
tests/test_cli_golden.py (byte-compares current emitter output against those
fixtures). Inputs derive deterministically from the reference's shipped
eng.aspell lexicon, so generation and verification always agree.
"""

import os
import random

REF_LEX = "/root/reference/examples/eng.aspell.lexicon"
REF_ALPHA = "/root/reference/examples/simple.alphabet.tsv"
FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures_cli")


def small_lexicon(tmpdir: str = "/tmp") -> str:
    """A deterministic 8000-entry slice of eng.aspell with frequencies.

    Written to a FIXED canonical path: --output-lexmatch embeds the lexicon
    path in the output bytes, so generation and verification must agree on
    it."""
    with open(REF_LEX, encoding="utf-8") as f:
        words = [l.split("\t")[0] for l in f.read().splitlines() if l]
    rng = random.Random(11)
    rows = []
    for w in words[2000:10000]:
        rows.append(f"{w}\t{rng.randrange(1, 5000)}")
    path = "/tmp/analiticcl_golden_lex.tsv"
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(rows) + "\n")
    return path


def _corrupt(word, rng):
    if len(word) < 4:
        return word
    i = rng.randrange(len(word) - 1)
    c = rng.randrange(4)
    if c == 0:
        return word[:i] + word[i + 1 :]
    if c == 1:
        return word[:i] + word[i + 1] + word[i] + word[i + 2 :]
    if c == 2:
        return word[:i] + "x" + word[i:]
    return word[:i] + "q" + word[i + 1 :]


def query_inputs():
    with open(REF_LEX, encoding="utf-8") as f:
        words = [l.split("\t")[0] for l in f.read().splitlines() if l]
    rng = random.Random(13)
    base = words[2000:10000:14]
    out = [_corrupt(w, rng) for w in base][:400]
    out += ["", "zzzzqqqq", 'quo"ted']  # empty line, no-hit, JSON escaping
    return out


def search_inputs():
    with open(REF_LEX, encoding="utf-8") as f:
        words = [l.split("\t")[0] for l in f.read().splitlines() if l]
    rng = random.Random(17)
    pool = words[2000:10000:11]
    lines = []
    for i in range(120):
        n = 4 + (i % 5)
        lines.append(
            " ".join(_corrupt(rng.choice(pool), rng) for _ in range(n)) + "."
        )
    return lines


def learn_inputs():
    with open(REF_LEX, encoding="utf-8") as f:
        words = [l.split("\t")[0] for l in f.read().splitlines() if l]
    rng = random.Random(19)
    pool = words[2000:10000:9]
    return [_corrupt(rng.choice(pool), rng) for _ in range(500)]


def cases(lexicon_path: str):
    """(fixture name, CLI argv, stdin lines) per mode."""
    common = ["-a", REF_ALPHA, "-l", lexicon_path, "--backend", "oracle"]
    q = query_inputs()
    s = search_inputs()
    l = learn_inputs()
    return [
        ("query.tsv", ["query", *common, "-n", "5"], q),
        ("query.json", ["query", *common, "-n", "5", "--json"], q),
        (
            "query_lexmatch.tsv",
            ["query", *common, "-n", "5", "--output-lexmatch"],
            q,
        ),
        ("search.tsv", ["search", *common, "-n", "3", "-N", "2"], s),
        ("search.json", ["search", *common, "-n", "3", "-N", "2", "--json"], s),
        ("learn.tsv", ["learn", *common, "-n", "3", "-I", "1"], l),
        ("learn.json", ["learn", *common, "-n", "3", "-I", "1", "--json"], l),
    ]
