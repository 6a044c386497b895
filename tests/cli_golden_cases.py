"""Shared scenario definitions for the CLI golden-byte fixtures.

Used by tools/gen_cli_golden.py (writes tests/fixtures_cli/*) and
tests/test_cli_golden.py (byte-compares current emitter output against those
fixtures). Inputs derive deterministically from the reference's shipped
eng.aspell lexicon, so generation and verification always agree.
"""

import os
import random

REF_LEX = "/root/reference/examples/eng.aspell.lexicon"
REF_NLD = "/root/reference/examples/nld.aspell.lexicon"
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


def small_lexicon2(tmpdir: str = "/tmp") -> str:
    """A second deterministic slice (disjoint range) — gives learn
    --multi-output two lexicons to split rows across."""
    with open(REF_LEX, encoding="utf-8") as f:
        words = [l.split("\t")[0] for l in f.read().splitlines() if l]
    rng = random.Random(23)
    rows = [f"{w}\t{rng.randrange(1, 5000)}" for w in words[10000:16000]]
    path = "/tmp/analiticcl_golden_lex2.tsv"
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(rows) + "\n")
    return path


def unicode_lexicon(tmpdir: str = "/tmp") -> str:
    """A deterministic nld.aspell slice biased toward accented words (the
    simple alphabet folds á/é/ë/... into their base classes), for the
    non-ASCII + --unicode-offsets fixtures."""
    with open(REF_NLD, encoding="utf-8") as f:
        words = [l.split("\t")[0] for l in f.read().splitlines() if l]
    accented = [w for w in words if not w.isascii()]
    plain = [w for w in words if w.isascii()]
    rng = random.Random(29)
    rows = [
        f"{w}\t{rng.randrange(1, 5000)}"
        for w in accented[:2000] + plain[5000:11000]
    ]
    path = "/tmp/analiticcl_golden_nld.tsv"
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


def unicode_search_inputs():
    """Running-text lines built from accented nld words: multi-byte
    codepoints make UTF-8 byte offsets diverge from unicode-point offsets,
    so the -u fixtures pin both surfaces (reference search.rs:527-546)."""
    with open(REF_NLD, encoding="utf-8") as f:
        words = [l.split("\t")[0] for l in f.read().splitlines() if l]
    accented = [w for w in words if not w.isascii()][:2000]
    plain = [w for w in words if w.isascii()][5000:11000]
    rng = random.Random(31)
    lines = []
    for i in range(80):
        n = 4 + (i % 4)
        toks = []
        for j in range(n):
            pool = accented if (i + j) % 2 == 0 else plain
            toks.append(_corrupt(rng.choice(pool), rng))
        lines.append(" ".join(toks) + ".")
    return lines


def cases(lexicon_path: str):
    """Fixture scenarios: (name, CLI argv, stdin lines, extra output files).

    ``extra`` lists (label, path) side-channel files the run produces
    (learn --multi-output per-lexicon files); their bytes are appended to
    the fixture after a separator so they are golden-pinned too."""
    common = ["-a", REF_ALPHA, "-l", lexicon_path, "--backend", "oracle"]
    lex2 = small_lexicon2()
    nld = unicode_lexicon()
    ucommon = ["-a", REF_ALPHA, "-l", nld, "--backend", "oracle"]
    mcommon = [
        "-a", REF_ALPHA, "-l", lexicon_path, "-l", lex2, "--backend", "oracle",
    ]
    q = query_inputs()
    s = search_inputs()
    l = learn_inputs()
    u = unicode_search_inputs()
    lm = learn_multi_inputs()
    return [
        ("query.tsv", ["query", *common, "-n", "5"], q, []),
        ("query.json", ["query", *common, "-n", "5", "--json"], q, []),
        (
            "query_lexmatch.tsv",
            ["query", *common, "-n", "5", "--output-lexmatch"],
            q,
            [],
        ),
        ("search.tsv", ["search", *common, "-n", "3", "-N", "2"], s, []),
        ("search.json", ["search", *common, "-n", "3", "-N", "2", "--json"], s, []),
        ("learn.tsv", ["learn", *common, "-n", "3", "-I", "1"], l, []),
        ("learn.json", ["learn", *common, "-n", "3", "-I", "1", "--json"], l, []),
        # non-ASCII text: byte offsets (default) vs unicode-point offsets (-u)
        ("search_unicode.tsv", ["search", *ucommon, "-n", "3", "-N", "2"], u, []),
        (
            "search_unicode_u.tsv",
            ["search", *ucommon, "-n", "3", "-N", "2", "-u"],
            u,
            [],
        ),
        (
            "search_unicode_u.json",
            ["search", *ucommon, "-n", "3", "-N", "2", "-u", "--json"],
            u,
            [],
        ),
        # learn --multi-output: per-lexicon variant files (TSV and JSON rows)
        (
            "learn_multi.tsv",
            ["learn", *mcommon, "-n", "3", "-I", "1", "-O"],
            lm,
            [
                ("lex1", f"{lexicon_path}.variants.tsv"),
                ("lex2", f"{lex2}.variants.tsv"),
            ],
        ),
        (
            "learn_multi.json",
            ["learn", *mcommon, "-n", "3", "-I", "1", "-O", "--json"],
            lm,
            [
                ("lex1", f"{lexicon_path}.variants.json"),
                ("lex2", f"{lex2}.variants.json"),
            ],
        ),
        # interactive mode (-x): per-line unbatched framing, same emitters
        ("query_interactive.tsv", ["query", *common, "-n", "5", "-x"], q, []),
        # anagram-index dump: one line per anagram value, value then member
        # words tab-joined (bin:1190-1204; our canonical (anavalue, vid)
        # order is deterministic where the reference's HashMap iter is not —
        # divergence documented in PARITY.md)
        ("index.tsv", ["index", *common], [], []),
        # alphabet encodability check (bin:1007-1023): OK rows carry
        # input \t anagram value \t Rust-Debug-style norm vector
        ("testinput.tsv", ["testinput", "-a", REF_ALPHA], testinput_inputs(), []),
    ]


def testinput_inputs():
    """Mixed encodable / unencodable lines: OK rows print to stdout (pinned
    here), UNKNOWN rows go to stderr like the reference's eprintln
    (bin:1007-1023) so they pin as ABSENCE from the fixture."""
    with open(REF_LEX, encoding="utf-8") as f:
        words = [l.split("\t")[0] for l in f.read().splitlines() if l]
    out = words[2000:10000:40][:180]
    out += ["Hello World", "num8er", "semi;colon", "dash-ed", "ünïcode"]
    return out


def learn_multi_inputs():
    """Corrupted words drawn from BOTH multi-output lexicons, so learned
    variants carry distinct lexindex memberships."""
    with open(REF_LEX, encoding="utf-8") as f:
        words = [l.split("\t")[0] for l in f.read().splitlines() if l]
    rng = random.Random(37)
    pool = words[2000:10000:9] + words[10000:16000:7]
    return [_corrupt(rng.choice(pool), rng) for _ in range(400)]


def fixture_bytes(stdout_text: str, extra) -> str:
    """Assemble the full golden payload: stdout + each side file behind a
    separator line (missing files pin as absent)."""
    parts = [stdout_text]
    for label, path in extra:
        parts.append(f"\n===== {label} =====\n")
        try:
            with open(path, encoding="utf-8") as f:
                parts.append(f.read())
        except OSError:
            parts.append("<absent>\n")
    return "".join(parts)
