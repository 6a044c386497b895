"""Ground-truth parity against the reference's tutorial notebook.

/root/reference/tutorial.ipynb ships with stored cell outputs produced by an
actual run of the Rust engine (PyO3 binding) on the full eng.aspell lexicon —
exact float values, result ordering (including ties), `via` provenance, and
unicode offsets. The Rust toolchain is not available in this environment, so
these stored outputs are the strongest executable ground truth there is: this
test parses them out of the notebook at run time and compares our engine's
dicts value-for-value.

Covers: find_variants default params (2 queries, 19+18 ranked rows),
find_all_matches with unicodeoffsets (5 matches x full variant lists, plus a
bigram "sep arate" recombination), and a transparent variant-list model with
`via` provenance (tutorial cells 15-32).
"""

import ast
import json
import os

import pytest

from analiticcl import SearchParameters, VariantModel, Weights

NOTEBOOK = "/root/reference/tutorial.ipynb"
REF_EXAMPLES = "/root/reference/examples"
ALPHABET = os.path.join(REF_EXAMPLES, "simple.alphabet.tsv")
ENG_LEXICON = os.path.join(REF_EXAMPLES, "eng.aspell.lexicon")


def _cell_outputs(src_fragment: str):
    """Printed dicts of the code cell whose source contains the fragment."""
    nb = json.load(open(NOTEBOOK, encoding="utf-8"))
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        source = "".join(cell["source"])
        if src_fragment in source:
            lines = []
            for out in cell.get("outputs", []):
                if out.get("output_type") == "stream":
                    lines.extend(
                        ln for ln in "".join(out["text"]).splitlines() if ln.strip()
                    )
            return [ast.literal_eval(ln) for ln in lines if ln.startswith("{")]
    raise AssertionError(f"cell not found: {src_fragment!r}")


def _norm(obj):
    """Normalize lexicon paths (the notebook ran with relative paths)."""
    if isinstance(obj, dict):
        return {
            k: (
                [os.path.basename(x) for x in v]
                if k == "lexicons"
                else _norm(v)
            )
            for k, v in obj.items()
        }
    if isinstance(obj, list):
        return [_norm(x) for x in obj]
    return obj


@pytest.fixture(scope="module")
def eng_model():
    model = VariantModel(ALPHABET, Weights())
    model.read_lexicon(ENG_LEXICON)
    model.build()
    return model


def test_tutorial_find_variants_separate(eng_model):
    want = _norm(_cell_outputs('model.find_variants("separate", SearchParameters())'))
    got = _norm(eng_model.find_variants("separate", SearchParameters()))
    assert got == want


def test_tutorial_find_variants_seperate(eng_model):
    want = _norm(_cell_outputs('model.find_variants("seperate", SearchParameters())'))
    got = _norm(eng_model.find_variants("seperate", SearchParameters()))
    assert got == want


def test_tutorial_find_all_matches_unigrams(eng_model):
    want = _norm(
        _cell_outputs('"We would like seperate beds", SearchParameters(unicodeof')
    )
    got = _norm(
        eng_model.find_all_matches(
            "We would like seperate beds", SearchParameters(unicodeoffsets=True)
        )
    )
    assert got == want


def test_tutorial_find_all_matches_bigram_recombination(eng_model):
    want = _norm(
        _cell_outputs('"We would like sep arate beds", SearchParameters(unicodeo')
    )
    got = _norm(
        eng_model.find_all_matches(
            "We would like sep arate beds", SearchParameters(unicodeoffsets=True)
        )
    )
    # the notebook printed only matches[3]
    assert _norm([got[3]]) == want


def test_tutorial_transparent_variants_via(tmp_path):
    variantlist = tmp_path / "example.variantlist.tsv"
    variantlist.write_text("separate\tseperate\t1.0\tseprate\t1.0\n")
    model2 = VariantModel(ALPHABET, Weights())
    model2.read_variants(str(variantlist), transparent=True)
    model2.build()

    params = SearchParameters(
        max_anagram_distance=2, max_edit_distance=2, max_matches=1
    )
    want_exact = _norm(
        _cell_outputs('model2.find_variants("seperate", SearchParameters(max_anagram_distance=2')
    )
    got_exact = _norm(model2.find_variants("seperate", params))
    assert got_exact == want_exact

    want_fuzzy = _norm(
        _cell_outputs('model2.find_variants("operate", SearchParameters(max_anagram_distance=2')
    )
    got_fuzzy = _norm(model2.find_variants("operate", params))
    assert got_fuzzy == want_fuzzy
