"""analiticcl-compatible Python API tests (mirrors
/root/reference/bindings/python/tests/tests.py plus surface checks)."""

import pytest

from analiticcl_tpu.api import (
    SearchParameters,
    VariantModel,
    VocabParams,
    Weights,
)

ALPHABET = "/root/reference/examples/simple.alphabet.tsv"
LEXICON_AMPHIBIANS = "/root/reference/bindings/python/tests/amphibians.tsv"
LEXICON_REPTILES = "/root/reference/bindings/python/tests/reptiles.tsv"


def test_find_all_matches_with_multiple_lexicons():
    model = VariantModel(ALPHABET, Weights(), debug=False)
    model.read_lexicon(LEXICON_AMPHIBIANS)
    model.read_lexicon(LEXICON_REPTILES)
    model.build()
    results = model.find_all_matches(
        "Salamander lizard frog snake toad",
        SearchParameters(max_edit_distance=3, max_ngram=1),
    )
    assert len(results) == 5

    def assert_result(result, orig_term, lexicon, lex_term=None):
        lex_term = lex_term or orig_term
        assert result["input"] == orig_term
        assert len(result["variants"]) > 0
        best = result["variants"][0]
        assert best["text"] == lex_term
        assert best["lexicons"] == [lexicon]

    assert_result(results[0], "Salamander", LEXICON_AMPHIBIANS, "salamander")
    assert_result(results[1], "lizard", LEXICON_REPTILES)
    assert_result(results[2], "frog", LEXICON_AMPHIBIANS)
    assert_result(results[3], "snake", LEXICON_REPTILES)
    assert_result(results[4], "toad", LEXICON_AMPHIBIANS)


def test_weights_kwargs_and_attrs():
    w = Weights(ld=1.0, lcs=0.5)
    assert w.ld == 1.0
    assert w.lcs == 0.5
    w.prefix = 0.25
    assert w.to_dict()["prefix"] == 0.25
    with pytest.raises(ValueError):
        Weights(bogus=1)


def test_searchparameters_kwargs_and_threshold_coercion():
    p = SearchParameters(
        max_edit_distance=3,
        max_anagram_distance=(0.4, 5),
        max_matches=7,
        stop_at_exact_match=True,
    )
    assert p.max_edit_distance == 3
    assert p.max_anagram_distance == (0.4, 5)
    assert p.max_matches == 7
    assert p.stop_at_exact_match
    p.max_edit_distance = 0.3
    assert p.max_edit_distance == pytest.approx(0.3)
    p.stop_at_exact_match = False
    assert not p.stop_at_exact_match
    d = p.to_dict()
    assert d["max_matches"] == 7


def test_vocabparams_kwargs():
    vp = VocabParams(text_column=2, freq_column=None, vocabtype="LM", freqhandling="sum")
    assert vp.text_column == 2
    assert vp.freq_column is None


def test_find_variants_and_par():
    model = VariantModel(ALPHABET, Weights(), debug=0)
    model.read_lexicon(LEXICON_AMPHIBIANS)
    model.build()
    params = SearchParameters(max_edit_distance=2, score_threshold=0.0)
    res = model.find_variants("frog", params)
    assert res[0]["text"] == "frog"
    assert res[0]["score"] == 1.0
    assert res[0]["lexicons"] == [LEXICON_AMPHIBIANS]
    assert "dist_score" in res[0] and "freq_score" in res[0]

    par = model.find_variants_par(["frog", "saalamander"], params)
    assert par[0]["input"] == "frog"
    assert par[0]["variants"][0]["text"] == "frog"
    assert par[1]["variants"][0]["text"] == "salamander"


def test_contains():
    model = VariantModel(ALPHABET, Weights(), debug=0)
    model.read_lexicon(LEXICON_AMPHIBIANS)
    model.build()
    assert "frog" in model
    assert "xyzzy" not in model
