"""Type stub for the analiticcl-compatible API (mirrors analiticcl.pyi)."""

from typing import Dict, List, Optional, Sequence, Tuple, Union

ThresholdValue = Union[int, float, Tuple[float, int], str]

class Weights:
    ld: float
    lcs: float
    prefix: float
    suffix: float
    case: float
    def __init__(
        self,
        *,
        ld: float = ...,
        lcs: float = ...,
        prefix: float = ...,
        suffix: float = ...,
        case: float = ...,
    ) -> None: ...
    def to_dict(self) -> Dict[str, float]: ...

class SearchParameters:
    max_anagram_distance: ThresholdValue
    max_edit_distance: ThresholdValue
    max_matches: int
    score_threshold: float
    cutoff_threshold: float
    max_ngram: int
    max_seq: int
    single_thread: bool
    context_weight: float
    freq_weight: float
    lm_weight: float
    variantmodel_weight: float
    contextrules_weight: float
    consolidate_matches: bool
    unicodeoffsets: bool
    stop_at_exact_match: bool
    def __init__(
        self,
        *,
        max_anagram_distance: ThresholdValue = ...,
        max_edit_distance: ThresholdValue = ...,
        max_matches: int = ...,
        score_threshold: float = ...,
        cutoff_threshold: float = ...,
        max_ngram: int = ...,
        max_seq: int = ...,
        single_thread: bool = ...,
        context_weight: float = ...,
        freq_weight: float = ...,
        lm_weight: float = ...,
        variantmodel_weight: float = ...,
        contextrules_weight: float = ...,
        consolidate_matches: bool = ...,
        unicodeoffsets: bool = ...,
        stop_at_exact_match: bool = ...,
    ) -> None: ...
    def to_dict(self) -> Dict: ...

class VocabParams:
    text_column: int
    freq_column: Optional[int]
    index: int
    def __init__(
        self,
        *,
        text_column: int = ...,
        freq_column: Optional[int] = ...,
        index: int = ...,
        freqhandling: str = ...,
        vocabtype: str = ...,
    ) -> None: ...

class VariantModel:
    def __init__(
        self, alphabet_file: str, weights: Weights, debug: int = 0
    ) -> None: ...
    def build(self) -> None: ...
    def add_to_vocabulary(
        self, text: str, frequency: Optional[int], params: VocabParams
    ) -> None: ...
    def read_vocabulary(self, filename: str, params: VocabParams) -> None: ...
    def read_lexicon(self, filename: str) -> None: ...
    def read_lm(self, filename: str) -> None: ...
    def read_variants(self, filename: str, transparent: bool = False) -> None: ...
    def read_confusablelist(self, filename: str) -> None: ...
    def read_contextrules(self, filename: str) -> None: ...
    def add_contextrule(
        self,
        pattern: str,
        score: float,
        tag: Sequence[str],
        tagoffset: Sequence[str],
    ) -> None: ...
    def set_confusables_before_pruning(self) -> None: ...
    def __contains__(self, text: str) -> bool: ...
    def find_variants(self, input: str, params: SearchParameters) -> List[Dict]: ...
    def find_variants_par(
        self, input: Sequence[str], params: SearchParameters
    ) -> List[Dict]: ...
    def find_all_matches(
        self, text: str, params: SearchParameters
    ) -> List[Dict]: ...
