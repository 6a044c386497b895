"""Drop-in shim: ``import analiticcl`` resolves to the TPU-native engine.

Place this repository on PYTHONPATH and existing analiticcl code runs
unchanged (same classes, kwargs, and dict result schemas — see
analiticcl_tpu/api.py for the surface definition).
"""

from analiticcl_tpu.api import (  # noqa: F401
    SearchParameters,
    VariantModel,
    VocabParams,
    Weights,
)

__all__ = ["VariantModel", "Weights", "SearchParameters", "VocabParams"]
