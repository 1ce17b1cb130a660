"""Compatibility shim: the reference imports metrics as
``from emage_evaltools.mertic import FGD, BC, L1div, LVDFace, MSEFace``
(train_emage_audio.py:24 — module name typo included). Users porting scripts can
``from pantomatrix_tpu.eval.mertic import ...`` unchanged.
"""
from .metrics import BC, FGD, L1div, LVDFace, MSEFace  # noqa: F401

__all__ = ["BC", "FGD", "L1div", "LVDFace", "MSEFace"]
