"""Seeding — parity with reference diagan-pkg/diagan/utils/settings.py:8-18.

JAX is deterministic given explicit keys; this seeds the host-side numpy/
python RNGs used by dataset builders and samplers, and PYTHONHASHSEED for
reproducible dict ordering in any hash-dependent code path.
"""
from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed
