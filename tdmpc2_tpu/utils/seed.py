"""Seeding (reference: tdmpc2/common/seed.py). JAX randomness is explicit
(PRNG keys derived from cfg.seed); this seeds the host-side generators used
by env backends and numpy."""

import random

import numpy as np


def set_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
