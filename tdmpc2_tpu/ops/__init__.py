from tdmpc2_tpu.ops import math  # noqa: F401
