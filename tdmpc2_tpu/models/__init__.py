from tdmpc2_tpu.models import layers, world_model  # noqa: F401
