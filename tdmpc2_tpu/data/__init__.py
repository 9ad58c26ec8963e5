from tdmpc2_tpu.data.buffer import Buffer  # noqa: F401
