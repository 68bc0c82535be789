from deepmerge_tpu.ops.pallas.window_gather import gather_windows  # noqa: F401
