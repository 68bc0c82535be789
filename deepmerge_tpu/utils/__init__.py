from deepmerge_tpu.utils.profiling import phase_timer, Timings  # noqa: F401
