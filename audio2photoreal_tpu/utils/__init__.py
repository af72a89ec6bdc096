from audio2photoreal_tpu.utils.profiling import Timer, aot_compile, profile_trace

__all__ = ["Timer", "aot_compile", "profile_trace"]
