from gamd_tpu.utils.profiling import profile_trace, Timer

__all__ = ["profile_trace", "Timer"]
