from htd_tpu.utils.profiling import profile_time, trace_to
