from finito_tpu.utils.logging import write_log, set_log_level, LogLevel, cur_time_micros
