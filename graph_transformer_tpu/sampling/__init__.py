from graph_transformer_tpu.sampling.neighbors import DeviceCSR, sample_neighborhoods
from graph_transformer_tpu.sampling.log_uniform import (
    LogUniformSpec,
    log_uniform_probs,
    sample_log_uniform_unique,
    expected_num_tries,
    expected_count,
)

__all__ = [
    "DeviceCSR",
    "sample_neighborhoods",
    "LogUniformSpec",
    "log_uniform_probs",
    "sample_log_uniform_unique",
    "expected_num_tries",
    "expected_count",
]
