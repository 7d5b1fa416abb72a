from .logging import MetricLogger, SmoothedValue, profile_trace
