from .logging import MetricLogger, SmoothedValue
