"""MetricLogger / SmoothedValue (reference: utils.py:224-400,
dinov2/logging/helpers.py:53-194).

Same API surface: windowed median/avg/global_avg meters, `log_every(iterable,
freq, header)` with iter/data timing and ETA, cross-process synchronization of
(count, total) — here a psum over hosts via jax.experimental.multihost_utils when
running multi-host, or a no-op single-host.
"""

from __future__ import annotations

import datetime
import json
import time
from collections import defaultdict, deque
from typing import Iterable, Optional

import jax
import numpy as np


class SmoothedValue:
    """Track a series with a smoothing window (utils.py:224-283)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self) -> None:
        """all_reduce of [count, total] (utils.py:242-253)."""
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        arr = multihost_utils.process_allgather(np.asarray([self.count, self.total], np.float64))
        self.count = int(arr[:, 0].sum())
        self.total = float(arr[:, 1].sum())

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return float(np.max(self.deque)) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    """Meter dict + timed logging loop (utils.py:313-400)."""

    def __init__(self, delimiter: str = "  ", output_file: Optional[str] = None):
        self.meters: defaultdict = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.output_file = output_file

    def update(self, n: int = 1, **kwargs) -> None:
        """`n` weights this update in each meter's global average (the reference
        passes the true batch size for ragged final batches, utils.py:331)."""
        for k, v in kwargs.items():
            self.meters[k].update(float(v), n=n)

    def add_meter(self, name: str, meter: SmoothedValue) -> None:
        self.meters[name] = meter

    def synchronize_between_processes(self) -> None:
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self) -> str:
        return self.delimiter.join(f"{name}: {meter}" for name, meter in self.meters.items())

    @staticmethod
    def device_memory_mb() -> float:
        """Peak device memory in MB — the TPU analogue of the reference's
        torch.cuda.max_memory_allocated() logging (dinov2/logging/helpers.py:110).
        jax memory_stats is per-device; returns 0.0 on backends without stats."""
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            return float(stats.get("peak_bytes_in_use",
                                   stats.get("bytes_in_use", 0))) / 2**20
        except Exception:
            return 0.0

    def dump_in_output_file(self, iteration: int, iter_time: float, data_time: float) -> None:
        if self.output_file is None or jax.process_index() != 0:
            return
        entry = dict(iteration=iteration, iter_time=iter_time, data_time=data_time,
                     memory_mb=self.device_memory_mb())
        entry.update({k: v.median for k, v in self.meters.items()})
        with open(self.output_file, "a") as f:
            f.write(json.dumps(entry) + "\n")

    def log_every(self, iterable: Iterable, print_freq: int, header: str = "",
                  n_iterations: Optional[int] = None):
        start = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.6f}")
        data_time = SmoothedValue(fmt="{avg:.6f}")
        if n_iterations is None:
            try:
                n_iterations = len(iterable)  # type: ignore[arg-type]
            except TypeError:
                n_iterations = -1
        space = len(str(n_iterations))
        for i, obj in enumerate(iterable):
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or i == n_iterations - 1:
                self.dump_in_output_file(i, iter_time.avg, data_time.avg)
                eta = iter_time.global_avg * (n_iterations - i) if n_iterations > 0 else 0
                print(
                    self.delimiter.join(
                        [
                            header,
                            f"[{i:{space}d}/{n_iterations}]",
                            f"eta: {datetime.timedelta(seconds=int(eta))}",
                            str(self),
                            f"time: {iter_time}",
                            f"data: {data_time}",
                            f"max mem: {self.device_memory_mb():.0f}MB",
                        ]
                    )
                )
            end = time.time()
        total = time.time() - start
        print(f"{header} Total time: {datetime.timedelta(seconds=int(total))} "
              f"({total / max(n_iterations, 1):.6f} s / it)")


class profile_trace:
    """jax.profiler trace hook (SURVEY §5): wrap any training region to write a
    TensorBoard-loadable device trace.

        with profile_trace("/tmp/trace", enabled=args.profile):
            ... train steps ...

    No-op when disabled or when the backend can't trace (e.g. this image's
    tunneled TPU) — failures degrade to a warning, never abort training.
    """

    def __init__(self, logdir: str, enabled: bool = True):
        self.logdir = logdir
        self.enabled = enabled
        self._active = False

    def __enter__(self):
        if self.enabled:
            try:
                jax.profiler.start_trace(self.logdir)
                self._active = True
            except Exception as e:  # pragma: no cover - backend dependent
                print(f"profiler trace unavailable: {e}")
        return self

    def __exit__(self, *exc):
        if self._active:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover
                print(f"profiler stop failed: {e}")
        return False
