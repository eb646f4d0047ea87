"""On-device op-level profiling.

The reference has no tracer (SURVEY.md §5 — CUDA-event timing only); the TPU
build gets real per-op accounting from XLA's profiler: capture a trace with
``trace()``, then ``op_summary()`` parses the xplane protobuf directly and
returns per-op device time totals.

Direct xplane parsing is used because the tensorboard-plugin converter is
incompatible with the installed TF/protobuf; set
``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python`` if the C++ descriptor pool
rejects the generated protos (handled automatically below).
"""

from __future__ import annotations

import collections
import contextlib
import glob
import os
from typing import Dict, List, NamedTuple

import jax


class OpStat(NamedTuple):
    name: str
    total_ms: float
    count: int
    fraction: float


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/hydragen_trace"):
    """Capture a jax.profiler trace around a block of device work."""
    with jax.profiler.trace(log_dir):
        yield log_dir


def _load_xspace(log_dir: str):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    files = sorted(glob.glob(os.path.join(log_dir, "**/*.xplane.pb"), recursive=True))
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {log_dir}")
    space = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space


def op_summary(
    log_dir: str = "/tmp/hydragen_trace",
    top: int = 25,
    device_substr: str = "TPU",
) -> List[OpStat]:
    """Per-op device-time totals from the latest trace under ``log_dir``."""
    space = _load_xspace(log_dir)
    for plane in space.planes:
        if device_substr not in plane.name:
            continue
        meta = plane.event_metadata
        totals: Dict[str, int] = collections.Counter()
        counts: Dict[str, int] = collections.Counter()
        for line in plane.lines:
            if "Ops" not in line.name:
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                totals[name] += ev.duration_ps
                counts[name] += 1
        grand = sum(totals.values()) or 1
        return [
            OpStat(name=n, total_ms=t / 1e9, count=counts[n], fraction=t / grand)
            for n, t in collections.Counter(totals).most_common(top)
        ]
    raise ValueError(f"no plane matching {device_substr!r} in trace")


def print_op_summary(log_dir: str = "/tmp/hydragen_trace", top: int = 25) -> None:
    for st in op_summary(log_dir, top=top):
        print(f"{st.fraction*100:5.1f}%  {st.total_ms:9.2f} ms  n={st.count:<6d} {st.name[:80]}")
