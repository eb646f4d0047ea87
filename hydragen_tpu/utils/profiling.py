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


def while_summary(
    log_dir: str = "/tmp/hydragen_trace",
    top: int = 25,
    device_substr: str = "TPU",
) -> tuple[float, List[OpStat]]:
    """Decompose the LARGEST while loop (the decode scan) into leaf ops.

    ``op_summary`` double counts loop bodies: the xplane's "XLA Ops" line
    records the while as one covering event plus every leaf op inside it,
    so the while dominates and the interesting per-step breakdown hides
    beneath. This finds the longest while event, sums leaf ops within its
    time window, and collapses layer-numbered variants (``%fusion.91`` ->
    ``%fusion``). Returns (while_total_ms, leaf OpStats where fraction is
    of the while's duration)."""
    import re

    space = _load_xspace(log_dir)
    for plane in space.planes:
        if device_substr not in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = [
                (meta[e.metadata_id].name, e.offset_ps, e.duration_ps)
                for e in line.events
            ]
            whiles = [e for e in evs if e[0].startswith("%while")]
            if not whiles:
                return 0.0, []
            big = max(whiles, key=lambda e: e[2])
            w0, w1 = big[1], big[1] + big[2]
            tot: Dict[str, int] = collections.Counter()
            cnt: Dict[str, int] = collections.Counter()
            for name, off, dur in evs:
                if name.startswith("%while") or not (w0 <= off < w1):
                    continue
                base = re.sub(r"\.\d+$", "", name.split(" = ")[0])
                tot[base] += dur
                cnt[base] += 1
            return big[2] / 1e9, [
                OpStat(name=n, total_ms=t / 1e9, count=cnt[n],
                       fraction=t / big[2])
                for n, t in collections.Counter(tot).most_common(top)
            ]
    raise ValueError(f"no plane matching {device_substr!r} in trace")


def print_while_summary(
    log_dir: str = "/tmp/hydragen_trace", top: int = 25,
    steps: int | None = None,
) -> None:
    total_ms, stats = while_summary(log_dir, top=top)
    per = f" ({total_ms/steps:.2f} ms/step)" if steps else ""
    print(f"decode while: {total_ms:.1f} ms{per}; leaf ops inside:")
    for st in stats:
        per_step = f"  {st.total_ms/steps:6.2f} ms/step" if steps else ""
        print(f"{st.fraction*100:5.1f}%  {st.total_ms:9.2f} ms{per_step}"
              f"  n={st.count:<6d} {st.name[:60]}")
