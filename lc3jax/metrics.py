"""Lightweight observability for serving loops.

The reference logs nothing in-library (log facade only, SURVEY.md
section 5); a production TPU deployment needs throughput and
loss-concealment visibility. This module keeps cheap host-side counters fed
from values the pipeline already has (no extra device work).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field


@dataclass
class CodecMetrics:
    frames_decoded: int = 0
    frames_encoded: int = 0
    plc_frames: int = 0
    audio_seconds: float = 0.0
    _start: float = field(default_factory=time.perf_counter)

    def record_decode(self, n_frames: int, frame_seconds: float, n_bad: int = 0):
        self.frames_decoded += n_frames
        self.plc_frames += n_bad
        self.audio_seconds += n_frames * frame_seconds

    def record_encode(self, n_frames: int, frame_seconds: float):
        self.frames_encoded += n_frames
        self.audio_seconds += n_frames * frame_seconds

    @property
    def wall_seconds(self) -> float:
        return time.perf_counter() - self._start

    @property
    def realtime_factor(self) -> float:
        """Host wall-clock throughput of the serving loop.

        Valid on production hosts where dispatch latency reflects work.
        NOT a device-time measurement: on hosts with fully asynchronous
        dispatch and unfenced block_until_ready (the axon tunnel used for
        development), wall-clock under-reports device work — use
        lc3jax.profiling.device_step_ms / tools/tpu_profile.py for
        device-clock ground truth (see CLAUDE.md)."""
        w = self.wall_seconds
        return self.audio_seconds / w if w > 0 else 0.0

    @property
    def plc_rate(self) -> float:
        return self.plc_frames / self.frames_decoded if self.frames_decoded else 0.0

    def snapshot(self) -> dict:
        return {
            "frames_decoded": self.frames_decoded,
            "frames_encoded": self.frames_encoded,
            "plc_frames": self.plc_frames,
            "plc_rate": round(self.plc_rate, 6),
            "audio_seconds": round(self.audio_seconds, 3),
            "wall_seconds": round(self.wall_seconds, 3),
            "realtime_factor": round(self.realtime_factor, 1),
        }

    def dumps(self) -> str:
        return json.dumps(self.snapshot())
