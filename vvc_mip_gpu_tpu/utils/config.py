"""Runtime configuration.

Collapses the reference's two config tiers — boost::program_options runtime
flags (reference: main.cpp:50-83) and compile-time behavior macros
(main.cpp:3-12, main_aux_functions.h:1-7) — into one dataclass.  Mapping:

| reference                       | here                                |
|---------------------------------|-------------------------------------|
| -f / FramesToBeEncoded          | n_frames                            |
| -s / Resolution ("1920x1080")   | width, height                       |
| -o / OriginalFrames             | input_path                          |
| -l / OutputPreffix              | output_prefix                       |
| --FilterType / --KernelIdx      | filter_type, kernel_idx             |
| --DeviceIndex                   | (device selection is JAX's; the     |
|                                 |  mesh shape replaces it)            |
| USE_ALTERNATIVE_SAMPLES macro   | filter_type is not None             |
| ONLY_FILTER_AND_EXIT macro      | only_filter                         |
| MAX_PERFORMANCE_DIST macro      | max_performance (export minSadHad   |
|                                 |  only; SAD/SATD columns zeroed)     |
| TRACE_POWER macro               | trace_power (stage stdout markers)  |
| BUFFER_SLOTS prefetch           | batch_frames (device batching)      |
| USE_ARM macro                   | n/a (no per-vendor kernel variants) |
"""

from __future__ import annotations

import dataclasses

from vvc_mip_gpu_tpu.constants import AVAILABLE_FILTERS, AVAILABLE_RES


@dataclasses.dataclass
class EngineConfig:
    width: int = 1920
    height: int = 1080
    n_frames: int = 1
    input_path: str | None = None
    output_prefix: str = ""
    filter_type: str | None = None
    kernel_idx: int = 0
    only_filter: bool = False
    max_performance: bool = True
    trace_power: bool = False
    batch_frames: int = 8  # pipelining window; 8 measured optimal on v5e
    mesh_data: int = 1
    mesh_space: int = 1
    # Latency mode: each frame class-sharded over all local devices
    # (parallel/latency_engine.py) — minimizes time-to-first-frame
    # instead of throughput.
    latency_mode: bool = False
    # Multi-host (jax.distributed): one process per host.
    coordinator: str | None = None
    num_processes: int = 1
    process_id: int = 0

    @classmethod
    def parse_resolution(cls, text: str) -> tuple[int, int]:
        try:
            w, h = text.lower().split("x")
            return int(w), int(h)
        except Exception as e:
            raise ValueError(f"bad resolution {text!r}; expected WxH") from e

    def validate(self) -> None:
        if self.filter_type is not None:
            if self.filter_type not in AVAILABLE_FILTERS:
                raise ValueError(
                    f"filter type {self.filter_type!r} not supported; "
                    f"available: {list(AVAILABLE_FILTERS)}")
            n_kernels = 3 if "5x5" in self.filter_type else 5
            if not 0 <= self.kernel_idx < n_kernels:
                raise ValueError(f"KernelIdx {self.kernel_idx} out of range")
        if (self.width, self.height) not in AVAILABLE_RES:
            # Unlike the reference we accept any multiple-of-4 size; warn on
            # non-standard ones only.
            if self.width % 4 or self.height % 4:
                raise ValueError("frame dimensions must be multiples of 4")
        if self.n_frames < 1:
            raise ValueError("n_frames must be >= 1")
        if self.latency_mode and (self.mesh_data * self.mesh_space > 1
                                  or self.num_processes > 1):
            raise ValueError(
                "--LatencyMode uses all local devices by itself; it "
                "cannot combine with --MeshData/--MeshSpace or multi-host")
