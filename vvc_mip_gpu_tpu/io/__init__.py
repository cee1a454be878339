"""Frame ingest and decisions-log export."""

from vvc_mip_gpu_tpu.io.frames import read_frames_csv, write_frames_csv
from vvc_mip_gpu_tpu.io.export import export_decisions_csv

__all__ = ["read_frames_csv", "write_frames_csv", "export_decisions_csv"]
