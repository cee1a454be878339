"""Golden (oracle) implementations of the MIP pipeline for testing."""

from vvc_mip_gpu_tpu.golden import reference_model, scalar_oracle

__all__ = ["reference_model", "scalar_oracle"]
