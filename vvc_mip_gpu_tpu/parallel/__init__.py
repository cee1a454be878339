"""Multi-chip parallelism: device meshes, sharded engines, halo exchange."""

from vvc_mip_gpu_tpu.parallel.mesh import make_mesh
from vvc_mip_gpu_tpu.parallel.sharded_engine import ShardedMipCostEngine

__all__ = ["make_mesh", "ShardedMipCostEngine"]
