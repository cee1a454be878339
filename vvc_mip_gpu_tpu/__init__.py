"""TPU-native VVC Matrix-based Intra Prediction (MIP) cost engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
iagostorch/VVC-MIP-GPU OpenCL engine: exhaustive MIP mode search over every
candidate CU size/position of every CTU of a frame, producing per-(CU, mode)
SAD / SATD / minSadHad cost tensors and the "decisions log" CSV.
"""

from vvc_mip_gpu_tpu import constants

__version__ = "0.1.0"

__all__ = ["constants", "__version__"]
