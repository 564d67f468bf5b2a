"""exllamav3_tpu — TPU-native EXL3 quantized-inference framework.

A from-scratch JAX/XLA/Pallas implementation of the EXL3 format and serving
stack (feature reference: turboderp-org/exllamav3), designed TPU-first:
jit-compiled step functions instead of CUDA graphs, GSPMD sharding over device
meshes instead of multiprocess tensor parallelism, Pallas kernels for the
fused trellis-decode matmuls and paged attention.
"""

__version__ = "0.1.0"

from .constants import PAGE_SIZE

__all__ = ["PAGE_SIZE"]
