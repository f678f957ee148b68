"""dav1d_tpu — a TPU-native AV1 decoder (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of dav1d
(reference: /root/reference, v1.5.4), architected for TPU:

- Stage A (host): OBU parsing + msac entropy decode emitting dense
  per-frame tensors (modes / MVs / coefficients).
- Stage B (device): fully vectorized reconstruction — intra pred,
  inverse transforms, motion compensation, deblock, CDEF, loop
  restoration, super-res, film grain — as JAX/Pallas integer kernels.
- Stage C: orchestration — ref-slot state machine, GOP pipelining,
  multi-chip sharding over a jax Mesh.

Public API mirrors dav1d's push/pull contract
(reference include/dav1d/dav1d.h): see `dav1d_tpu.api.Decoder`.
"""

__version__ = "0.1.0"

from .api import Decoder, Settings  # noqa: F401
