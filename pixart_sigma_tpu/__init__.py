"""PixArt-Sigma-TPU: a TPU-native JAX/Pallas text-to-image diffusion framework.

Re-implements the full capability surface of PixArt-alpha/PixArt-sigma
(reference mounted at /root/reference) with a TPU-first design:

- flax.linen DiT models (PixArt / PixArtMS) with adaLN-single conditioning,
  T5 cross-attention and Sigma KV-token-compression self-attention
- Pallas flash-attention kernels for the hot attention paths
- scan-compiled on-device samplers (iDDPM, DPM-Solver++, SA-Solver, LCM, DMD)
- pjit/GSPMD data/FSDP-parallel training over a jax.sharding.Mesh
- orbax + .pth/diffusers checkpoint interop

Nothing in this package is a translation of the reference's torch code; the
reference is cited (file:line) in docstrings only as the behavioural spec.
"""

__version__ = "0.1.0"
