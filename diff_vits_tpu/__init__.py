"""diff_vits_tpu — a TPU-native (JAX/XLA/Pallas/pjit) zero-shot TTS framework.

Re-implements the capabilities of the diff-vits reference (VITS-style prior +
conditional 1-D diffusion decoder, zero-shot speaker prompting) as a brand-new
TPU-first stack:

* channel-last ``[B, T, C]`` tensor layout everywhere (lane dim = channels),
* pure-functional flax.linen modules compiled under ``jax.jit`` / ``pjit``,
* on-device monotonic alignment search (``lax.scan`` wavefront + Pallas),
* diffusion samplers (DDPM/DDIM/DPM-Solver++/UniPC) compiled as single XLA
  programs with static step counts,
* SPMD data/model parallelism over a ``jax.sharding.Mesh``.

Reference layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
