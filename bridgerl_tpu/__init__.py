"""bridgerl_tpu — TPU-native human-to-robot motion retargeting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
repo `Bridging-the-gap-of-Robot-Learning-via-Distribution-Reinforcement-
Learning-vq-vae` (a PyTorch dual-encoder VQ-VAE motion retargeting stack):

- dual-encoder VQ-VAE model zoo (4 architectures x 7 quantizers)
- two-stage teacher->student training with multi-seed ablations
- evaluation/reporting (curves, radar, t-SNE, LaTeX)
- long-sequence motion export via overlap-add reconstruction
- a batched, jittable Unitree G1 kinematic scene (URDF -> vmapped FK)
  replacing the Isaac-Lab replay layer

Everything on the compute path is functional JAX designed for jit/pjit over
a `jax.sharding.Mesh`; quantizer state (EMA codebooks) is explicit pytree
state threaded through the train step with cross-replica-correct statistics.
"""

__version__ = "0.1.0"
