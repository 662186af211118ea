"""hdenseformer_tpu: a TPU-native segmentation framework.

A from-scratch JAX/XLA/Pallas/pjit re-design with the capabilities of the
reference PyTorch repo shijun18/H-DenseFormer (multimodal 3D/2D medical
tumor segmentation): the H-DenseFormer model family plus DAUNet, UNETR,
TransBTS, Hecktor20Top1 and 2D encoder-decoder baselines, HDF5 data
pipeline with deterministic PRNG-keyed augmentation, deep-supervision
combine losses, k-fold training with early stopping and best-k
checkpointing, batched sliding-window whole-volume inference, and
Dice/HD95/Jaccard/ASD evaluation.

Design principles (TPU-first, not a port):
- channels-last (N, *spatial, C) layouts everywhere so XLA tiles convs
  onto the MXU;
- pure functional train/eval steps compiled once under ``jax.jit`` with
  ``jax.sharding`` data-parallel meshes (ICI collectives, no host loops);
- bf16 compute / fp32 parameters + fp32 loss math;
- Pallas kernels for the bandwidth-bound hot ops (dense attention with
  head_dim=4, fused instance-norm);
- host-side HDF5/NIfTI IO with double-buffered device prefetch.
"""

__version__ = "0.1.0"
