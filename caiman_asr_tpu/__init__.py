"""caiman_asr_tpu: a TPU-native (JAX/XLA/Pallas) streaming RNN-T ASR framework.

A ground-up rebuild of the capabilities of MyrtleSoftware/caiman-asr for TPU:

- functional RNN-T model (encoder / prediction / joint) built on ``lax.scan``
  LSTMs with fp32 cell-state accumulation and bf16 MXU matmuls,
- a forward-backward transducer loss whose lattice runs as a row-wise
  log-space linear recurrence (``lax.associative_scan`` over the label axis)
  with a closed-form fused-softmax backward via ``jax.custom_vjp``,
- a JAX log-mel front-end replacing the reference's NVIDIA-DALI GPU pipeline,
- jit-compiled batched greedy / beam decoding with static shapes,
- data-parallel training over a ``jax.sharding.Mesh`` (collectives over ICI).
"""

__version__ = "0.1.0"
