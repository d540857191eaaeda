"""audio_key_estimation_tpu — a TPU-native musical key estimation framework.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of the
reference PyTorch implementation (flo-stilz/Audio-Key-Estimation):
transposition-equivariant PitchClassNet for global/local key-signature,
tonic and genre prediction from a constant-Q transform front-end.

Layering (bottom → top):
  utils/      music-theory constants, label builders, logging, profiling
  ops/        pure-function compute ops: equivariant convs, octave pooling,
              CQT front-end (JAX + fused Pallas kernel), masked pooling
  models/     flax modules: PitchClassNet, multi-scale ensemble, torch porter
  data/       dataset loaders (14 corpora), feature cache, input pipeline
  parallel/   device mesh + sharded (pjit) train/eval steps
  train/      loss, metrics (MIREX), optimizer, trainer/evaluator harness
  cli/        train / eval / equivariance-test / scrape entry points
  native/     C++ audio decode + prefetch runtime (ctypes bindings)
"""

__version__ = "0.1.0"
