"""projectiontrainer_tpu — TPU-native (JAX/XLA/Pallas/pjit) CXR vision-language framework.

A ground-up rebuild of the capabilities of SabaPivot/ProjectionTrainer (see SURVEY.md):

- Stage 0: SigLIP sigmoid-loss contrastive fine-tuning of the vision encoder.
- Stage 1: frozen-backbone MLP-projector alignment (vision patches -> LLM embedding space),
  causal-LM loss on caption tokens.
- Stage 2: answer-masked VQA instruction fine-tuning (full / LoRA), bucketed static shapes.
- Inference: jitted autoregressive generation with embedding prefixes (greedy/sampling/beam).
- cls_evaluate: attention-pooling linear probe, two-way multi-label loss, zero-shot eval.

Everything is functional JAX: models are (config, params-pytree, pure apply fns); freezing
policies are trainable-mask pytrees; parallelism is a `jax.sharding.Mesh` with GSPMD
shardings; the flash-attention hot path is a Pallas TPU kernel.
"""

__version__ = "0.1.0"
