from projectiontrainer_tpu.generate.decode import GenerationConfig, generate
