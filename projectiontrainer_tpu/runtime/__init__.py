from projectiontrainer_tpu.runtime.native import (
    native_available,
    fused_preprocess,
    fused_preprocess_batch,
)
