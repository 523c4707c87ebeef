from projectiontrainer_tpu.models import decoder, projector, siglip, classifier, vlm
