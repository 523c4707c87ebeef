from projectiontrainer_tpu.utils.logging import MetricLogger
from projectiontrainer_tpu.utils.timing import StepProfiler, StepTimer
