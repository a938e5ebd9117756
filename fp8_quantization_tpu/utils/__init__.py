from fp8_quantization_tpu.utils.checkpoint import (  # noqa: F401
    latest_step, restore_checkpoint, save_checkpoint)
from fp8_quantization_tpu.utils.timing import (  # noqa: F401
    Stopwatch, time_jitted, trace)
