from carel_tpu.utils.text import getmask, softmax_by_length, load_w2v  # noqa: F401
from carel_tpu.utils.profiling import StepTimer, trace  # noqa: F401
