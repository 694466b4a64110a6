from carel_tpu.train.state import TrainState, create_train_state  # noqa: F401
from carel_tpu.train.steps import make_train_step, make_eval_step  # noqa: F401
from carel_tpu.train.metrics import binary_prf, prf_with_forced_misses  # noqa: F401
