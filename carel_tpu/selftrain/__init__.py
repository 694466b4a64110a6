from carel_tpu.selftrain.strategies import generate_self_train_pairs  # noqa: F401
from carel_tpu.selftrain.driver import self_train  # noqa: F401
