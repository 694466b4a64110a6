from carel_tpu.infer.pair_inference import InferenceResult, run_pair_inference, score_pairs  # noqa: F401
from carel_tpu.infer.scorer import PairScorer  # noqa: F401
