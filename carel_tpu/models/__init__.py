from carel_tpu.models.encoder import TransformerEncoder  # noqa: F401
from carel_tpu.models.heads import VaeHeads, AttentionAdapter  # noqa: F401
from carel_tpu.models.drl import DrlModel  # noqa: F401
from carel_tpu.models.pair_classifier import PairClassifierModel  # noqa: F401
from carel_tpu.models.discriminators import LinearDiscriminator, ClubNet, grad_reverse, DomainDiscriminator  # noqa: F401
from carel_tpu.models.stage1 import DocEmotionModel  # noqa: F401
