from carel_tpu.ops.entmax import sparsemax, entmax15  # noqa: F401
from carel_tpu.ops.pairwise import mmd_statistic, hsic, pdist  # noqa: F401
from carel_tpu.ops.bow_recon import bow_reconstruction_loss, densify_bow  # noqa: F401
