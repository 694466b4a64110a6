from carel_tpu.stage1.data import DocArrays, build_doc_arrays  # noqa: F401
from carel_tpu.stage1.trainer import Stage1Config, train_stage1  # noqa: F401
from carel_tpu.stage1.pair_writer import write_pair_data  # noqa: F401
