from carel_tpu.pretrain.mlm import MlmConfig, pretrain_mlm, save_encoder, load_encoder  # noqa: F401
