from adalog_tpu.models.layers import (
    LinearP, ConvP, LayerNormP,
    LinearSite, ConvSite, MatMulSite,
    qlinear, qconv2d, qmatmul, layer_norm,
)
from adalog_tpu.models.vit import ViTConfig, ViTParams, vit_forward, vit_init
from adalog_tpu.models.swin import SwinConfig, SwinParams, swin_forward, swin_init
from adalog_tpu.models.zoo import MODEL_ZOO, build_model, model_spec
