from vit_unet_tpu.models.vit_unet import (
    ViTUNet, ViTUNetConfig, get_vit_unet, get_config, PRESETS,
)
from vit_unet_tpu.models.hvit_unet_tf import (
    HViTUNetTF, HViTUNetTFConfig, get_hvit_unet_tf,
)
from vit_unet_tpu.models.vit_classifier import ViTClassifier, ViTClassifierConfig
