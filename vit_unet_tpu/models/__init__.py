from vit_unet_tpu.models.vit_unet import (
    ViTUNet, ViTUNetConfig, get_vit_unet, get_config, PRESETS,
)
