from vit_unet_tpu.kernels.flash_reattention import (
    expand_reattention_affine, flash_reattention, fold_reattention_affine,
    fold_reattention_compact, pick_flash_block,
)
from vit_unet_tpu.kernels.flash_reattention_train import (
    flash_reattention_train, flash_reattention_train_bn,
)
