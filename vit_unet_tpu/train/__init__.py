from vit_unet_tpu.train.losses import (
    get_loss, mse, mae, charbonnier, soft_dice_loss, bce_with_logits,
    categorical_crossentropy,
)
from vit_unet_tpu.train.metrics import (
    get_metric, psnr, ssim, dice_score, precision_recall_f1, accuracy, f1,
)
from vit_unet_tpu.train.fitter import Fitter
from vit_unet_tpu.train.bn_refold import bn_refold, estimate_bn_moments
from vit_unet_tpu.train.schedules import LearningRateScheduler, rampup_exp_decay
from vit_unet_tpu.train import callbacks
