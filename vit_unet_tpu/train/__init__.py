from vit_unet_tpu.train.losses import get_loss, mse, mae, charbonnier, soft_dice_loss
from vit_unet_tpu.train.metrics import get_metric, psnr, ssim, dice_score, precision_recall_f1
from vit_unet_tpu.train.fitter import Fitter
from vit_unet_tpu.train import callbacks
