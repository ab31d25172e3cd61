from vit_unet_tpu.nn.feedforward import FeedForward
from vit_unet_tpu.nn.reattention import ReAttention, SkipConnection
from vit_unet_tpu.nn.blocks import (
    FourierEncoderBlock, ReAttentionEncoderBlock, TFTransformerEncoder,
)
from vit_unet_tpu.nn.mha import KerasMHA
from vit_unet_tpu.nn.patch_encoder import PatchEncoder, PatchEncoderCL
from vit_unet_tpu.nn.resampling import Resampling
