from vit_unet_tpu.ops.patches import (
    patchify, unpatchify, flatten_patches, unflatten,
    split_patches, merge_patches, change_patch_size,
    patchify_cl, unpatchify_cl, unflatten_cl, change_patch_size_cl,
)
from vit_unet_tpu.ops.sparse import softmax_top
