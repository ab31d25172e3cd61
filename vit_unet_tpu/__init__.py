"""vit_unet_tpu — a TPU-native JAX/Pallas framework with the capabilities of
benayas1/vit-unet (hierarchical ViT-UNet autoencoders for image restoration
and segmentation), rebuilt from scratch for XLA/TPU.
"""
__version__ = "0.1.0"

# convenience top-level API: the pieces a reference user reaches for first
from vit_unet_tpu.models.vit_unet import (            # noqa: E402
    ViTUNet, ViTUNetConfig, get_config, get_vit_unet,
)
from vit_unet_tpu.models.hvit_unet_tf import (        # noqa: E402
    HViTUNetTF, HViTUNetTFConfig, get_hvit_unet_tf,
)
from vit_unet_tpu.models.vit_classifier import (      # noqa: E402
    ViTClassifier, ViTClassifierConfig,
)
from vit_unet_tpu.train.fitter import Fitter          # noqa: E402
from vit_unet_tpu.parallel.mesh import (              # noqa: E402
    create_hybrid_mesh, create_mesh, initialize_distributed,
)

__all__ = [
    "ViTUNet", "ViTUNetConfig", "get_config", "get_vit_unet",
    "HViTUNetTF", "HViTUNetTFConfig", "get_hvit_unet_tf",
    "ViTClassifier", "ViTClassifierConfig",
    "Fitter", "create_mesh", "create_hybrid_mesh", "initialize_distributed",
    "__version__",
]
