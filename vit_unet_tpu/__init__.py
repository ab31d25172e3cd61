"""vit_unet_tpu — a TPU-native JAX/Pallas framework with the capabilities of
benayas1/vit-unet (hierarchical ViT-UNet autoencoders for image restoration
and segmentation), rebuilt from scratch for XLA/TPU.
"""
__version__ = "0.1.0"
