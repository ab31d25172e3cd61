#!/usr/bin/env python3
"""Top-level training entry point (mirrors the reference CLI:
`python3 run_denoising.py --model_string lite --im_size 224`, README.md:104-107;
extended with `--task denoise|deblur|derain|segment` for every README task)."""
from vit_unet_tpu.cli.run_denoising import main

if __name__ == "__main__":
    main()
