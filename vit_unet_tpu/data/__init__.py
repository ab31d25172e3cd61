from vit_unet_tpu.data.datasets import (
    DenoisingDataset, DeblurringDataset, DerainingDataset,
    SegmentationDataset, PairedImageDataset, kfold_split,
)
from vit_unet_tpu.data.loader import (
    DataLoader, DeviceResidentData, TFRecordStream, device_normalize,
    prefetch_to_device, tfrecord_dataset,
)
from vit_unet_tpu.data import tfrecord
