from fp8_quantization_tpu.data.imagenet import (  # noqa: F401
    ImageFolderDataset, SyntheticImageNet, make_dataloaders)
