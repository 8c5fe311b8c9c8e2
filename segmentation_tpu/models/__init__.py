from segmentation_tpu.models.autoencoder import Autoencoder, AutoencoderTrainer
from segmentation_tpu.models.base import (
    SegmentationTrainer,
    Trainer,
    TrainState,
)
from segmentation_tpu.models.deconvolution import DeconvModel
from segmentation_tpu.models.fcn import FCN
from segmentation_tpu.models.gan import (
    GANDiscriminator,
    GANGenerator,
    GANTrainer,
)
from segmentation_tpu.models.infogan import (
    InfoGANDiscriminator,
    InfoGANGenerator,
    InfoGANTrainer,
)
from segmentation_tpu.models.template import Template
from segmentation_tpu.models.unet import UNet
from segmentation_tpu.models.unet_fast import UNetS2D, UNetS2DInference

__all__ = [
    "Autoencoder",
    "AutoencoderTrainer",
    "SegmentationTrainer",
    "Trainer",
    "TrainState",
    "DeconvModel",
    "FCN",
    "GANDiscriminator",
    "GANGenerator",
    "GANTrainer",
    "InfoGANDiscriminator",
    "InfoGANGenerator",
    "InfoGANTrainer",
    "Template",
    "UNet",
    "UNetS2D",
    "UNetS2DInference",
]
