from uig.models.layers import InstanceNorm, PadConv, ResnetBlock
from uig.models.patch_disc import PatchDiscriminator
from uig.models.resnet_gen import ResNetGenerator
from uig.models.unit import UNITGenerator

__all__ = [
    "InstanceNorm",
    "PadConv",
    "ResnetBlock",
    "ResNetGenerator",
    "PatchDiscriminator",
    "UNITGenerator",
]
