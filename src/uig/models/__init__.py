from uig.models.layers import InstanceNorm, PadConv, ResnetBlock
from uig.models.munit import MUNITGenerator
from uig.models.patch_disc import MultiScaleDiscriminator, PatchDiscriminator
from uig.models.resnet_gen import ResNetGenerator
from uig.models.stargan import StarGANDiscriminator, StarGANGenerator
from uig.models.ugatit import UGATITDiscriminator, UGATITGenerator
from uig.models.unit import UNITGenerator

__all__ = [
    "InstanceNorm",
    "PadConv",
    "ResnetBlock",
    "ResNetGenerator",
    "PatchDiscriminator",
    "MultiScaleDiscriminator",
    "UNITGenerator",
    "MUNITGenerator",
    "StarGANGenerator",
    "StarGANDiscriminator",
    "UGATITGenerator",
    "UGATITDiscriminator",
]
