from uig.train.ema import ema_update
from uig.train.losses import (
    cycle_loss,
    gan_loss_d,
    gan_loss_g,
    identity_loss,
)
from uig.train.pool import ImagePool

__all__ = [
    "gan_loss_g",
    "gan_loss_d",
    "cycle_loss",
    "identity_loss",
    "ImagePool",
    "ema_update",
]
