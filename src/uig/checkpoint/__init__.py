from uig.checkpoint.ckpt import CheckpointManager

__all__ = ["CheckpointManager"]
