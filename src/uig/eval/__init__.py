from uig.eval.fid import FIDStats, compute_fid, frechet_distance

__all__ = ["FIDStats", "compute_fid", "frechet_distance"]
