from uig.eval.fid import (FIDStats, compute_fid, compute_kid,
                          frechet_distance, kid_from_features)

__all__ = ["FIDStats", "compute_fid", "compute_kid",
           "frechet_distance", "kid_from_features"]
