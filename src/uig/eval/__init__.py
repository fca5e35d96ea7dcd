from uig.eval.fid import (FIDStats, collect_features, compute_fid,
                          compute_kid, frechet_distance, kid_from_features)
from uig.eval.prdc import compute_prdc, prdc_from_features

__all__ = ["FIDStats", "collect_features", "compute_fid", "compute_kid",
           "compute_prdc", "frechet_distance", "kid_from_features",
           "prdc_from_features"]
