from uig.eval.fid import (FIDStats, collect_features, compute_fid,
                          compute_kid, frechet_distance, kid_from_features,
                          stream_stats)
from uig.eval.is_score import (compute_inception_score,
                               inception_score_from_probs)
from uig.eval.prdc import compute_prdc, prdc_from_features

__all__ = ["FIDStats", "collect_features", "compute_fid",
           "compute_inception_score", "compute_kid", "compute_prdc",
           "frechet_distance", "inception_score_from_probs",
           "kid_from_features", "prdc_from_features", "stream_stats"]
