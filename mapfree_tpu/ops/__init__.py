from mapfree_tpu.ops.correlation import fused_correlation_warp, fused_path_available
from mapfree_tpu.ops.essential import (
    cheirality_pose,
    decompose_E,
    essential_pose,
    essential_pose_adaptive,
    essential_pose_adaptive_async,
    essential_pose_metric,
    estimate_essential,
    metric_scale_from_depth,
    metric_scale_from_point_depths,
    normalize_keypoints,
    sampson_sq,
)
from mapfree_tpu.ops.matching import mutual_2nn_ratio_match
from mapfree_tpu.ops.pnp import pnp_pose
from mapfree_tpu.ops.procrustes_ransac import (
    dense_cloud_from_depth,
    icp_point_to_point,
    procrustes_pose,
)
from mapfree_tpu.ops.ransac import (
    best_hypothesis,
    inlier_mask,
    masked_sample_indices,
    msac_score,
)
from mapfree_tpu.ops.sift import root_sift, sift_detect_describe
