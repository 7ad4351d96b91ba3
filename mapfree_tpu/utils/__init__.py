from mapfree_tpu.utils.submission import Pose, predict, save_submission
