from mapfree_tpu.models.regression import RegressionNet, build_regression_net
